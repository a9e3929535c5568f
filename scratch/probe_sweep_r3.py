"""Sweep batch x tile for the byte-radix fused round trip on real TPU."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from primus_fhe_tpu.numeric import to_u64_pair
from primus_fhe_tpu.ops.ntt_mxu8 import (
    Mxu8NttPlan64,
    mxu8_fused_roundtrip64_mul,
)

LOG_N = 12
N = 1 << LOG_N
Q = 1125899906826241


def timeit(fn, *args, r1=64, r2=512, tries=3):
    _ = float(fn(*args, r1))
    _ = float(fn(*args, r2))
    best = None
    for _i in range(tries):
        t0 = time.perf_counter()
        _ = float(fn(*args, r1))
        t1 = time.perf_counter()
        _ = float(fn(*args, r2))
        t2 = time.perf_counter()
        best = min(best or 9e9, max((t2 - t1) - (t1 - t0), 1e-9))
    return best / (r2 - r1)


def main():
    print(f"[sweep] backend={jax.default_backend()}")
    rng = np.random.default_rng(7)
    key = rng.integers(0, Q, size=(N,), dtype=np.uint64)
    best = (0.0, None)
    for batch in (128, 256, 384, 512):
        data = to_u64_pair(rng.integers(0, Q, size=(batch, N), dtype=np.uint64))
        for tile in (8, 16, 32):
            try:
                plan = Mxu8NttPlan64(LOG_N, Q)
                tabs = plan.inverse_mul_tabs(key, tile)

                def step(v, plan=plan, tabs=tabs, tile=tile):
                    return mxu8_fused_roundtrip64_mul(plan, v, tabs, 1, tile)

                @jax.jit
                def chained(v, reps, step=step):
                    v = jax.lax.fori_loop(0, reps, lambda _, v: step(v), v)
                    return jnp.sum(v.lo ^ v.hi, dtype=jnp.uint32)

                dt = timeit(chained, data) / batch
                rate = (N * LOG_N + N) / dt / 1e9
                print(f"[sweep] b={batch:4d} t={tile:3d} rt/s={1/dt/1e6:7.3f}M  {rate:6.1f}e9")
                if rate > best[0]:
                    best = (rate, (batch, tile))
            except Exception as e:
                print(f"[sweep] b={batch} t={tile} FAILED {type(e).__name__}: {str(e)[:120]}")
    print(f"[sweep] BEST {best}")


if __name__ == "__main__":
    main()
