"""Time the reworked fused MXU kernel (concat pass-2 + Solinas folds)."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from primus_fhe_tpu.numeric import from_u64_pair, to_u64_pair
from primus_fhe_tpu.ops.ntt_mxu import (
    MxuNttPlan64,
    mxu_fused_forward64,
    mxu_fused_inverse64,
)


def timeit(fn, data, r1=64, r2=512):
    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained(v, reps):
        def body(_, v):
            return fn(v)

        v = jax.lax.fori_loop(0, reps, body, v)
        return jnp.sum(v.lo ^ v.hi, dtype=jnp.uint32)

    _ = float(chained(data, r1))
    _ = float(chained(data, r2))
    t0 = time.perf_counter()
    _ = float(chained(data, r1))
    t1 = time.perf_counter()
    _ = float(chained(data, r2))
    t2 = time.perf_counter()
    return max((t2 - t1) - (t1 - t0), 1e-9) / (r2 - r1)


def main():
    log_n = 12
    n = 1 << log_n
    q = 1125899906826241
    batch = 64
    rng = np.random.default_rng(7)
    raw = rng.integers(0, q, size=(batch, n), dtype=np.uint64)
    data = to_u64_pair(raw)
    modmul = batch * (n // 2) * log_n

    for h1 in (6, 5):
        plan = MxuNttPlan64(log_n, q, h1=h1)
        # exactness spot check on TPU (vs reference: round trip)
        f = mxu_fused_forward64(plan, data, 4, 4)
        rt = from_u64_pair(mxu_fused_inverse64(plan, f, 1, 4))
        ok = bool((rt == raw).all())
        print(f"h1={h1} roundtrip exact on TPU: {ok}", flush=True)
        for tile in (2, 4, 8, 16):
            if tile > batch:
                continue
            try:
                fn = lambda v: mxu_fused_forward64(plan, v, 4, tile)
                dt = timeit(fn, data)
                fni = lambda v: mxu_fused_inverse64(plan, v, 4, tile)
                dti = timeit(fni, data)
                print(
                    f"h1={h1} tile={tile:2d}  fwd {modmul/dt/1e9:7.2f}e9"
                    f"  inv {modmul/dti/1e9:7.2f}e9 modmul/s",
                    flush=True,
                )
            except Exception as e:
                print(f"h1={h1} tile={tile:2d} FAIL: {str(e).splitlines()[0][:100]}", flush=True)


if __name__ == "__main__":
    main()
