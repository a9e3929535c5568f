"""Confirm the hot configs with repeated difference-of-workload measurements."""

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


def run(batch, tile, r1=64, r2=512, tries=6):
    rng = np.random.default_rng(7)
    key = rng.integers(0, Q, size=(N,), dtype=np.uint64)
    data = to_u64_pair(rng.integers(0, Q, size=(batch, N), dtype=np.uint64))
    plan = Mxu8NttPlan64(LOG_N, Q)
    tabs = plan.inverse_mul_tabs(key, tile)

    def step(v):
        return mxu8_fused_roundtrip64_mul(plan, v, tabs, 1, tile)

    @jax.jit
    def chained(v, reps):
        v = jax.lax.fori_loop(0, reps, lambda _, v: step(v), v)
        return jnp.sum(v.lo ^ v.hi, dtype=jnp.uint32)

    c1 = float(chained(data, r1))
    c2 = float(chained(data, r2))
    print(f"[confirm] b={batch} t={tile} checksums r1={c1} r2={c2}")
    rates = []
    for _i in range(tries):
        t0 = time.perf_counter()
        _ = float(chained(data, r1))
        t1 = time.perf_counter()
        _ = float(chained(data, r2))
        t2 = time.perf_counter()
        dt = max((t2 - t1) - (t1 - t0), 1e-9) / (r2 - r1) / batch
        rates.append((N * LOG_N + N) / dt / 1e9)
    print(
        f"[confirm] b={batch:4d} t={tile:3d} rates="
        + " ".join(f"{r:6.1f}" for r in rates)
        + f"  best={max(rates):6.1f}e9 median={sorted(rates)[len(rates)//2]:6.1f}e9"
    )


def main():
    print(f"[confirm] backend={jax.default_backend()}")
    for batch, tile in ((384, 32), (256, 16), (384, 8), (512, 32)):
        run(batch, tile)


if __name__ == "__main__":
    main()
