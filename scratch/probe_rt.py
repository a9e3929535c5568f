"""Careful round-trip measurement: batch sweep, per-direction tile sweep."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from primus_fhe_tpu.numeric import to_u64_pair
from primus_fhe_tpu.ops.ntt_mxu import (
    MxuNttPlan64,
    mxu_fused_forward64,
    mxu_fused_inverse64,
    mxu_fused_inverse64_mul,
)


def timeit(fn, data, r1=64, r2=512, reps=3):
    @jax.jit
    def chained(v, reps):
        v = jax.lax.fori_loop(0, reps, lambda _, v: fn(v), v)
        return jnp.sum(v.lo ^ v.hi, dtype=jnp.uint32)

    _ = float(chained(data, r1))
    _ = float(chained(data, r2))
    best = None
    for _i in range(reps):
        t0 = time.perf_counter()
        _ = float(chained(data, r1))
        t1 = time.perf_counter()
        _ = float(chained(data, r2))
        t2 = time.perf_counter()
        dt = max((t2 - t1) - (t1 - t0), 1e-9) / (r2 - r1)
        best = dt if best is None else min(best, dt)
    return best


def main():
    log_n = 12
    n = 1 << log_n
    q = 1125899906826241
    rng = np.random.default_rng(7)
    plan = MxuNttPlan64(log_n, q)
    key = rng.integers(0, q, size=(n,), dtype=np.uint64)

    import os
    batches = tuple(int(x) for x in os.environ.get("RT_BATCHES", "128").split(","))
    for batch in batches:
        raw = rng.integers(0, q, size=(batch, n), dtype=np.uint64)
        data = to_u64_pair(raw)
        mm1 = batch * (n // 2) * log_n
        r2 = 512 if batch <= 128 else 256
        out = [f"b={batch:3d}"]
        for tile in (16,):
            dtf = timeit(lambda v: mxu_fused_forward64(plan, v, 4, tile), data, r2=r2)
            dti = timeit(lambda v: mxu_fused_inverse64(plan, v, 4, tile), data, r2=r2)
            out.append(f"t{tile}: f {mm1/dtf/1e9:6.1f} i {mm1/dti/1e9:6.1f}")
        print("  ".join(out), flush=True)

        for ti in (16,):
            tabs = plan.inverse_mul_tabs(key, ti)

            def rt(v, ti=ti, tabs=tabs):
                f = mxu_fused_forward64(plan, v, 4, ti)
                return mxu_fused_inverse64_mul(plan, f, tabs, 1, ti)

            dtr = timeit(rt, data, r2=r2)
            mm = batch * (n * log_n + n)
            print(
                f"  rt(f{ti},i{ti}): {mm/dtr/1e9:6.1f}e9 modmul/s"
                f" ({batch/dtr:,.0f} rt/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
