#!/usr/bin/env python
"""Split timing of the round-trip: fwd-only vs inv_mul-only, tile/batch sweep."""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from primus_fhe_tpu.numeric import to_u64_pair
from primus_fhe_tpu.ops.ntt_mxu import (
    MxuNttPlan64, mxu_fused_forward64, mxu_fused_inverse64_mul, mxu_fused_inverse64,
)

log_n, q = 12, 1125899906826241
n = 1 << log_n
rng = np.random.default_rng(7)
key = rng.integers(0, q, size=(n,), dtype=np.uint64)


def timeit(step, data, r1=64, r2=512):
    @jax.jit
    def chained(v, reps):
        v = jax.lax.fori_loop(0, reps, lambda _, v: step(v), v)
        return jnp.sum(v.lo ^ v.hi, dtype=jnp.uint32)

    _ = float(chained(data, r1)); _ = float(chained(data, r2))
    best = None
    for _i in range(3):
        t0 = time.perf_counter(); _ = float(chained(data, r1))
        t1 = time.perf_counter(); _ = float(chained(data, r2))
        t2 = time.perf_counter()
        dt = max((t2 - t1) - (t1 - t0), 1e-9)
        best = dt if best is None else min(best, dt)
    return (r2 - r1) * data.lo.shape[0] / best  # polys/s


for batch in (128, 256):
    data = to_u64_pair(rng.integers(0, q, size=(batch, n), dtype=np.uint64))
    for tile in (8, 16, 32):
        mplan = MxuNttPlan64(log_n, q)
        mtabs = mplan.inverse_mul_tabs(key, tile)
        fwd = lambda v: mxu_fused_forward64(mplan, v, 4, tile)
        invm = lambda v: mxu_fused_inverse64_mul(mplan, v, mtabs, 4, tile)
        rt = lambda v: mxu_fused_inverse64_mul(mplan, mxu_fused_forward64(mplan, v, 4, tile), mtabs, 1, tile)
        f = timeit(fwd, data)
        i = timeit(invm, data)
        r = timeit(rt, data)
        print(f"batch={batch} tile={tile}: fwd={f/1e6:.3f}M/s invmul={i/1e6:.3f}M/s rt={r/1e6:.3f}M/s "
              f"(modmul/s rt={(r*(n*log_n+n))/1e9:.1f}e9)", flush=True)
