#!/usr/bin/env python
"""Chunk-size (cs) sweep for the fused MXU kernels (round trip): re-exec
the ntt_mxu source with the cs candidate tuple patched."""
import inspect, sys, time, types
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from primus_fhe_tpu.numeric import to_u64_pair
import primus_fhe_tpu.ops.ntt_mxu as mxu

log_n, q = 12, 1125899906826241
n = 1 << log_n
batch = 128
rng = np.random.default_rng(7)
data = to_u64_pair(rng.integers(0, q, size=(batch, n), dtype=np.uint64))
key = rng.integers(0, q, size=(n,), dtype=np.uint64)


def timeit(step, r1=64, r2=512):
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
    return (r2 - r1) * batch / best


src = inspect.getsource(mxu)
assert src.count("for c in (4, 2, 1):") == 2
ref = None
for cs_tuple in ("(4, 2, 1)", "(8, 4, 2, 1)", "(16, 8, 4, 2, 1)", "(2, 1)"):
    patched = src.replace("for c in (4, 2, 1):", f"for c in {cs_tuple}:")
    m2 = types.ModuleType("mxu_patched")
    m2.__package__ = "primus_fhe_tpu.ops"  # keep relative imports working
    exec(compile(patched, "mxu_patched", "exec"), m2.__dict__)
    plan2 = m2.MxuNttPlan64(log_n, q)
    mtabs = plan2.inverse_mul_tabs(key, 16)
    step = lambda v, m2=m2, plan2=plan2, mtabs=mtabs: m2.mxu_fused_inverse64_mul(
        plan2, m2.mxu_fused_forward64(plan2, v, 4, 16), mtabs, 1, 16)
    out = jax.jit(step)(data)
    if ref is None:
        ref = (np.asarray(out.lo), np.asarray(out.hi))
    else:
        ok = (np.asarray(out.lo) == ref[0]).all() and (np.asarray(out.hi) == ref[1]).all()
        assert ok, f"cs_tuple={cs_tuple} changed results!"
    r = timeit(step)
    print(f"cs_tuple={cs_tuple}: rt={r/1e6:.3f}M/s ({(r*(n*log_n+n))/1e9:.1f}e9)", flush=True)
