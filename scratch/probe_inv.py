"""TPU probe: fused MXU inverse vs forward throughput at the headline shape."""
import sys

sys.path.insert(0, "/root/repo")  # run from anywhere without PYTHONPATH
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from primus_fhe_tpu.numeric import to_u64_pair
from primus_fhe_tpu.ops.ntt_mxu import (
    MxuNttPlan64,
    mxu_fused_forward64,
    mxu_fused_inverse64,
)

log_n = 12
n = 1 << log_n
q = 1125899906826241
batch = 64
rng = np.random.default_rng(7)
data = to_u64_pair(rng.integers(0, q, size=(batch, n), dtype=np.uint64))
plan = MxuNttPlan64(log_n, q)


def timeit(step, r1=64, r2=1024):
    @partial(jax.jit, static_argnames=("reps",))
    def chained(v, reps):
        v = jax.lax.fori_loop(0, reps, lambda _, v: step(v), v)
        return jnp.sum(v.lo ^ v.hi, dtype=jnp.uint32)

    _ = float(chained(data, r1))
    _ = float(chained(data, r2))
    t0 = time.perf_counter()
    _ = float(chained(data, r1))
    t1 = time.perf_counter()
    _ = float(chained(data, r2))
    t2 = time.perf_counter()
    dt = max((t2 - t1) - (t1 - t0), 1e-9)
    ntts = (r2 - r1) * batch
    return ntts / dt


for tile in (4, 8):
    f = timeit(lambda v, t=tile: mxu_fused_forward64(plan, v, 4, t))
    print(f"tile={tile} fwd : {f:12.0f} NTT/s  {f*n//2*log_n/1e9:8.2f}e9 modmul/s")
    sys.stdout.flush()
    i = timeit(lambda v, t=tile: mxu_fused_inverse64(plan, v, 2, t))
    print(f"tile={tile} inv : {i:12.0f} NTT/s  {i*n//2*log_n/1e9:8.2f}e9 modmul/s")
    sys.stdout.flush()
