import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from primus_fhe_tpu.numeric import to_u64_pair
from primus_fhe_tpu.ops.ntt_mxu import MxuNttPlan64, mxu_forward64

log_n, q, batch = 12, 1125899906826241, 64
n = 1 << log_n
rng = np.random.default_rng(7)
data = to_u64_pair(rng.integers(0, q, size=(batch, n), dtype=np.uint64))
plan = MxuNttPlan64(log_n, q)

@partial(jax.jit, static_argnames=("reps",))
def chained(v, reps):
    def body(_, v):
        return mxu_forward64(plan, v, 4)
    v = jax.lax.fori_loop(0, reps, body, v)
    return jnp.sum(v.lo ^ v.hi, dtype=jnp.uint32)

r1, r2 = 64, 2048
_ = float(chained(data, r1)); _ = float(chained(data, r2))
t0 = time.perf_counter(); _ = float(chained(data, r1)); t1 = time.perf_counter()
_ = float(chained(data, r2)); t2 = time.perf_counter()
dt = max((t2-t1)-(t1-t0), 1e-9)
rate = (r2-r1)*batch*(n//2)*log_n/dt
print(f"MXU fwd NTT: {rate/1e9:.2f}e9 modmul-equiv/s  (t1={t1-t0:.3f} t2={t2-t1:.3f})")
