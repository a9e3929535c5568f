import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

# 1) raw int8 matmul ceiling at the shapes the fused kernel uses
rng = np.random.default_rng(0)
W = jnp.asarray(rng.integers(0, 128, size=(512, 512), dtype=np.int8))
A = jnp.asarray(rng.integers(0, 128, size=(512, 1024), dtype=np.int8))
@partial(jax.jit, static_argnames=("reps",))
def chained(a, reps):
    def body(_, a):
        o = jnp.dot(W, a, preferred_element_type=jnp.int32)
        return (o & 127).astype(jnp.int8)
    a = jax.lax.fori_loop(0, reps, body, a)
    return jnp.sum(a.astype(jnp.int32))
r1, r2 = 64, 2048
_ = float(chained(A, r1)); _ = float(chained(A, r2))
t0=time.perf_counter(); _=float(chained(A, r1)); t1=time.perf_counter()
_=float(chained(A, r2)); t2=time.perf_counter()
dt=max((t2-t1)-(t1-t0),1e-9)
macs=(r2-r1)*512*512*1024
print(f"int8 512x512@512x1024: {macs/dt/1e12:.1f} TMAC/s", flush=True)

# 2) fused MXU NTT n=4096
from primus_fhe_tpu.numeric import to_u64_pair
from primus_fhe_tpu.ops.ntt_mxu import MxuNttPlan64, mxu_fused_forward64
log_n, q, batch = 12, 1125899906826241, 64
n = 1 << log_n
data = to_u64_pair(rng.integers(0, q, size=(batch, n), dtype=np.uint64))
plan = MxuNttPlan64(log_n, q)
for tile in (4, 8, 16):
    @partial(jax.jit, static_argnames=("reps",))
    def ch2(v, reps, tile=tile):
        def body(_, v):
            return mxu_fused_forward64(plan, v, 4, tile)
        v = jax.lax.fori_loop(0, reps, body, v)
        return jnp.sum(v.lo ^ v.hi, dtype=jnp.uint32)
    try:
        r1, r2 = 32, 512
        _=float(ch2(data, r1)); _=float(ch2(data, r2))
        t0=time.perf_counter(); _=float(ch2(data, r1)); t1=time.perf_counter()
        _=float(ch2(data, r2)); t2=time.perf_counter()
        dt=max((t2-t1)-(t1-t0),1e-9)
        rate=(r2-r1)*batch*(n//2)*log_n/dt
        print(f"MXU fused tile={tile}: {rate/1e9:.2f}e9 modmul-equiv/s (t1={t1-t0:.3f} t2={t2-t1:.3f})", flush=True)
    except Exception as e:
        print(f"MXU fused tile={tile}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
