import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from primus_fhe_tpu.numeric import to_u64_pair
from primus_fhe_tpu.ops.ntt_mxu import MxuNttPlan64, mxu_fused_forward64
rng = np.random.default_rng(0)
log_n, q, batch = 12, 1125899906826241, 64
n = 1 << log_n
data = to_u64_pair(rng.integers(0, q, size=(batch, n), dtype=np.uint64))
for h1 in (5, 6, 7):
    plan = MxuNttPlan64(log_n, q, h1)
    for tile in (2, 4, 8):
        @partial(jax.jit, static_argnames=("reps",))
        def ch2(v, reps, plan=plan, tile=tile):
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
            print(f"h1={h1} (A={1<<h1},B={1<<(log_n-h1)}) tile={tile}: {rate/1e9:.2f}e9", flush=True)
        except Exception as e:
            print(f"h1={h1} tile={tile}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
