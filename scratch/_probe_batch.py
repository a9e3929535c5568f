import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from primus_fhe_tpu.numeric import to_u64_pair
from primus_fhe_tpu.ops.ntt_pallas import PallasNttPlan64, pallas_forward64

log_n, q = 12, 1125899906826241
n = 1 << log_n
plan = PallasNttPlan64(log_n, q)
rng = np.random.default_rng(7)

def rate_for(batch, tile, r1, r2):
    data = to_u64_pair(rng.integers(0, q, size=(batch, n), dtype=np.uint64))
    @partial(jax.jit, static_argnames=("reps",))
    def chained(v, reps):
        def body(_, v):
            return pallas_forward64(plan, v, 4, tile)
        v = jax.lax.fori_loop(0, reps, body, v)
        return jnp.sum(v.lo ^ v.hi, dtype=jnp.uint32)
    _ = float(chained(data, r1)); _ = float(chained(data, r2))
    t0 = time.perf_counter(); _ = float(chained(data, r1)); t1 = time.perf_counter()
    _ = float(chained(data, r2)); t2 = time.perf_counter()
    dt = max((t2-t1)-(t1-t0), 1e-9)
    return (r2-r1)*batch*(n//2)*log_n/dt, (t1-t0), (t2-t1)

for batch, tile, r1, r2 in [(64,16,32,512),(64,16,32,512),(64,16,64,2048),(64,16,64,2048),(64,16,128,4096)]:
    r, a, b = rate_for(batch, tile, r1, r2)
    print(f"batch={batch} tile={tile} r1={r1} r2={r2}: {r/1e9:.2f}e9  t1={a:.3f} t2={b:.3f}", flush=True)
