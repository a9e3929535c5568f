import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

rng = np.random.default_rng(0)
W = jnp.asarray(rng.integers(0, 128, size=(512, 512), dtype=np.int8))
A = jnp.asarray(rng.integers(0, 128, size=(64, 512, 64), dtype=np.int8))

@partial(jax.jit, static_argnames=("reps",))
def chained(a, reps):
    def body(_, a):
        o = jnp.einsum("rk,bkc->brc", W, a, preferred_element_type=jnp.int32)
        return (o & 127).astype(jnp.int8)  # keep shapes closed for the loop
    a = jax.lax.fori_loop(0, reps, body, a)
    return jnp.sum(a.astype(jnp.int32))

r1, r2 = 64, 1024
x = float(chained(A, r1)); x = float(chained(A, r2))
t0 = time.perf_counter(); _ = float(chained(A, r1)); t1 = time.perf_counter()
_ = float(chained(A, r2)); t2 = time.perf_counter()
dt = max((t2-t1)-(t1-t0), 1e-9)
macs = (r2-r1) * 64 * 512 * 512 * 64
print(f"int8 matmul: {macs/dt/1e12:.2f} TMAC/s  ({dt*1e3:.1f} ms for {r2-r1} reps)")

# correctness spot check vs numpy
o = jnp.einsum("rk,bkc->brc", W, A, preferred_element_type=jnp.int32)
ref = np.einsum("rk,bkc->brc", np.asarray(W, np.int64), np.asarray(A, np.int64))
print("exact:", bool((np.asarray(o) == ref).all()))
