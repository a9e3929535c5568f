import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
W = jnp.asarray(rng.integers(0, 128, size=(512, 512), dtype=np.int8))
A = jnp.asarray(rng.integers(0, 128, size=(512, 64), dtype=np.int8))

def kernel(w_ref, a_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        w_ref[:], a_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

out = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((512, 64), jnp.int32),
)(W, A)
ref = np.asarray(W, np.int64) @ np.asarray(A, np.int64)
print("pallas int8 dot exact:", bool((np.asarray(out) == ref).all()))
