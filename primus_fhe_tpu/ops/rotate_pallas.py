"""Fused negacyclic monomial rotation kernel.

``v * X^d`` mod ``X^N + 1`` with a *traced*, per-ciphertext degree — the
blind-rotation inner operation.  The jnp path decomposes the rotation into
``log2(2N)`` conditional static shifts, which XLA executes as ~12 separate
HBM passes (concats break fusion).  This kernel runs the whole bit-chain
VMEM-resident: one read, one write.

``pltpu.roll`` by a static ``2^b`` plus a first-``2^b``-lanes sign flip is
one conditional stage; the traced degree bits select via ``jnp.where``.
Optionally emits ``v * X^d - v`` directly (the CMux difference), saving
another pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_U32 = jnp.uint32


@functools.partial(jax.jit, static_argnames=("n", "subtract"))
def pallas_rotate(values, degrees, n: int, subtract: bool = False):
    """``values[i] * X^degrees[i]`` (optionally minus ``values[i]``).

    ``values``: ``(B, rows, n)`` torus u32 (``rows`` = GLWE components);
    ``degrees``: ``(B,)`` int32 in ``[0, 2n)``.  Falls back to interpret
    mode off-TPU.
    """
    bsz, rows, nn = values.shape
    assert nn == n
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, rows, n), lambda i, d: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, rows, n), lambda i, d: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    def kernel3(d_all, v_ref, o_ref):
        i = pl.program_id(0)
        v0 = v_ref[0]
        v = v0
        d = d_all[i]
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        for b in range(n.bit_length()):
            k = 1 << b
            if k == n:
                rolled = jnp.zeros_like(v) - v
            else:
                r = pltpu.roll(v, k, 1)
                wrapped = iota < k
                rolled = jnp.where(wrapped, jnp.zeros_like(r) - r, r)
            take = ((d >> b) & 1) == 1
            v = jnp.where(take, rolled, v)
        o_ref[0] = (v - v0) if subtract else v

    return pl.pallas_call(
        kernel3,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, rows, n), jnp.uint32),
        interpret=jax.default_backend() != "tpu",
    )(degrees.astype(jnp.int32), values)
