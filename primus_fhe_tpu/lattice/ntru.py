"""NTRU samples: a single polynomial ``(..., N)``.

Reference: ``crates/primus_lattice/src/ntru/{coeff,ntt}.rs`` — the NTRU
container is one polynomial ``h`` with NTT conversion, pointwise multiply,
and scalar/factor multiply.  An NTRU ciphertext of message ``m`` under a
secret ``f`` is ``c = g/f + m`` (or ``c * f = g + m * f``); the primitive
layer here only needs the polynomial mechanics, matching the reference's
scope.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..modular import modops
from ..modular.factor import factor_mul32
from ..transforms.ntt import forward32, inverse32
from ..transforms.plan import NttPlan32

_U32 = jnp.uint32


def to_ntt(ntru, plan: NttPlan32):
    """Coefficient -> NTT form (``write_ntt_form``, coeff.rs:52-60)."""
    return forward32(plan, ntru)


def from_ntt(ntt_ntru, plan: NttPlan32):
    return inverse32(plan, ntt_ntru)


def mul_ntt_poly(ntru, ntt_poly, plan: NttPlan32, m):
    """``NTT(self) * ntt_poly`` (coeff.rs:64-82)."""
    return modops.mul32(forward32(plan, ntru), ntt_poly, m)


def mul_scalar(ntru, scalar, m):
    return modops.mul32(ntru, jnp.broadcast_to(jnp.asarray(scalar, _U32), ntru.shape), m)


def mul_factor(ntru, factor, q):
    """Shoup-factor multiply (coeff.rs:96-104)."""
    return factor_mul32(ntru, factor, q)


def ntru_phase(ntru, secret_ntt, plan: NttPlan32, m):
    """``c * f`` — the NTRU decryption product (ntt.rs:36-108 composite)."""
    return inverse32(plan, modops.mul32(forward32(plan, ntru), secret_ntt, m))
