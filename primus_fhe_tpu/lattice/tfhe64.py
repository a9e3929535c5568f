"""TFHE external product on the 2^64 torus — exact.

The reference evaluates u64-torus ciphertexts through the same f64 FFT as
u32 ones, losing integer precision above 2^53 (torus.rs:46).  This module
runs the identical external-product structure through
:class:`~primus_fhe_tpu.transforms.torus.TorusConvolver64`: full 64-bit
torus, zero transform error.

Shapes mirror :mod:`.tfhe` with U64 pairs:
- ``glwe``:   U64 ``(B..., k+1, N)``
- ``key``:    NTT residues ``(kp, k+1, L, k+1, N)`` uint32 (30-bit primes)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ..decompose.primitive import ApproxSignedBasis64
from ..numeric.limb import U64
from ..transforms.torus import TorusConvolver64
from .tfhe import _external_product_tail


def external_product_bound_bits64(n: int, level: int, k: int, log_basis: int) -> int:
    """``|acc| <= n * level * (k+1) * (B/2) * 2^63``."""
    return 63 + (log_basis - 1) + math.ceil(math.log2(n * level * (k + 1))) + 1


def make_convolver64(n_log: int, level: int, k: int, log_basis: int) -> TorusConvolver64:
    return TorusConvolver64(
        n_log, external_product_bound_bits64(1 << n_log, level, k, log_basis)
    )


def ggsw_to_ntt64(conv: TorusConvolver64, ggsw_coeff: U64):
    """Coeff-domain U64 GGSW ``(k+1, L, k+1, N)`` -> NTT residues."""
    return conv.forward(ggsw_coeff)


@functools.partial(jax.jit, static_argnums=(0, 1))
def external_product64(
    conv: TorusConvolver64,
    basis: ApproxSignedBasis64,
    glwe: U64,
    key_ntt,
) -> U64:
    """``output = glwe ⊡ key`` on the 2^64 torus, exact."""
    batch = glwe.lo.shape[:-2]

    digits = basis.decompose(glwe)  # U64 (L, B..., k+1, N)
    digits = U64(
        jnp.moveaxis(digits.lo, 0, -2), jnp.moveaxis(digits.hi, 0, -2)
    )  # (B..., k+1, L, N)
    f = conv.forward(digits)  # (kp, B..., k+1, L, N) uint32 residues
    return _external_product_tail(conv, f, key_ntt, batch)
