"""Homomorphic boolean gates — the classic TFHE application loop.

Encoding: TRUE = +1/8 (2^29 on the 2^32 torus), FALSE = -1/8.  A gate is
one affine combination of input LWEs followed by a sign bootstrap and a
key switch back to the input key, so gate outputs feed gates indefinitely
(fully composable circuits).

    NAND(c1, c2) = sign_bootstrap(c1 + c2 - (0, 5/8))   [negated sign]
    AND(c1, c2)  = sign_bootstrap(c1 + c2 - (0, 1/8))
    OR(c1, c2)   = sign_bootstrap(c1 + c2 + (0, 1/8))
    XOR needs 2 levels or the 2-bit trick; NOT is free: (-a, -b).

The bootstrap pipeline (modulus switch -> exact CMux blind rotation ->
extract -> key switch) is the composition the reference's primitive layer
was built for but does not itself ship (SURVEY.md §1).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..lattice.keyswitch import key_switch
from .blind_rotate import bootstrap

_U32 = jnp.uint32

TRUE_MU = 1 << 29  # +1/8
FALSE_MU = (1 << 32) - (1 << 29)  # -1/8


def _trivial(b, n_in):
    out = jnp.zeros(n_in + 1, dtype=_U32)
    return out.at[n_in].set(_U32(b % (1 << 32)))


def _gate(conv, basis, bsk, ksk, ks_basis, lin, log_n):
    test_poly = jnp.full(1 << log_n, _U32(1 << 29), dtype=_U32)
    big = bootstrap(conv, basis, bsk, lin, test_poly, log_n)
    return key_switch(big, ksk, ks_basis)


def nand_gate(conv, basis, bsk, ksk, ks_basis, c1, c2, log_n: int):
    """NAND: affine ``c1 + c2 - 5/8`` then sign bootstrap + key switch."""
    n_in = c1.shape[-1] - 1
    lin = c1 + c2 - _trivial(5 << 29, n_in)
    return _gate(conv, basis, bsk, ksk, ks_basis, lin, log_n)


def and_gate(conv, basis, bsk, ksk, ks_basis, c1, c2, log_n: int):
    n_in = c1.shape[-1] - 1
    lin = c1 + c2 - _trivial(1 << 29, n_in)
    return _gate(conv, basis, bsk, ksk, ks_basis, lin, log_n)


def or_gate(conv, basis, bsk, ksk, ks_basis, c1, c2, log_n: int):
    n_in = c1.shape[-1] - 1
    lin = c1 + c2 + _trivial(1 << 29, n_in)
    return _gate(conv, basis, bsk, ksk, ks_basis, lin, log_n)


def not_gate(c):
    """NOT is free: negate the whole sample."""
    return jnp.zeros_like(c) - c


def leveled_mux(conv, basis, ggsw_ntt, cx, cy):
    """Leveled select with an encrypted control:
    ``MUX(sel, x, y) = y + (x - y) ⊡ GGSW(sel)``.

    ``ggsw_ntt`` typically comes from
    :func:`..circuit_bootstrap.circuit_bootstrap` (an encrypted bit), and
    ``cx``/``cy`` are GLWE ciphertexts under the same key.
    """
    from ..lattice.tfhe import external_product

    return cy + external_product(conv, basis, cx - cy, ggsw_ntt)
