"""Boolean gates over the NTRU (FINAL-style) bootstrap — mod-q mirror of
:mod:`boot.gates`.

Encoding: TRUE = +q/8 (``(q-1)/8`` exactly), FALSE = -q/8, all mod the NTT
prime q, LWE under the binary key ``s``.  Requires an :class:`NtruContext`
built with ``t_scale=8`` so the accumulator's test-vector coefficients
(±(q-1)/8) are valid NTRU messages under ``f = 1 + 8f'``.

A gate = affine combination mod q → modulus switch q→2N → NTRU blind
rotation (sign test) → extraction under ``f`` → LWE key switch back to
``s``.  Outputs feed gates indefinitely.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..modular.modops import add32, neg32, sub32
from .ntru_blind_rotate import (
    NtruContext,
    extract_lwe_ntru,
    modulus_switch_q,
    ntru_blind_rotate,
    ntru_key_switch,
    ntru_test_polynomial,
)

_U32 = jnp.uint32


def true_mu(ctx: NtruContext) -> int:
    assert ctx.t_scale == 8, "gates need t_scale=8 (±q/8 encodings)"
    return (ctx.q_int - 1) // 8


def false_mu(ctx: NtruContext) -> int:
    return ctx.q_int - true_mu(ctx)


def _trivial(ctx, b, n_in):
    out = jnp.zeros(n_in + 1, dtype=_U32)
    return out.at[n_in].set(_U32(b % ctx.q_int))


def _gate(ctx, evk, ksk, ks_basis, lin):
    log_2n = ctx.plan.log_n + 1
    switched = modulus_switch_q(lin, ctx, log_2n)
    tp = ntru_test_polynomial(ctx.n, ctx.q_int, true_mu(ctx))
    acc = ntru_blind_rotate(ctx, evk, switched, tp)
    a_vec = extract_lwe_ntru(acc, ctx.m.value)
    # extract gives phase = +Σ a_j f_j; the key switch uses the standard
    # LWE convention phase = b − Σ a_i f_i, so negate the mask (b = 0).
    lwe_f = jnp.concatenate(
        [
            neg32(a_vec, ctx.m.value),
            jnp.zeros(a_vec.shape[:-1] + (1,), dtype=_U32),
        ],
        axis=-1,
    )
    return ntru_key_switch(ctx, lwe_f, ksk, ks_basis)


def ntru_nand(ctx, evk, ksk, ks_basis, c1, c2):
    """NAND: ``c1 + c2 - 5q/8`` then sign bootstrap (phases 1/8, 3/8 → TRUE;
    -3/8 → FALSE) and key switch."""
    n_in = c1.shape[-1] - 1
    lin = sub32(
        add32(c1, c2, ctx.m.value), _trivial(ctx, 5 * true_mu(ctx), n_in), ctx.m.value
    )
    return _gate(ctx, evk, ksk, ks_basis, lin)


def ntru_and(ctx, evk, ksk, ks_basis, c1, c2):
    n_in = c1.shape[-1] - 1
    lin = sub32(
        add32(c1, c2, ctx.m.value), _trivial(ctx, true_mu(ctx), n_in), ctx.m.value
    )
    return _gate(ctx, evk, ksk, ks_basis, lin)


def ntru_or(ctx, evk, ksk, ks_basis, c1, c2):
    n_in = c1.shape[-1] - 1
    lin = add32(
        add32(c1, c2, ctx.m.value), _trivial(ctx, true_mu(ctx), n_in), ctx.m.value
    )
    return _gate(ctx, evk, ksk, ks_basis, lin)


def ntru_not(ctx, c):
    """NOT is free: negate the sample mod q."""
    return neg32(c, ctx.m.value)
