"""DCRT (RNS + NTT domain) gadget products — the BFV-flavored path.

Reference: ``crates/primus_lattice/src/glwe/dcrt.rs:178-343``
(``add_dcrt_glev_mul_crt_poly_assign``) and ``src/glwe/crt.rs:200``
(``CrtGlwe::mul_dcrt_ggsw_to``).  Pipeline per decomposition level
(SURVEY.md §3.4):

    compose residues -> big ints        (one-time, before the level loop)
    unsigned digit extract + carries    (multi-limb window)
    centered re-spread into all moduli  (wrapping_decompose_small)
    one NTT per modulus                 (DCRT forward, batched)
    pointwise modular FMA accumulate    (per limb, per GLWE component)

Layouts (all U64 pairs):
- ``CrtGlwe``   coeff domain:  ``(n_mod, k+1, N)``
- ``DcrtGlwe``  NTT domain:    ``(n_mod, k+1, N)``
- ``DcrtGlev``  NTT domain:    ``(level, n_mod, k+1, N)``
- ``DcrtGgsw``  NTT domain:    ``(k+1, level, n_mod, k+1, N)``

The ``n_mod`` axis is the shard axis: everything here except ``compose``
(a residue-axis contraction -> psum when sharded) is residue-local.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..decompose.big_integer import BigUintApproxSignedBasis
from ..modular.modops import add64, mul64, lazy_mul64, reduce_once64
from ..numeric.limb import U64
from ..rns.base import RNSBase64
from ..transforms.dcrt import DcrtPlan64, dcrt_forward64

_U32 = jnp.uint32


def _m_bc(rns_base: RNSBase64, extra: int):
    """Barrett record broadcast to (n_mod, 1...)."""
    shape = (rns_base.count,) + (1,) * extra
    return jax.tree.map(lambda x: x.reshape(shape), rns_base.modulus)


def _digits_to_dcrt(digit_u32, basis, rns_base, plan, out_factor=1):
    """One level's digits ``(..., N)`` u32 -> NTT-domain residues
    ``U64 (n_mod, ..., N)`` via the centered lift (base.rs:279)."""
    d64 = U64(digit_u32, jnp.zeros_like(digit_u32))
    residues = rns_base.wrapping_decompose_small(d64, basis.basis)
    return dcrt_forward64(plan, residues, out_factor)


@functools.partial(jax.jit, static_argnums=(3, 5))
def add_dcrt_glev_mul_crt_poly(
    acc,  # U64 (n_mod, k+1, N) NTT domain
    glev,  # U64 (level, n_mod, k+1, N) NTT domain
    crt_poly,  # U64 (n_mod, N) coeff domain residues
    basis: BigUintApproxSignedBasis,
    plan: DcrtPlan64,
    rns_base: RNSBase64,
) -> U64:
    """``acc += glev * gadget_decompose(crt_poly)`` (dcrt.rs:178-260)."""
    # 1. CRT compose: residues -> (N, L) big-int coefficients.
    big = rns_base.compose(crt_poly)

    # 2. carry init + per-level unsigned digits.
    v, carries = basis.init_value_carry(big)

    m = _m_bc(rns_base, 2)
    for lvl in range(basis.decompose_length):
        digit, carries = basis.unsigned_decompose_level(v, carries, lvl)
        f = _digits_to_dcrt(digit, basis, rns_base, plan)  # (n_mod, N)
        f = U64(f.lo[:, None, :], f.hi[:, None, :])  # broadcast over k+1
        g = U64(glev.lo[lvl], glev.hi[lvl])  # (n_mod, k+1, N)
        prod = mul64(g, f, m)
        acc = add64(acc, prod, m.value)
    return acc


@functools.partial(jax.jit, static_argnums=(2, 4))
def crt_glwe_mul_dcrt_ggsw(
    crt_glwe,  # U64 (n_mod, k+1, N) coeff-domain residues
    ggsw,  # U64 (k+1, level, n_mod, k+1, N) NTT domain
    basis: BigUintApproxSignedBasis,
    plan: DcrtPlan64,
    rns_base: RNSBase64,
) -> U64:
    """External product in the RNS domain (crt.rs:200): each input
    component feeds one GLev row.  Returns a DcrtGlwe ``(n_mod, k+1, N)``
    in the NTT domain."""
    k1 = crt_glwe.lo.shape[1]
    n = crt_glwe.lo.shape[2]
    acc = U64(
        jnp.zeros((rns_base.count, k1, n), dtype=_U32),
        jnp.zeros((rns_base.count, k1, n), dtype=_U32),
    )
    for r in range(k1):
        poly_r = U64(crt_glwe.lo[:, r, :], crt_glwe.hi[:, r, :])
        glev_r = U64(ggsw.lo[r], ggsw.hi[r])
        acc = add_dcrt_glev_mul_crt_poly(acc, glev_r, poly_r, basis, plan, rns_base)
    return acc


@functools.partial(jax.jit, static_argnums=(2,))
def dcrt_glwe_mul_poly(acc, dcrt_poly, rns_base: RNSBase64):
    """``acc * poly`` pointwise per modulus (dcrt.rs:108)."""
    m = _m_bc(rns_base, 2)
    p = U64(dcrt_poly.lo[:, None, :], dcrt_poly.hi[:, None, :])
    return mul64(acc, p, m)


@functools.partial(jax.jit, static_argnums=(3,))
def dcrt_glwe_butterfly_mul(a, rhs, dcrt_poly, rns_base: RNSBase64):
    """``(a, out) = (a + rhs, (a - rhs) * poly)`` — the CMux-shaped
    inverse butterfly of dcrt.rs:130-150."""
    from ..modular.modops import sub64

    m = _m_bc(rns_base, 2)
    s = add64(a, rhs, m.value)
    d = sub64(a, rhs, m.value)
    p = U64(dcrt_poly.lo[:, None, :], dcrt_poly.hi[:, None, :])
    return s, mul64(d, p, m)
