"""Shared helpers for the MXU (systolic-array) kernel families.

Everything q-generic that the byte-radix NTT kernels (``ops/ntt_mxu8.py``,
``ops/ntt_mxu8_dyn.py``), the fused CMux kernels (``ops/cmux_mxu.py``,
``ops/ntru_cmux_mxu.py``) and the coefficient-sharded four-step split
(``parallel/coeff_sharded_mxu.py``) have in common:

* :func:`four_step_matrices` — the host-side four-step (Bailey)
  factorization of the negacyclic NTT (reference semantics
  ``crates/primus_ntt/src/ntt/prime64/scalar/transform.rs``: normal-order
  input, bit-reversed output; inverse mirrored with ``inv_n`` folded into
  the pass-2 matrix per ``table.rs:54-58``),
* Shoup-constant constructors (:func:`_shoup_tabs`, :func:`_sconst`) and
  the narrow (``y < 2^48``) lazy Shoup multiply
  (:func:`_make_shoup_narrow64`),
* u32-pair shift/mask primitives and the multiply-free Solinas fold
  ladder (:func:`_solinas_down`),
* the ``pallas_call`` scaffolding shared by the natural-layout kernels
  (:func:`_natural_call`, :func:`_pad_batch`) and the int8 MXU
  contraction :data:`_DOT`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..golden.model import GoldenNtt, mod_inv
from ..numeric.limb import U64
from ..utils.bits import reverse_lsbs
from .ntt_pallas import (
    _add64,
    _const64,
    _hi_limbs,
    _make_shoup_lazy64,
    _mul_lo64,
    _shl64,
    _solinas_form,
    _sub64,
)

__all__ = [
    "_DOT",
    "_const64",
    "_make_shoup_lazy64",
    "_make_shoup_narrow64",
    "_mask64p",
    "_natural_call",
    "_pad_batch",
    "_sconst",
    "_shoup_tabs",
    "_shr64p",
    "_solinas_down",
    "four_step_matrices",
]

_U32 = jnp.uint32

# int8 x int8 -> int32 contraction on the MXU (the only dot shape every
# kernel family uses: 2D, contract left cols with right rows)
_DOT = functools.partial(
    jax.lax.dot_general,
    dimension_numbers=(((1,), (0,)), ((), ())),
    preferred_element_type=jnp.int32,
)


# ---------------------------------------------------------------------------
# Host-side constant construction
# ---------------------------------------------------------------------------


def _shoup_tabs(m, q: int):
    """Per-lane Shoup tables (8 u32 arrays) for an object-int array.

    Returned as HOST numpy: plans may be constructed inside an active jit
    trace (the DCRT fast path builds them lazily), where jnp arrays would
    become tracers and leak; numpy constants stay inert until used."""
    flat = np.asarray(
        [int(v) for v in m.reshape(-1)], dtype=np.uint64
    ).reshape(m.shape)
    pre = np.asarray(
        [((int(v) << 64) // q) & 0xFFFFFFFFFFFFFFFF for v in m.reshape(-1)],
        dtype=np.uint64,
    ).reshape(m.shape)
    wlo = (flat & 0xFFFFFFFF).astype(np.uint32)
    whi = (flat >> np.uint64(32)).astype(np.uint32)
    plo = (pre & 0xFFFFFFFF).astype(np.uint32)
    phi = (pre >> np.uint64(32)).astype(np.uint32)
    return (
        wlo,
        whi,
        wlo & 0xFFFF,
        wlo >> 16,
        plo & 0xFFFF,
        plo >> 16,
        phi & 0xFFFF,
        phi >> 16,
    )


def _sconst(w: int, q: int):
    """Scalar Shoup table (same 8-slot layout as :func:`_shoup_tabs`)."""
    pre = ((w << 64) // q) & 0xFFFFFFFFFFFFFFFF
    lo, hi = w & 0xFFFFFFFF, w >> 32
    return (
        *_const64(w),
        *_const64(lo & 0xFFFF)[:1],
        *_const64(lo >> 16)[:1],
        *_const64(pre & 0xFFFF)[:1],
        *_const64((pre >> 16) & 0xFFFF)[:1],
        *_const64((pre >> 32) & 0xFFFF)[:1],
        *_const64(pre >> 48)[:1],
    )


def _pow_table(base: int, q: int, count: int) -> list[int]:
    """``[base^0, base^1, ..., base^(count-1)] mod q`` (host-side)."""
    out = [1] * count
    for i in range(1, count):
        out[i] = out[i - 1] * base % q
    return out


def four_step_matrices(
    log_n: int, q: int, h1: int, h1_inv: int, root: int | None = None
):
    """Host-side four-step factorization matrices (object-int numpy).

    Returns a dict with the forward split ``A x B`` matrices ``m1[r0,k1]``,
    ``m2[r1,k0]``, twiddle ``tw[r0,k0]``, and the mirrored-inverse split
    ``Ai x Bi`` matrices ``m2i[k0,r1]``, ``twi[r0,k0]``, ``m1i[k1,r0]``
    (``inv_n`` folded into ``m1i``).  Forward factorization, for input
    ``a[B k1 + k0]`` and bit-reversed output ``j = B r0 + r1``:

      out[j] = sum_k a[k] psi^{(2 rev(j)+1) k}
             = sum_{k0} [ sum_{k1} a[B k1 + k0] M1[r0,k1] ] T[r0,k0] M2[r1,k0]

    Reference semantics ``crates/primus_ntt/src/ntt/prime64/scalar/
    transform.rs`` (normal-order input, bit-reversed output; inverse path
    + fused ``inv_n`` stage ``table.rs:54-58``).

    ``root`` overrides the minimal-root convention (a primitive 2n-th
    root mod q) — used by the large-n composition whose sub-transforms
    run on explicit powers of the top-level root."""
    n = 1 << log_n
    A, B = 1 << h1, 1 << (log_n - h1)
    Ai, Bi = 1 << h1_inv, 1 << (log_n - h1_inv)
    if root is None:
        g = GoldenNtt(log_n, q)
        psi = g.root
        inv_n_val = g.inv_n
    else:
        psi = int(root)
        inv_n_val = mod_inv(n, q)

    def vandermonde(col_pows, row_pows):
        R, C = len(row_pows), len(col_pows)
        m = np.empty((R, C), dtype=object)
        for r in range(R):
            base = row_pows[r]
            acc = 1
            for c in range(C):
                m[r, c] = acc * col_pows[c] % q
                acc = acc * base % q
        return m

    omega = psi * psi % q
    om_a = pow(omega, B, q)
    om_b = pow(omega, A, q)
    rev1 = [reverse_lsbs(i, h1) for i in range(A)]
    rev2 = [reverse_lsbs(i, log_n - h1) for i in range(B)]
    psi_b = _pow_table(pow(psi, B, q), q, A)
    om_a_rev = [pow(om_a, e, q) for e in rev1]
    om_b_rev = [pow(om_b, e, q) for e in rev2]
    psi_pows = _pow_table(psi, q, B)
    om_rev = [pow(omega, e, q) for e in rev1]
    m1 = vandermonde(psi_b, om_a_rev)
    m2 = vandermonde([1] * B, om_b_rev)
    tw = vandermonde(psi_pows, om_rev)

    ipsi = pow(psi, 2 * n - 1, q)
    iom = ipsi * ipsi % q
    iom_a = pow(iom, Bi, q)
    iom_b = pow(iom, Ai, q)
    inv_n = inv_n_val
    rev1i = [reverse_lsbs(i, h1_inv) for i in range(Ai)]
    rev2i = [reverse_lsbs(i, log_n - h1_inv) for i in range(Bi)]
    iom_a_rev = [pow(iom_a, e, q) for e in rev1i]
    iom_b_rev = [pow(iom_b, e, q) for e in rev2i]
    ipsi_pows = _pow_table(ipsi, q, Bi)
    iom_rev = [pow(iom, e, q) for e in rev1i]
    m2i = vandermonde([1] * Bi, iom_b_rev).T.copy()
    twi = vandermonde(ipsi_pows, iom_rev)
    ipsi_b = _pow_table(pow(ipsi, Bi, q), q, Ai)
    m1i = vandermonde([p * inv_n % q for p in ipsi_b], iom_a_rev).T.copy()
    return {
        "A": A, "B": B, "Ai": Ai, "Bi": Bi,
        "m1": m1, "m2": m2, "tw": tw,
        "m2i": m2i, "twi": twi, "m1i": m1i,
    }


# ---------------------------------------------------------------------------
# In-kernel u32-pair primitives
# ---------------------------------------------------------------------------


def _shr64p(xlo, xhi, k: int):
    """``x >> k`` on (lo, hi) u32 pairs; static k in (0, 64)."""
    if k < 32:
        return (xlo >> k) | (xhi << (32 - k)), xhi >> k
    if k == 32:
        return xhi, jnp.zeros_like(xhi)
    return xhi >> (k - 32), jnp.zeros_like(xhi)


def _mask64p(xlo, xhi, bits: int):
    """``x & (2^bits - 1)`` on (lo, hi) u32 pairs; static bits in (0, 64)."""
    if bits < 32:
        return xlo & ((1 << bits) - 1), jnp.zeros_like(xhi)
    if bits == 32:
        return xlo, jnp.zeros_like(xhi)
    return xlo, xhi & ((1 << (bits - 32)) - 1)


def _solinas_down(r, bound: int, sol, q: int):
    """Folds a mod-q representative ``r < bound`` down to ``[0, 2q)`` via
    repeated ``2^a === 2^b - 1`` splits (no multiplies, no compares)."""
    a, b = sol
    while bound > 2 * q:
        r1 = _shr64p(*r, a)
        r0 = _mask64p(*r, a)
        t = _sub64(*_shl64(*r1, b), *r1)
        r = _add64(*r0, *t)
        hi = (bound - 1) >> a
        bound = (1 << a) + hi * ((1 << b) - 1)
    return r


def _make_shoup_narrow64(q: int):
    """Approximate lazy Shoup multiply specialized to ``y < 2^48``
    (``y3 = 0``): same contract as ``_make_shoup_lazy64(q, exact=False)``
    (output < 4q) with the four y3 limb products dropped."""
    sol = _solinas_form(q)

    def shoup(ylo, yhi, wlo, whi, w0, w1, p0, p1, p2, p3, qlo, qhi):
        y0 = ylo & 0xFFFF
        y1 = ylo >> 16
        # yhi < 2^16: hi32(yhi * p) needs only the y2 row of the grid.
        h01 = _hi_limbs(ylo, y0, y1, p2, p3)
        m1 = (yhi * p0) >> 16
        h10 = (yhi * p1 + m1) >> 16
        l11 = yhi * (p2 | (p3 << 16))
        h11 = (yhi * p3 + ((yhi * p2) >> 16)) >> 16
        s2 = h01 + h10
        c2 = (s2 < h01).astype(_U32)
        s2b = s2 + l11
        c2 = c2 + (s2b < s2).astype(_U32)
        hlo = s2b
        hhi = h11 + c2
        wy_lo = wlo * ylo
        wy_hi = _hi_limbs(wlo, w0, w1, y0, y1) + wlo * yhi + whi * ylo
        if sol is None:
            qq_lo, qq_hi = _mul_lo64(qlo, qhi, hlo, hhi)
        else:
            a, b = sol
            s1lo, s1hi = _shl64(hlo, hhi, a)
            s2lo, s2hi = _shl64(hlo, hhi, b)
            qq_lo, qq_hi = _sub64(s1lo, s1hi, s2lo, s2hi)
            qq_lo, qq_hi = _add64(qq_lo, qq_hi, hlo, hhi)
        return _sub64(wy_lo, wy_hi, qq_lo, qq_hi)

    return shoup


# ---------------------------------------------------------------------------
# pallas_call scaffolding for the natural-layout kernels
# ---------------------------------------------------------------------------


def _pad_batch(values: U64, n: int, tile: int):
    vlo, vhi = values.lo, values.hi
    batch_shape = vlo.shape[:-1]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    vlo = vlo.reshape(b, n)
    vhi = vhi.reshape(b, n)
    # keep tile >= 2: a single-poly tile produces degenerate chunk shapes
    # that trip an XLA-CPU fusion bug in interpret mode (i8/i32 mixed add
    # in the lowered LLVM IR); one padded row is cheap
    tile = max(min(tile, max(b, 2)), 2)
    pad = (-b) % tile
    if pad:
        vlo = jnp.concatenate([vlo, jnp.zeros((pad, n), jnp.uint32)])
        vhi = jnp.concatenate([vhi, jnp.zeros((pad, n), jnp.uint32)])
    return vlo, vhi, batch_shape, b, b + pad, tile


def _natural_call(kernel, n_tabs, S, L, w1, w2, tabs, vlo, vhi, bp, tile):
    """pallas_call scaffolding shared by the natural-layout kernels:
    value/output blocks are ``(tile*S, L)`` slabs of the free ``(bp*S, L)``
    view of the natural array; all tables are grid-constant."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w_spec = lambda s: pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
    val_spec = pl.BlockSpec(
        (tile * S, L), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tab_specs = [w_spec(t.shape) for t in tabs]
    return pl.pallas_call(
        kernel,
        grid=(bp // tile,),
        in_specs=[w_spec(w1.shape), w_spec(w2.shape)] + tab_specs + [val_spec] * 2,
        out_specs=[val_spec] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((bp * S, L), jnp.uint32),
            jax.ShapeDtypeStruct((bp * S, L), jnp.uint32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(w1, w2, *tabs, vlo, vhi)
