"""MXU (systolic-array) negacyclic NTT via exact int8 limb matmuls.

A TPU-native alternative to the VPU butterfly kernel (`ops/ntt_pallas.py`)
for the same transform semantics as the reference's ``U64NttTable``
(``crates/primus_ntt/src/ntt/prime64/scalar/transform.rs`` — normal-order
input, bit-reversed output): instead of ``n/2 log n`` serial butterfly
stages on the vector unit, the four-step (Bailey) factorization turns the
transform into **two dense matrix multiplies plus one pointwise twiddle**,
and the matmuls run on the MXU as *exact integer* products:

  out[j] = sum_k a[k] psi^{(2 rev(j)+1) k}
         = sum_{k0} [ sum_{k1} a[B k1 + k0] M1[r0,k1] ] T[r0,k0] M2[r1,k0]

with n = A*B, j = B*r0 + r1, M1/T/M2 powers of psi precomputed host-side.

Exact integer matmuls on the MXU: every mod-q coefficient is split into
eight 7-bit limbs; the constant matrices carry ``limb_c(M * 2^{7l} mod q)``
so a single ``int8 x int8 -> int32`` contraction over ``(k, l)`` yields the
mod-q-correct digit sums directly (the reduction by q is *folded into the
matrix*, so no per-product reduction is needed).  Digit sums stay below
``K * 127^2 < 2^31`` — bit-exact by construction, verified against the
golden model on the reference primes in ``tests/test_ntt_mxu.py``.

The VPU only recombines digits and applies the per-lane Shoup twiddle, so
the multiply work the reference spends AVX-512 IFMA lanes on
(``avx512/stages.rs``) rides the 256x256 systolic array instead — the
design the TPU rewards: FLOPs on the MXU, bookkeeping on the VPU.

Valid for ``q < 2^53`` (the 8-limb recombination bound); the 62-bit tier
stays on the Pallas butterfly kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..golden.model import GoldenNtt
from ..numeric.limb import U64
from ..utils.bits import reverse_lsbs
from .ntt_pallas import (
    _add64,
    _const64,
    _make_shoup_lazy64,
    _reduce_once64,
)

_U32 = jnp.uint32
_LIMBS = 8  # 7-bit limbs covering values < 2^56


def _limb_matrix(m, q: int, block: bool = False) -> np.ndarray:
    """``W[(r,c), (k,l)] = limb7_c(M[r,k] * 2^(7l) mod q)`` as int8.

    ``m`` is an (R, K) array of Python ints in [0, q).  ``block=False``
    interleaves (row ``r*8+c``, col ``k*8+l``) for the XLA einsum path;
    ``block=True`` uses the block order (row ``c*R+r``, col ``l*K+k``) so
    digit planes are contiguous sublane/lane slices for the fused kernel."""
    R, K = m.shape
    w = np.zeros((R * _LIMBS, K * _LIMBS), dtype=np.int8)
    for l in range(_LIMBS):
        scale = pow(2, 7 * l, q)
        ms = (m * scale) % q  # object array, exact
        for c in range(_LIMBS):
            dig = np.vectorize(lambda v: (int(v) >> (7 * c)) & 127, otypes=[np.int8])(ms)
            if block:
                w[c * R : (c + 1) * R, l * K : (l + 1) * K] = dig
            else:
                w[c::_LIMBS, l::_LIMBS] = dig
    return w


def _shoup_tabs(m, q: int):
    """Per-lane Shoup tables (8 u32 arrays) for an object-int array."""
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
    return tuple(
        jnp.asarray(t)
        for t in (
            wlo,
            whi,
            wlo & 0xFFFF,
            wlo >> 16,
            plo & 0xFFFF,
            plo >> 16,
            phi & 0xFFFF,
            phi >> 16,
        )
    )


def _pow_table(base: int, q: int, count: int) -> list[int]:
    """``[base^0, base^1, ..., base^(count-1)] mod q`` (host-side)."""
    out = [1] * count
    for i in range(1, count):
        out[i] = out[i - 1] * base % q
    return out


class MxuNttPlan64:
    """Constant matrices for the MXU four-step forward *and* inverse NTT.

    Forward factorization (module docstring); inverse mirrors it with the
    roles of the two factors swapped — for bit-reversed input ``v`` at
    ``j = B*r0 + r1`` and normal-order output ``a`` at ``k = B*k1 + k0``
    (reference semantics: ``crates/primus_ntt/src/ntt/prime64/scalar/
    transform.rs`` inverse path + fused ``inv_n`` stage ``table.rs:54-58``):

      a[B k1 + k0] = sum_{r0} M1i[k1,r0] Tinv[r0,k0]
                         sum_{r1} v[r0,r1] M2i[k0,r1]

      M2i[k0,r1] = om_B^{-rev2[r1] k0}
      Tinv[r0,k0] = psi^{-k0} omega^{-rev1[r0] k0}
      M1i[k1,r0] = inv_n * psi^{-B k1} om_A^{-rev1[r0] k1}

    with ``inv_n`` folded into the pass-2 matrix (no separate scaling
    stage).  Both directions run the identical fused kernel with the roles
    of the (A, B) axes swapped.
    """

    def __init__(self, log_n: int, q: int, h1: int | None = None):
        if q >= 1 << 53:
            raise ValueError("MxuNttPlan64 requires q < 2^53 (8-limb bound)")
        self.log_n = log_n
        self.n = n = 1 << log_n
        self.q = q
        if h1 is None:
            h1 = (log_n + 1) // 2
        if not 0 <= h1 <= log_n:
            raise ValueError(f"h1 must be in [0, {log_n}], got {h1}")
        h2 = log_n - h1
        self.A = A = 1 << h1
        self.B = B = 1 << h2
        g = GoldenNtt(log_n, q)
        psi = g.root
        omega = psi * psi % q
        om_a = pow(omega, B, q)  # order A
        om_b = pow(omega, A, q)  # order B
        rev1 = [reverse_lsbs(i, h1) for i in range(A)]
        rev2 = [reverse_lsbs(i, h2) for i in range(B)]

        def vandermonde(col_pows, row_pows):
            """``M[r, c] = col_pows[c] * row_pows[r]^c`` — built per row from
            running products (avoids A*B modular exponentiations)."""
            R, C = len(row_pows), len(col_pows)
            m = np.empty((R, C), dtype=object)
            for r in range(R):
                base = row_pows[r]
                acc = 1
                for c in range(C):
                    m[r, c] = acc * col_pows[c] % q
                    acc = acc * base % q
            return m

        ones_a = [1] * A
        ones_b = [1] * B
        psi_b = _pow_table(pow(psi, B, q), q, A)  # psi^{B k1}
        om_a_rev = [pow(om_a, e, q) for e in rev1]
        om_b_rev = [pow(om_b, e, q) for e in rev2]
        psi_pows = _pow_table(psi, q, B)  # psi^{k0}
        om_rev = [pow(omega, e, q) for e in rev1]

        # --- forward matrices -------------------------------------------
        # m1[r0, k1] = psi^{B k1} om_A^{rev1[r0] k1}
        m1 = vandermonde(psi_b, om_a_rev)
        # m2[r1, k0] = om_B^{rev2[r1] k0}
        m2 = vandermonde(ones_b, om_b_rev)
        # tw[r0, k0] = psi^{k0} omega^{rev1[r0] k0}
        tw = vandermonde(psi_pows, om_rev)
        tw28 = (tw * ((1 << 28) % q)) % q

        self.w1 = jnp.asarray(_limb_matrix(m1, q))
        self.w2 = jnp.asarray(_limb_matrix(m2, q))
        self.t_tabs = _shoup_tabs(tw, q)
        self.t28_tabs = _shoup_tabs(tw28, q)
        # final fold/reduce constants: x*2^28 mod q and the plain Barrett
        # (w=1) quotient for arbitrary u64 input.
        self.k28_tabs = _shoup_tabs(np.asarray([[(1 << 28) % q]], dtype=object), q)
        self.one_tabs = _shoup_tabs(np.asarray([[1]], dtype=object), q)
        # fused-kernel variants: digit planes as contiguous blocks; pass 2
        # pre-transposed so the in-kernel product is (r0, (l,k0)) @ W2.
        self.w1f = jnp.asarray(_limb_matrix(m1, q, block=True))
        self.w2f = jnp.asarray(_limb_matrix(m2, q, block=True).T)
        self._tiled: dict = {}

        # --- inverse matrices (see class docstring) ----------------------
        ipsi = pow(psi, 2 * n - 1, q)
        iom = ipsi * ipsi % q
        iom_a = pow(iom, B, q)
        iom_b = pow(iom, A, q)
        inv_n = g.inv_n
        iom_a_rev = [pow(iom_a, e, q) for e in rev1]
        iom_b_rev = [pow(iom_b, e, q) for e in rev2]
        ipsi_pows = _pow_table(ipsi, q, B)
        iom_rev = [pow(iom, e, q) for e in rev1]
        # m2i[k0, r1] = iom_B^{rev2[r1] k0}: rows k0, so transpose the
        # vandermonde built over rows rev2.
        m2i = vandermonde(ones_b, iom_b_rev).T.copy()
        # twi_t[k0, r0] = ipsi^{k0} iom^{rev1[r0] k0} (transposed layout:
        # the inverse kernel's value grid is (k0, poly*r0)).
        twi_t = vandermonde(ipsi_pows, iom_rev).T.copy()
        twi28_t = (twi_t * ((1 << 28) % q)) % q
        # m1i[k1, r0] = inv_n ipsi^{B k1} iom_A^{rev1[r0] k1}: rows k1.
        ipsi_b = _pow_table(pow(ipsi, B, q), q, A)
        m1i = vandermonde([p * inv_n % q for p in ipsi_b], iom_a_rev).T.copy()

        self.w2i = jnp.asarray(_limb_matrix(m2i, q))
        self.w1i = jnp.asarray(_limb_matrix(m1i, q))
        self.ti_tabs = _shoup_tabs(twi_t, q)
        self.ti28_tabs = _shoup_tabs(twi28_t, q)
        self.w2if = jnp.asarray(_limb_matrix(m2i, q, block=True))
        self.w1if = jnp.asarray(_limb_matrix(m1i, q, block=True).T)
        self._tiled_inv: dict = {}

    def _tile_cache(self, cache, tabs, tile):
        got = cache.get(tile)
        if got is None:
            # host numpy only: anything jnp-created while a jit trace is
            # active would be a tracer and leak into later traces.
            got = tuple(np.tile(np.asarray(t), (1, tile)) for t in tabs)
            cache[tile] = got
        return got

    def tiled_tabs(self, tile: int):
        """Forward twiddle tables pre-tiled to ``(A, tile*B)`` (cached per
        tile), so the fused kernel reads them directly instead of
        broadcasting."""
        return self._tile_cache(self._tiled, self.t_tabs + self.t28_tabs, tile)

    def tiled_tabs_inv(self, tile: int):
        """Inverse twiddle tables pre-tiled to ``(B, tile*A)``."""
        return self._tile_cache(
            self._tiled_inv, self.ti_tabs + self.ti28_tabs, tile
        )


def _split7_list(lo, hi):
    """Eight 7-bit int8 limbs of a (lo, hi) u32 pair (< 2^56), as a list."""
    limbs = []
    for l in range(_LIMBS):
        s = 7 * l
        if s == 0:
            part = lo
        elif s < 32:
            part = lo >> s
            if s > 32 - 7:
                part = part | (hi << (32 - s))
        else:
            part = hi >> (s - 32)
        limbs.append((part & 127).astype(jnp.int8))
    return limbs


def _split7(lo, hi):
    """As :func:`_split7_list`, stacked on a new axis before the last."""
    return jnp.stack(_split7_list(lo, hi), axis=-2)


def _recombine(digits):
    """(lo, hi) u64 pairs ``(Vlow, Vhigh)`` from 8 int32 digit planes
    stacked on axis -2: ``Vlow = sum_{c<4} d_c 2^{7c}``, ``Vhigh`` the same
    over digits 4..7 (so the value is ``Vlow + 2^28 Vhigh``)."""

    def half(ds):
        lo = ds[..., 0, :].astype(_U32)
        hi = jnp.zeros_like(lo)
        for c in range(1, 4):
            d = ds[..., c, :].astype(_U32)
            s = 7 * c
            lo, hi = _add64(lo, hi, d << s, d >> (32 - s))
        return lo, hi

    return half(digits[..., :4, :]), half(digits[..., 4:, :])


@functools.partial(jax.jit, static_argnums=(0, 2))
def mxu_forward64(plan: MxuNttPlan64, values: U64, out_factor: int = 1) -> U64:
    """Forward negacyclic NTT on the MXU; contract of
    :func:`transforms.ntt.forward64` (input any u64 < 2^56, output
    bit-reversed order in ``[0, out_factor*q)``)."""
    q = plan.q
    n, A, B = plan.n, plan.A, plan.B
    shoup = _make_shoup_lazy64(q, exact=False)
    qc = _const64(q)

    vlo, vhi = values.lo, values.hi
    batch_shape = vlo.shape[:-1]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    vlo = vlo.reshape(b, A, B)
    vhi = vhi.reshape(b, A, B)

    # pass 1: contraction over (k1, l) -> digit rows (r0, c)
    a8 = _split7(vlo, vhi).reshape(b, A * _LIMBS, B)
    o1 = jnp.einsum(
        "rk,bkc->brc", plan.w1, a8, preferred_element_type=jnp.int32
    ).reshape(b, A, _LIMBS, B)
    (l_lo, l_hi), (h_lo, h_hi) = _recombine(o1)

    # twiddle: S2 = Vlow*T + Vhigh*(T 2^28) mod q, each term in [0, 4q)
    m1 = shoup(l_lo, l_hi, *plan.t_tabs, *qc)
    m2 = shoup(h_lo, h_hi, *plan.t28_tabs, *qc)
    s2lo, s2hi = _add64(*m1, *m2)  # < 8q < 2^56

    # pass 2: contraction over (k0, l); output (r0, r1) via the 'bcr' form
    limbs2 = _split7(s2lo, s2hi)  # (b, A, 8, B)
    a2 = jnp.transpose(limbs2, (0, 3, 2, 1)).reshape(b, B * _LIMBS, A)
    o2 = jnp.einsum(
        "rk,bkc->bcr", plan.w2, a2, preferred_element_type=jnp.int32
    ).reshape(b, A, B, _LIMBS)
    (l2_lo, l2_hi), (h2_lo, h2_hi) = _recombine(
        jnp.moveaxis(o2, -1, -2)
    )

    # fold the high half then Barrett-reduce to [0, 4q)
    mh = shoup(h2_lo, h2_hi, *plan.k28_tabs, *qc)
    t_lo, t_hi = _add64(l2_lo, l2_hi, *mh)  # < 2^46 + 4q < 2^56
    olo, ohi = shoup(t_lo, t_hi, *plan.one_tabs, *qc)
    if out_factor <= 2:
        olo, ohi = _reduce_once64(olo, ohi, *_const64(2 * q))
    if out_factor == 1:
        olo, ohi = _reduce_once64(olo, ohi, *qc)
    return U64(
        olo.reshape(*batch_shape, n), ohi.reshape(*batch_shape, n)
    )


@functools.partial(jax.jit, static_argnums=(0, 2))
def mxu_inverse64(plan: MxuNttPlan64, values: U64, out_factor: int = 1) -> U64:
    """Inverse negacyclic NTT on the MXU; contract of
    :func:`transforms.ntt.inverse64` (bit-reversed input, any u64 < 2^56;
    normal-order output in ``[0, out_factor*q)``), ``inv_n`` folded into
    the pass-2 matrix."""
    q = plan.q
    n, A, B = plan.n, plan.A, plan.B
    shoup = _make_shoup_lazy64(q, exact=False)
    qc = _const64(q)

    vlo, vhi = values.lo, values.hi
    batch_shape = vlo.shape[:-1]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    vlo = vlo.reshape(b, A, B)
    vhi = vhi.reshape(b, A, B)

    # pass 1: contraction over (r1, l) -> digit rows (k0, c), lanes r0
    a8 = jnp.transpose(_split7(vlo, vhi), (0, 3, 2, 1)).reshape(b, B * _LIMBS, A)
    o1 = jnp.einsum(
        "rk,bkc->brc", plan.w2i, a8, preferred_element_type=jnp.int32
    ).reshape(b, B, _LIMBS, A)
    (l_lo, l_hi), (h_lo, h_hi) = _recombine(o1)

    # twiddle with Tinv^T[k0, r0]
    m1 = shoup(l_lo, l_hi, *plan.ti_tabs, *qc)
    m2 = shoup(h_lo, h_hi, *plan.ti28_tabs, *qc)
    s2lo, s2hi = _add64(*m1, *m2)  # < 8q < 2^56

    # pass 2: contraction over (r0, l) -> output rows k0, cols (k1, c)
    limbs2 = _split7(s2lo, s2hi)  # (b, B, 8, A)
    a2 = jnp.transpose(limbs2, (0, 3, 2, 1)).reshape(b, A * _LIMBS, B)
    o2 = jnp.einsum(
        "rk,bkc->bcr", plan.w1i, a2, preferred_element_type=jnp.int32
    ).reshape(b, B, A, _LIMBS)
    (l2_lo, l2_hi), (h2_lo, h2_hi) = _recombine(jnp.moveaxis(o2, -1, -2))

    mh = shoup(h2_lo, h2_hi, *plan.k28_tabs, *qc)
    t_lo, t_hi = _add64(l2_lo, l2_hi, *mh)  # < 2^46 + 4q < 2^56
    olo, ohi = shoup(t_lo, t_hi, *plan.one_tabs, *qc)
    if out_factor <= 2:
        olo, ohi = _reduce_once64(olo, ohi, *_const64(2 * q))
    if out_factor == 1:
        olo, ohi = _reduce_once64(olo, ohi, *qc)
    # (b, k0, k1) -> natural (b, k1, k0) order
    olo = jnp.transpose(olo, (0, 2, 1)).reshape(*batch_shape, n)
    ohi = jnp.transpose(ohi, (0, 2, 1)).reshape(*batch_shape, n)
    return U64(olo, ohi)


# ---------------------------------------------------------------------------
# Fused Pallas kernel: both matmuls + twiddle + reduction VMEM-resident
# ---------------------------------------------------------------------------


def _recombine_half(d):
    """u64 pair ``sum_c d[c] 2^(7c)`` of four u32 digit planes (< 2^23)."""
    lo = d[0]
    hi = jnp.zeros_like(lo)
    for c in range(1, 4):
        s = 7 * c
        lo, hi = _add64(lo, hi, d[c] << s, d[c] >> (32 - s))
    return lo, hi


def _make_fused_kernel(q: int, A: int, B: int, out_factor: int, tile: int):
    """Direction-generic fused four-step kernel body.

    The value grid is ``(A, tile*B)``: pass 1 contracts the sublane axis
    against ``w1_ref`` (8A, 8A), the twiddle applies per-lane Shoup tables
    (A, tile*B), pass 2 contracts each poly's lane block against ``w2_ref``
    (8B, 8B), output blocks are ``(tile*A, B)``.  Forward passes (A, B) =
    (plan.A, plan.B) with the forward matrices; inverse swaps the axes —
    (plan.B, plan.A) — with the inverse matrices (see MxuNttPlan64)."""
    import jax.lax as lax

    shoup = _make_shoup_lazy64(q, exact=False)
    dot = functools.partial(
        lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    def kernel(w1_ref, w2_ref, *rest):
        t_refs = rest[:8]
        t28_refs = rest[8:16]
        vlo_ref, vhi_ref, olo_ref, ohi_ref = rest[16:]
        qc = _const64(q)

        vlo = vlo_ref[:]  # (A, tile*B), rows k1, cols (poly, k0)
        vhi = vhi_ref[:]
        # pass 1: one shared dot over the whole tile (polys ride the lanes)
        x8 = jnp.concatenate(_split7_list(vlo, vhi), axis=0)  # (8A, tile*B)
        o1 = dot(w1_ref[:], x8)  # (8A, tile*B), rows (c, r0)
        digs = [o1[c * A : (c + 1) * A, :].astype(_U32) for c in range(_LIMBS)]
        v_lo = _recombine_half(digs[:4])
        v_hi = _recombine_half(digs[4:])

        # twiddle (tables arrive pre-tiled to (A, tile*B); no in-kernel
        # broadcast relayouts)
        t_t = [r[:] for r in t_refs]
        t28_t = [r[:] for r in t28_refs]
        m1 = shoup(*v_lo, *t_t, *qc)
        m2 = shoup(*v_hi, *t28_t, *qc)
        s2lo, s2hi = _add64(*m1, *m2)  # < 8q < 2^56

        # scalar fold/reduce constants, baked into the kernel
        def sconst(w):
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

        k28_tabs = sconst((1 << 28) % q)
        one_tabs = sconst(1)

        # pass 2: per-poly dot (r0 rows x (l, k0) lanes) @ W2.  (A restack
        # into one (tile*A, 8B) dot crashes the Mosaic compiler on the
        # lane-slice + sublane-concat relayout; the per-poly form lowers.)
        for p in range(tile):
            sl = s2lo[:, p * B : (p + 1) * B]
            sh = s2hi[:, p * B : (p + 1) * B]
            a2 = jnp.concatenate(_split7_list(sl, sh), axis=1)  # (A, 8B)
            o2 = dot(a2, w2_ref[:])  # (A, 8B), cols (c, r1)
            d2 = [o2[:, c * B : (c + 1) * B].astype(_U32) for c in range(_LIMBS)]
            v2l = _recombine_half(d2[:4])
            v2h = _recombine_half(d2[4:])
            mh = shoup(*v2h, *k28_tabs, *qc)
            tlo, thi = _add64(*v2l, *mh)  # < 2^46 + 4q
            rlo, rhi = shoup(tlo, thi, *one_tabs, *qc)  # Barrett, [0, 4q)
            if out_factor <= 2:
                rlo, rhi = _reduce_once64(rlo, rhi, *_const64(2 * q))
            if out_factor == 1:
                rlo, rhi = _reduce_once64(rlo, rhi, *qc)
            olo_ref[p * A : (p + 1) * A, :] = rlo
            ohi_ref[p * A : (p + 1) * A, :] = rhi

    return kernel


def _fused_call(q, S, L, w1f, w2f, tabs, vlo_t, vhi_t, bp, tile, out_factor):
    """Shared pallas_call scaffolding for the fused four-step kernels.

    ``vlo_t/vhi_t`` arrive in the (S, bp*L) kernel layout; returns the two
    (bp*S, L) output planes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _make_fused_kernel(q, S, L, out_factor, tile)
    grid = (bp // tile,)
    w_spec = lambda s: pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
    val_spec = pl.BlockSpec((S, tile * L), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile * S, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[w_spec((S * _LIMBS, S * _LIMBS)), w_spec((L * _LIMBS, L * _LIMBS))]
        + [w_spec((S, tile * L))] * 16
        + [val_spec] * 2,
        out_specs=[out_spec] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((bp * S, L), jnp.uint32),
            jax.ShapeDtypeStruct((bp * S, L), jnp.uint32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(w1f, w2f, *tabs, vlo_t, vhi_t)


def _pad_batch(values: U64, n: int, tile: int):
    vlo, vhi = values.lo, values.hi
    batch_shape = vlo.shape[:-1]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    vlo = vlo.reshape(b, n)
    vhi = vhi.reshape(b, n)
    tile = min(tile, b)
    pad = (-b) % tile
    if pad:
        vlo = jnp.concatenate([vlo, jnp.zeros((pad, n), jnp.uint32)])
        vhi = jnp.concatenate([vhi, jnp.zeros((pad, n), jnp.uint32)])
    return vlo, vhi, batch_shape, b, b + pad, tile


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def mxu_fused_forward64(
    plan: MxuNttPlan64, values: U64, out_factor: int = 1, tile: int = 8
) -> U64:
    """Fused-Pallas MXU forward NTT; contract of :func:`mxu_forward64`.

    Layout: the caller transposes each polynomial's (k1, k0) matrix so k1
    rides the sublanes and the poly batch rides the lanes; both int8
    matmuls, the digit recombination, the Shoup twiddle and the final
    Barrett reduction stay VMEM-resident."""
    q = plan.q
    n, A, B = plan.n, plan.A, plan.B
    vlo, vhi, batch_shape, b, bp, tile = _pad_batch(values, n, tile)

    def to_kernel_layout(x):
        # (b, n) -> (A, b*B): rows k1, cols (poly, k0)
        return x.reshape(bp, A, B).transpose(1, 0, 2).reshape(A, bp * B)

    olo, ohi = _fused_call(
        q, A, B, plan.w1f, plan.w2f, plan.tiled_tabs(tile),
        to_kernel_layout(vlo), to_kernel_layout(vhi), bp, tile, out_factor,
    )
    # output blocks are (poly, r0) rows x r1 cols = natural (b, n) order
    olo = olo.reshape(bp, n)[:b].reshape(*batch_shape, n)
    ohi = ohi.reshape(bp, n)[:b].reshape(*batch_shape, n)
    return U64(olo, ohi)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def mxu_fused_inverse64(
    plan: MxuNttPlan64, values: U64, out_factor: int = 1, tile: int = 8
) -> U64:
    """Fused-Pallas MXU inverse NTT; contract of :func:`mxu_inverse64`.

    Runs the same kernel as the forward with the (A, B) axes swapped: the
    value grid is (B, poly*A) — rows r1, then k0 — and the ``inv_n``
    scaling rides the pass-2 matrix."""
    q = plan.q
    n, A, B = plan.n, plan.A, plan.B
    vlo, vhi, batch_shape, b, bp, tile = _pad_batch(values, n, tile)

    def to_kernel_layout(x):
        # (b, n) -> (B, b*A): rows r1, cols (poly, r0)
        return x.reshape(bp, A, B).transpose(2, 0, 1).reshape(B, bp * A)

    olo, ohi = _fused_call(
        q, B, A, plan.w2if, plan.w1if, plan.tiled_tabs_inv(tile),
        to_kernel_layout(vlo), to_kernel_layout(vhi), bp, tile, out_factor,
    )

    def from_kernel_layout(x):
        # output blocks: rows (poly, k0), cols k1 -> natural (b, k1, k0)
        return (
            x.reshape(bp, B, A).transpose(0, 2, 1).reshape(bp, n)[:b]
            .reshape(*batch_shape, n)
        )

    return U64(from_kernel_layout(olo), from_kernel_layout(ohi))
