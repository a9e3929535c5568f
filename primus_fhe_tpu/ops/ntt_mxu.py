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


class MxuNttPlan64:
    """Constant matrices for the MXU four-step forward NTT."""

    def __init__(self, log_n: int, q: int, h1: int | None = None):
        if q >= 1 << 53:
            raise ValueError("MxuNttPlan64 requires q < 2^53 (8-limb bound)")
        self.log_n = log_n
        self.n = n = 1 << log_n
        self.q = q
        if h1 is None:
            h1 = (log_n + 1) // 2
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

        m1 = np.empty((A, A), dtype=object)
        for r0 in range(A):
            e = rev1[r0]
            for k1 in range(A):
                m1[r0, k1] = pow(psi, B * k1, q) * pow(om_a, e * k1, q) % q
        m2 = np.empty((B, B), dtype=object)
        for r1 in range(B):
            e = rev2[r1]
            for k0 in range(B):
                m2[r1, k0] = pow(om_b, e * k0, q)
        tw = np.empty((A, B), dtype=object)
        for r0 in range(A):
            e = rev1[r0]
            for k0 in range(B):
                tw[r0, k0] = pow(psi, k0, q) * pow(omega, e * k0, q) % q
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

    def tiled_tabs(self, tile: int):
        """Twiddle tables pre-tiled to ``(A, tile*B)`` (cached per tile), so
        the fused kernel reads them directly instead of broadcasting."""
        got = self._tiled.get(tile)
        if got is None:
            # host numpy only: anything jnp-created while a jit trace is
            # active would be a tracer and leak into later traces.
            got = tuple(
                np.tile(np.asarray(t), (1, tile))
                for t in self.t_tabs + self.t28_tabs
            )
            self._tiled[tile] = got
        return got


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


def _make_fused_kernel(plan: "MxuNttPlan64", out_factor: int, tile: int):
    import jax.lax as lax

    q = plan.q
    A, B = plan.A, plan.B
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


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def mxu_fused_forward64(
    plan: MxuNttPlan64, values: U64, out_factor: int = 1, tile: int = 8
) -> U64:
    """Fused-Pallas MXU forward NTT; contract of :func:`mxu_forward64`.

    Layout: the caller transposes each polynomial's (k1, k0) matrix so k1
    rides the sublanes and the poly batch rides the lanes; both int8
    matmuls, the digit recombination, the Shoup twiddle and the final
    Barrett reduction stay VMEM-resident."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q = plan.q
    n, A, B = plan.n, plan.A, plan.B
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
    bp = b + pad

    def to_kernel_layout(x):
        # (b, n) -> (A, b*B): rows k1, cols (poly, k0)
        return (
            x.reshape(bp, A, B).transpose(1, 0, 2).reshape(A, bp * B)
        )

    vlo_t = to_kernel_layout(vlo)
    vhi_t = to_kernel_layout(vhi)

    kernel = _make_fused_kernel(plan, out_factor, tile)
    grid = (bp // tile,)
    w_spec = lambda s: pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
    val_spec = pl.BlockSpec((A, tile * B), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile * A, B), lambda i: (i, 0), memory_space=pltpu.VMEM)
    olo, ohi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[w_spec((A * _LIMBS, A * _LIMBS)), w_spec((B * _LIMBS, B * _LIMBS))]
        + [w_spec((A, tile * B))] * 16
        + [val_spec] * 2,
        out_specs=[out_spec] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((bp * A, B), jnp.uint32),
            jax.ShapeDtypeStruct((bp * A, B), jnp.uint32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(plan.w1f, plan.w2f, *plan.tiled_tabs(tile), vlo_t, vhi_t)
    olo = olo.reshape(bp, n)[:b].reshape(*batch_shape, n)
    ohi = ohi.reshape(bp, n)[:b].reshape(*batch_shape, n)
    return U64(olo, ohi)
