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

from ..golden.model import GoldenNtt, mod_inv
from ..utils.contracts import check_range_u64
from ..numeric.limb import U64
from ..utils.bits import reverse_lsbs
from .ntt_pallas import (
    _add64,
    _const64,
    _hi_limbs,
    _make_shoup_lazy64,
    _mul_lo64,
    _reduce_once64,
    _shl64,
    _solinas_form,
    _sub64,
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
    (``inv_n`` folded into ``m1i``).  Shared by the 7-bit-limb plan
    (:class:`MxuNttPlan64`) and the byte-radix plan (``ops/ntt_mxu8.py``).
    Math per :class:`MxuNttPlan64`'s docstring; reference semantics
    ``crates/primus_ntt/src/ntt/prime64/scalar/transform.rs``.

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

    def __init__(
        self,
        log_n: int,
        q: int,
        h1: int | None = None,
        h1_inv: int | None = None,
    ):
        if q >= 1 << 53:
            raise ValueError("MxuNttPlan64 requires q < 2^53 (8-limb bound)")
        self.log_n = log_n
        self.n = n = 1 << log_n
        self.q = q
        # Default splits keep the fused kernel's per-poly lane block (B for
        # the forward, A for the inverse) a multiple of the 128-lane tile:
        # Mosaic's non-128-aligned lane restack silently miscompiles (seen
        # at B=64, log_n=12) and is slower even where it works.
        if h1 is None:
            h1 = log_n - max(7, -(-log_n // 2)) if log_n >= 10 else (log_n + 1) // 2
        if h1_inv is None:
            # the mirrored inverse kernel wants the SAME lane-aligned split
            # as the forward (its lane block is Bi)
            h1_inv = h1
        for name, v in (("h1", h1), ("h1_inv", h1_inv)):
            if not 0 <= v <= log_n:
                raise ValueError(f"{name} must be in [0, {log_n}], got {v}")
        self.A = A = 1 << h1
        self.B = B = 1 << (log_n - h1)
        self.Ai = Ai = 1 << h1_inv
        self.Bi = Bi = 1 << (log_n - h1_inv)
        fs = four_step_matrices(log_n, q, h1, h1_inv)
        m1, m2, tw = fs["m1"], fs["m2"], fs["tw"]
        m2i, twi, m1i = fs["m2i"], fs["twi"], fs["m1i"]
        tw28 = (tw * ((1 << 28) % q)) % q

        self.w1 = _limb_matrix(m1, q)
        self.w2 = _limb_matrix(m2, q)
        self.t_tabs = _shoup_tabs(tw, q)
        self.t28_tabs = _shoup_tabs(tw28, q)
        # final fold/reduce constants: x*2^28 mod q and the plain Barrett
        # (w=1) quotient for arbitrary u64 input.
        self.k28_tabs = _shoup_tabs(np.asarray([[(1 << 28) % q]], dtype=object), q)
        self.one_tabs = _shoup_tabs(np.asarray([[1]], dtype=object), q)
        # fused-kernel variants: digit planes as contiguous blocks; pass 2
        # pre-transposed so the in-kernel product is (r0, (l,k0)) @ W2.
        self.w1f = _limb_matrix(m1, q, block=True)
        self.w2f = np.ascontiguousarray(_limb_matrix(m2, q, block=True).T)
        self._tiled: dict = {}

        # --- inverse matrices (independent split Ai x Bi; see class
        # docstring).  twi[r0, k0] = ipsi^{k0} iom^{rev1[r0] k0} (the
        # mirrored kernel's value grid after pass 1 is rows (poly, r0),
        # lanes k0); the einsum path reads the transposed tables. --------
        twi_t = twi.T.copy()
        twi28_t = (twi_t * ((1 << 28) % q)) % q

        self.w2i = _limb_matrix(m2i, q)
        self.w1i = _limb_matrix(m1i, q)
        self.ti_tabs = _shoup_tabs(twi_t, q)
        self.ti28_tabs = _shoup_tabs(twi28_t, q)
        # mirrored fused-kernel matrices: pass 1 is a RIGHT dot (contract
        # the lane axis r1), pass 2 a LEFT dot (contract the sublane r0)
        self.w1mf = np.ascontiguousarray(_limb_matrix(m2i, q, block=True).T)
        self.w2mf = _limb_matrix(m1i, q, block=True)
        self.tim_tabs = _shoup_tabs(twi, q)
        self.tim28_tabs = _shoup_tabs((twi * ((1 << 28) % q)) % q, q)
        self._tiled_inv: dict = {}

    def _tile_cache(self, cache, tabs, tile, axis):
        got = cache.get(tile)
        if got is None:
            # host numpy only: anything jnp-created while a jit trace is
            # active would be a tracer and leak into later traces.
            reps = (1, tile) if axis == 1 else (tile, 1)
            got = tuple(np.tile(np.asarray(t), reps) for t in tabs)
            cache[tile] = got
        return got

    def tiled_tabs(self, tile: int):
        """Forward twiddle tables pre-tiled to ``(A, tile*B)`` (cached per
        tile), so the fused kernel reads them directly instead of
        broadcasting.  Solinas primes fold the two digit-sum halves before
        the twiddle, so only the 8 base tables are needed."""
        tabs = self.t_tabs if _mxu_solinas(self.q) else self.t_tabs + self.t28_tabs
        return self._tile_cache(self._tiled, tabs, tile, axis=1)

    def tiled_tabs_inv(self, tile: int):
        """Mirrored-inverse twiddle tables pre-tiled to ``(tile*Ai, Bi)``
        (polys ride the sublanes in the mirrored kernel)."""
        tabs = (
            self.tim_tabs
            if _mxu_solinas(self.q)
            else self.tim_tabs + self.tim28_tabs
        )
        return self._tile_cache(self._tiled_inv, tabs, tile, axis=0)

    def inverse_mul_tabs(self, key, tile: int):
        """Shoup tables for a fixed NTT-domain operand (bit-reversed order,
        canonical values), pre-tiled into the mirrored inverse kernel's
        value layout ``(tile*Ai, Bi)`` — for
        :func:`mxu_fused_inverse64_mul`.  ``key`` is a host array of ints
        in [0, q)."""
        m = np.asarray([int(v) for v in np.asarray(key).reshape(-1)], dtype=object)
        m = m.reshape(self.Ai, self.Bi)
        tabs = _shoup_tabs(m, self.q)
        return tuple(np.tile(t, (tile, 1)) for t in tabs)


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
    n, A, B = plan.n, plan.Ai, plan.Bi
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


def _mxu_solinas(q: int):
    """Solinas form usable by the fused kernel's fold paths: the 2^28
    split in :func:`_fold28` needs ``a > 28``."""
    sol = _solinas_form(q)
    return sol if sol is not None and sol[0] > 28 else None


def _fold28_bound(half_bound: int, sol) -> int:
    """Upper bound of :func:`_fold28`'s output given both halves are
    < ``half_bound`` (exact Python-int arithmetic)."""
    a, b = sol
    vh1 = (half_bound - 1) >> (a - 28)
    return half_bound + (1 << a) + vh1 * ((1 << b) - 1)


def _fold28(vl, vh, sol):
    """``Vlow + 2^28 * Vhigh  (mod q)`` for a Solinas prime
    ``q = 2^a - 2^b + 1`` — multiply-free (shift/add folds using
    ``2^a === 2^b - 1``).  Inputs are u32 pairs < 2^46; the returned pair
    is an exact mod-q representative < ``2^46 + 2^a + 2^(74-a+b)``."""
    a, b = sol
    s = a - 28  # Vhigh split point: 2^28 * 2^s = 2^a
    vh1 = _shr64p(*vh, s)  # < 2^(46-s)
    vh0 = _mask64p(*vh, s)
    t = _sub64(*_shl64(*vh1, b), *vh1)  # vh1 * (2^b - 1) >= 0
    r = _add64(*vl, *_shl64(*vh0, 28))
    return _add64(*r, *t)


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


def _recombine_half(d):
    """u64 pair ``sum_c d[c] 2^(7c)`` of four u32 digit planes.

    Valid while the digit bound keeps ``d0 + (d1 << 7) < 2^32`` — i.e.
    digit sums < 2^25, true for every MXU split up to max(A,B) = 256
    (K = 2048 contraction terms, K*127^2 < 2^25): pair up 7-bit-shifted
    digits carry-free in u32, then one carrying 14-bit combine."""
    e0 = d[0] + (d[1] << 7)  # < 2^32, exact in u32
    e1 = d[2] + (d[3] << 7)
    return _add64(e0, jnp.zeros_like(e0), e1 << 14, e1 >> 18)




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


def _finish(q, sol, shoup, narrow, v2l, v2h, half_bound, out_factor, qc):
    """Final fold of pass-2 digit-sum halves down to the output range.

    Solinas primes: multiply-free shift/add folds straight to [0, 2q).
    General q: Shoup-fold the high half, then one Barrett multiply."""
    if sol:
        r = _fold28(v2l, v2h, sol)
        rlo, rhi = _solinas_down(r, _fold28_bound(half_bound, sol), sol, q)
    else:
        mh = narrow(*v2h, *_sconst((1 << 28) % q, q), *qc)
        tlo, thi = _add64(*v2l, *mh)  # < 2^46 + 4q
        rlo, rhi = shoup(tlo, thi, *_sconst(1, q), *qc)  # Barrett, [0, 4q)
        if out_factor <= 2:
            rlo, rhi = _reduce_once64(rlo, rhi, *_const64(2 * q))
    if out_factor == 1:
        rlo, rhi = _reduce_once64(rlo, rhi, *qc)
    return rlo, rhi


def _twiddle(sol, shoup, narrow, v_lo, v_hi, t_t, t28_t, qc):
    """Middle twiddle on recombined digit-sum halves (< 2^46 each).

    Solinas: fold the halves into one representative, ONE full Shoup mul
    (< 4q out).  General q: two narrow (y3 = 0) Shoup muls (< 8q out)."""
    if sol:
        return shoup(*_fold28(v_lo, v_hi, sol), *t_t, *qc)
    m1 = narrow(*v_lo, *t_t, *qc)
    m2 = narrow(*v_hi, *t28_t, *qc)
    return _add64(*m1, *m2)


_DOT = functools.partial(
    jax.lax.dot_general,
    dimension_numbers=(((1,), (0,)), ((), ())),
    preferred_element_type=jnp.int32,
)


def _make_fwd_kernel(q: int, A: int, B: int, out_factor: int, tile: int):
    """Forward four-step kernel, natural layout in and out.

    Input/output blocks are ``(tile*A, B)`` — a free reshape of the natural
    ``(batch, n)`` array (rows ``(poly, k1)`` in / ``(poly, r0)`` out) — so
    NO XLA-side transpose ever materializes.  Pass 1 restacks the tile into
    one ``(8A, tile*B)`` right operand of a shared dot; the twiddle applies
    pre-tiled ``(A, tile*B)`` Shoup tables; pass 2 restacks into one
    ``(tile*A, 8B)`` left operand (the restack slices are all 128-lane /
    8-sublane aligned — Mosaic silently miscompiles unaligned ones).

    For Solinas primes ``q = 2^a - 2^b + 1`` (both reference u64 bench
    primes, crates/primus_ntt/benches/bench_u64.rs:8) the digit-sum halves
    fold with shift/adds (``2^a === 2^b - 1``): the twiddle costs ONE Shoup
    multiply and the final reduction costs none — the integer analogue of
    HEXL's special-prime path, applied to the four-step middle/final stages
    instead of the butterfly."""
    sol = _mxu_solinas(q)
    shoup = _make_shoup_lazy64(q, exact=False)
    narrow = _make_shoup_narrow64(q)
    n_tabs = 8 if sol else 16
    half_bound = (1 << 21) * 8 * max(A, B) * 127 * 127
    # _recombine_half's carry-free 7-bit pairing needs digit sums < 2^25
    assert 129 * 8 * max(A, B) * 127 * 127 < (1 << 32), "split too wide"

    cs = tile
    for c in (4, 2, 1):  # chunk size: >=128 dot rows, >=2 chunks if possible
        if tile % c == 0 and c * A >= 128 and c < tile:
            cs = c
            break
    chunks = tile // cs

    def kernel(w1_ref, w2_ref, *rest):
        t_refs = rest[:8]
        t28_refs = rest[8:16] if not sol else ()
        vlo_ref, vhi_ref, olo_ref, ohi_ref = rest[n_tabs : n_tabs + 4]
        qc = _const64(q)

        # The tile is processed in `chunks` slabs with the three stages
        # emitted grouped (all pass-1 dots first, ...), so the scheduler
        # can overlap one chunk's VPU bookkeeping with another's matmul.
        def stage1(g):
            # pass 1 restack: limbs ride the sublanes, polys ride the lanes
            parts = []
            for p in range(g * cs, (g + 1) * cs):
                sl = vlo_ref[p * A : (p + 1) * A, :]
                sh = vhi_ref[p * A : (p + 1) * A, :]
                parts.append(jnp.concatenate(_split7_list(sl, sh), axis=0))
            x8 = jnp.concatenate(parts, axis=1)  # (8A, cs*B)
            return _DOT(w1_ref[:], x8)  # rows (c, r0)

        def stage2(g, o1):
            digs = [
                o1[c * A : (c + 1) * A, :].astype(_U32) for c in range(_LIMBS)
            ]
            v_lo = _recombine_half(digs[:4])
            v_hi = _recombine_half(digs[4:])
            lanes = slice(g * cs * B, (g + 1) * cs * B)
            t_t = [r[:, lanes] for r in t_refs]
            t28_t = [r[:, lanes] for r in t28_refs]
            s2lo, s2hi = _twiddle(sol, shoup, narrow, v_lo, v_hi, t_t, t28_t, qc)
            # pass 2 restack: full-height (cs*A, 8B) dot (cs*A >= 128 keeps
            # the systolic array's row dimension saturated)
            parts = []
            for p in range(cs):
                sl = s2lo[:, p * B : (p + 1) * B]
                sh = s2hi[:, p * B : (p + 1) * B]
                parts.append(jnp.concatenate(_split7_list(sl, sh), axis=1))
            a2 = jnp.concatenate(parts, axis=0)  # (cs*A, 8B)
            return _DOT(a2, w2_ref[:])  # (cs*A, 8B), cols (c, r1)

        def stage3(g, o2):
            d2 = [
                o2[:, c * B : (c + 1) * B].astype(_U32) for c in range(_LIMBS)
            ]
            v2l = _recombine_half(d2[:4])
            v2h = _recombine_half(d2[4:])
            rlo, rhi = _finish(
                q, sol, shoup, narrow, v2l, v2h, half_bound, out_factor, qc
            )
            rows = slice(g * cs * A, (g + 1) * cs * A)
            olo_ref[rows, :] = rlo
            ohi_ref[rows, :] = rhi

        o1s = [stage1(g) for g in range(chunks)]
        o2s = [stage2(g, o1) for g, o1 in enumerate(o1s)]
        for g, o2 in enumerate(o2s):
            stage3(g, o2)

    return kernel


def _make_inv_kernel(
    q: int, A: int, B: int, out_factor: int, tile: int, mul: bool
):
    """Inverse four-step kernel, natural layout in and out (mirror of
    :func:`_make_fwd_kernel`: pass 1 contracts the LANE axis via a right
    dot, pass 2 the sublane axis via a left dot, so bit-reversed natural
    input (rows ``(poly, r0)``, lanes ``r1``) flows through without any
    XLA transpose).  (A, B) here are the plan's inverse split (Ai, Bi).

    ``mul=True`` fuses an elementwise lazy Shoup multiply by pre-permuted
    operand tables before the transform — the NTT-domain half of a
    negacyclic product (pointwise mul + INTT,
    crates/primus_lattice/src/rlwe/coeff.rs:114-116) in one kernel."""
    sol = _mxu_solinas(q)
    shoup = _make_shoup_lazy64(q, exact=False)
    narrow = _make_shoup_narrow64(q)
    n_tabs = (8 if sol else 16) + (8 if mul else 0)
    half_bound = (1 << 21) * 8 * max(A, B) * 127 * 127
    assert 129 * 8 * max(A, B) * 127 * 127 < (1 << 32), "split too wide"

    cs = tile
    for c in (4, 2, 1):  # chunk size: >=128 dot rows, >=2 chunks if possible
        if tile % c == 0 and c * A >= 128 and c < tile:
            cs = c
            break
    chunks = tile // cs

    def kernel(w1m_ref, w2m_ref, *rest):
        t_refs = rest[:8]
        pos = 8 if sol else 16
        t28_refs = rest[8:16] if not sol else ()
        mul_refs = rest[pos : pos + 8] if mul else ()
        vlo_ref, vhi_ref, olo_ref, ohi_ref = rest[n_tabs : n_tabs + 4]
        qc = _const64(q)

        # chunked, stage-grouped emission (see _make_fwd_kernel)
        def stage1(g):
            rows = slice(g * cs * A, (g + 1) * cs * A)
            vlo = vlo_ref[rows, :]  # (cs*A, B): rows (poly, r0), lanes r1
            vhi = vhi_ref[rows, :]
            if mul:
                m_t = [r[rows, :] for r in mul_refs]
                vlo, vhi = shoup(vlo, vhi, *m_t, *qc)
            # pass 1 restack: limbs ride the lanes, polys the sublanes
            parts = []
            for p in range(cs):
                sl = vlo[p * A : (p + 1) * A, :]
                sh = vhi[p * A : (p + 1) * A, :]
                parts.append(jnp.concatenate(_split7_list(sl, sh), axis=1))
            x8 = jnp.concatenate(parts, axis=0)  # (cs*A, 8B)
            return _DOT(x8, w1m_ref[:])  # (cs*A, 8B), cols (c, k0)

        def stage2(g, o1):
            digs = [
                o1[:, c * B : (c + 1) * B].astype(_U32) for c in range(_LIMBS)
            ]
            v_lo = _recombine_half(digs[:4])
            v_hi = _recombine_half(digs[4:])
            rows = slice(g * cs * A, (g + 1) * cs * A)
            t_t = [r[rows, :] for r in t_refs]
            t28_t = [r[rows, :] for r in t28_refs]
            s2lo, s2hi = _twiddle(sol, shoup, narrow, v_lo, v_hi, t_t, t28_t, qc)
            # pass 2 restack: limbs ride the sublanes, polys the lanes
            parts = []
            for p in range(cs):
                sl = s2lo[p * A : (p + 1) * A, :]
                sh = s2hi[p * A : (p + 1) * A, :]
                parts.append(jnp.concatenate(_split7_list(sl, sh), axis=0))
            a2 = jnp.concatenate(parts, axis=1)  # (8A, cs*B)
            return _DOT(w2m_ref[:], a2)  # (8A, cs*B): rows (c, k1), cols (p, k0)

        def stage3(g, o2):
            d2 = [
                o2[c * A : (c + 1) * A, :].astype(_U32) for c in range(_LIMBS)
            ]
            v2l = _recombine_half(d2[:4])
            v2h = _recombine_half(d2[4:])
            rlo, rhi = _finish(
                q, sol, shoup, narrow, v2l, v2h, half_bound, out_factor, qc
            )
            # assemble natural rows (poly, k1) with one concat + one block
            # store: measured 33% faster than cs strided sub-block stores
            # (2.29 -> 3.04M polys/s at n=4096) — Mosaic prefers a single
            # aligned store over per-poly scatter writes.
            rows = slice(g * cs * A, (g + 1) * cs * A)
            olo_ref[rows, :] = jnp.concatenate(
                [rlo[:, p * B : (p + 1) * B] for p in range(cs)], axis=0
            )
            ohi_ref[rows, :] = jnp.concatenate(
                [rhi[:, p * B : (p + 1) * B] for p in range(cs)], axis=0
            )

        o1s = [stage1(g) for g in range(chunks)]
        o2s = [stage2(g, o1) for g, o1 in enumerate(o1s)]
        for g, o2 in enumerate(o2s):
            stage3(g, o2)

    return kernel


def _make_rt_kernel(q: int, A: int, B: int, out_factor: int, tile: int):
    """Fully fused NTT round trip: forward -> pointwise multiply by a
    fixed NTT-domain operand -> inverse, in ONE kernel invocation — the
    negacyclic multiply-by-fixed-key op (crates/primus_lattice/src/rlwe/
    coeff.rs:114-116) with the intermediate NTT-domain value never
    leaving VMEM (saves the inter-kernel HBM round trip plus a launch).

    Requires the plan's inverse split to mirror the forward
    (``Ai == A``), which is the constructor default — the forward's
    natural output rows ``(poly, r0)`` are then exactly the mirrored
    inverse kernel's natural input."""
    sol = _mxu_solinas(q)
    shoup = _make_shoup_lazy64(q, exact=False)
    narrow = _make_shoup_narrow64(q)
    n_twid = 8 if sol else 16
    half_bound = (1 << 21) * 8 * max(A, B) * 127 * 127
    assert 129 * 8 * max(A, B) * 127 * 127 < (1 << 32), "split too wide"

    cs = tile
    for c in (4, 2, 1):
        if tile % c == 0 and c * A >= 128 and c < tile:
            cs = c
            break
    chunks = tile // cs

    def kernel(w1_ref, w2_ref, w1m_ref, w2m_ref, *rest):
        ft_refs = rest[:8]
        ft28_refs = rest[8:n_twid] if not sol else ()
        it_refs = rest[n_twid : n_twid + 8]
        it28_refs = rest[n_twid + 8 : 2 * n_twid] if not sol else ()
        mul_refs = rest[2 * n_twid : 2 * n_twid + 8]
        vlo_ref, vhi_ref, olo_ref, ohi_ref = rest[2 * n_twid + 8 : 2 * n_twid + 12]
        qc = _const64(q)

        def fwd_chunk(g):
            # forward pass 1: limbs ride sublanes, polys ride lanes
            parts = []
            for p in range(g * cs, (g + 1) * cs):
                sl = vlo_ref[p * A : (p + 1) * A, :]
                sh = vhi_ref[p * A : (p + 1) * A, :]
                parts.append(jnp.concatenate(_split7_list(sl, sh), axis=0))
            x8 = jnp.concatenate(parts, axis=1)  # (8A, cs*B)
            o1 = _DOT(w1_ref[:], x8)
            digs = [o1[c * A : (c + 1) * A, :].astype(_U32) for c in range(_LIMBS)]
            v_lo = _recombine_half(digs[:4])
            v_hi = _recombine_half(digs[4:])
            lanes = slice(g * cs * B, (g + 1) * cs * B)
            t_t = [r[:, lanes] for r in ft_refs]
            t28_t = [r[:, lanes] for r in ft28_refs]
            s2lo, s2hi = _twiddle(sol, shoup, narrow, v_lo, v_hi, t_t, t28_t, qc)
            parts = []
            for p in range(cs):
                sl = s2lo[:, p * B : (p + 1) * B]
                sh = s2hi[:, p * B : (p + 1) * B]
                parts.append(jnp.concatenate(_split7_list(sl, sh), axis=1))
            a2 = jnp.concatenate(parts, axis=0)  # (cs*A, 8B)
            o2 = _DOT(a2, w2_ref[:])
            d2 = [o2[:, c * B : (c + 1) * B].astype(_U32) for c in range(_LIMBS)]
            v2l = _recombine_half(d2[:4])
            v2h = _recombine_half(d2[4:])
            # lazy NTT-domain output (< 4q) — feeds the multiply directly
            return _finish(q, sol, shoup, narrow, v2l, v2h, half_bound, 4, qc)

        def inv_chunk(g, flo, fhi):
            rows = slice(g * cs * A, (g + 1) * cs * A)
            m_t = [r[rows, :] for r in mul_refs]
            vlo, vhi = shoup(flo, fhi, *m_t, *qc)  # pointwise * key, < 4q
            parts = []
            for p in range(cs):
                sl = vlo[p * A : (p + 1) * A, :]
                sh = vhi[p * A : (p + 1) * A, :]
                parts.append(jnp.concatenate(_split7_list(sl, sh), axis=1))
            x8 = jnp.concatenate(parts, axis=0)  # (cs*A, 8B)
            o1 = _DOT(x8, w1m_ref[:])
            digs = [o1[:, c * B : (c + 1) * B].astype(_U32) for c in range(_LIMBS)]
            v_lo = _recombine_half(digs[:4])
            v_hi = _recombine_half(digs[4:])
            t_t = [r[rows, :] for r in it_refs]
            t28_t = [r[rows, :] for r in it28_refs]
            s2lo, s2hi = _twiddle(sol, shoup, narrow, v_lo, v_hi, t_t, t28_t, qc)
            parts = []
            for p in range(cs):
                sl = s2lo[p * A : (p + 1) * A, :]
                sh = s2hi[p * A : (p + 1) * A, :]
                parts.append(jnp.concatenate(_split7_list(sl, sh), axis=0))
            a2 = jnp.concatenate(parts, axis=1)  # (8A, cs*B)
            o2 = _DOT(w2m_ref[:], a2)
            d2 = [o2[c * A : (c + 1) * A, :].astype(_U32) for c in range(_LIMBS)]
            v2l = _recombine_half(d2[:4])
            v2h = _recombine_half(d2[4:])
            rlo, rhi = _finish(
                q, sol, shoup, narrow, v2l, v2h, half_bound, out_factor, qc
            )
            olo_ref[rows, :] = jnp.concatenate(
                [rlo[:, p * B : (p + 1) * B] for p in range(cs)], axis=0
            )
            ohi_ref[rows, :] = jnp.concatenate(
                [rhi[:, p * B : (p + 1) * B] for p in range(cs)], axis=0
            )

        # interleave fwd/inv per chunk: halves the live VMEM intermediates
        # vs running all forward chunks first (measured 1.52 -> 1.62M
        # round trips/s at n=4096, tile=8)
        for g in range(chunks):
            flo, fhi = fwd_chunk(g)
            inv_chunk(g, flo, fhi)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def mxu_fused_roundtrip64_mul(
    plan: MxuNttPlan64,
    values: U64,
    mul_tabs,
    out_factor: int = 1,
    tile: int = 8,
) -> U64:
    """``INTT(NTT(values) * key)`` — the negacyclic product by a fixed
    NTT-domain operand — as ONE fused kernel (contract of
    :func:`mxu_fused_forward64` + :func:`mxu_fused_inverse64_mul`, bit
    identical).  ``mul_tabs`` from :meth:`MxuNttPlan64.inverse_mul_tabs`
    with the same ``tile``.  Requires the default mirrored split
    (``Ai == A``)."""
    check_range_u64(values, 1 << 56, 1, "mxu_fused_roundtrip64_mul input")
    q = plan.q
    n, A, B = plan.n, plan.A, plan.B
    if plan.Ai != A or (jax.default_backend() == "tpu" and (B % 128 or A % 8)):
        f = mxu_fused_forward64(plan, values, 4, tile)
        return mxu_fused_inverse64_mul(plan, f, mul_tabs, out_factor, tile)
    vlo, vhi, batch_shape, b, bp, tile = _pad_batch(values, n, tile)
    tabs = plan.tiled_tabs(tile) + plan.tiled_tabs_inv(tile) + tuple(mul_tabs)
    if mul_tabs and mul_tabs[0].shape != (tile * A, B):
        raise ValueError(
            f"mul_tabs built for a different tile: have "
            f"{mul_tabs[0].shape}, kernel needs {(tile * A, B)}"
        )
    kernel = _make_rt_kernel(q, A, B, out_factor, tile)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w_spec = lambda s: pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
    val_spec = pl.BlockSpec((tile * A, B), lambda i: (i, 0), memory_space=pltpu.VMEM)
    olo, ohi = pl.pallas_call(
        kernel,
        grid=(bp // tile,),
        in_specs=[
            w_spec(plan.w1f.shape),
            w_spec(plan.w2f.shape),
            w_spec(plan.w1mf.shape),
            w_spec(plan.w2mf.shape),
        ]
        + [w_spec(t.shape) for t in tabs]
        + [val_spec] * 2,
        out_specs=[val_spec] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((bp * A, B), jnp.uint32),
            jax.ShapeDtypeStruct((bp * A, B), jnp.uint32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(
        plan.w1f, plan.w2f, plan.w1mf, plan.w2mf, *tabs,
        vlo.reshape(bp * A, B), vhi.reshape(bp * A, B),
    )
    olo = olo.reshape(bp, n)[:b].reshape(*batch_shape, n)
    ohi = ohi.reshape(bp, n)[:b].reshape(*batch_shape, n)
    return U64(olo, ohi)


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
    """pallas_call scaffolding shared by both natural-layout kernels:
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


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def mxu_fused_forward64(
    plan: MxuNttPlan64, values: U64, out_factor: int = 1, tile: int = 16
) -> U64:
    """Fused-Pallas MXU forward NTT; contract of :func:`mxu_forward64`.

    Natural-layout in/out — both int8 matmuls, the digit recombination,
    the Shoup twiddle and the final reduction stay VMEM-resident, and no
    XLA-side transpose materializes.  On TPU, splits whose lane block (B)
    is not 128-aligned fall back to the einsum path (Mosaic restack)."""
    check_range_u64(values, 1 << 56, 1, "mxu_fused_forward64 input")
    q = plan.q
    n, A, B = plan.n, plan.A, plan.B
    if jax.default_backend() == "tpu" and (B % 128 or A % 8):
        return mxu_forward64(plan, values, out_factor)
    vlo, vhi, batch_shape, b, bp, tile = _pad_batch(values, n, tile)
    kernel = _make_fwd_kernel(q, A, B, out_factor, tile)
    tabs = plan.tiled_tabs(tile)
    olo, ohi = _natural_call(
        kernel, len(tabs), A, B, plan.w1f, plan.w2f, tabs,
        vlo.reshape(bp * A, B), vhi.reshape(bp * A, B), bp, tile,
    )
    olo = olo.reshape(bp, n)[:b].reshape(*batch_shape, n)
    ohi = ohi.reshape(bp, n)[:b].reshape(*batch_shape, n)
    return U64(olo, ohi)


def _inv_common(plan, values, out_factor, tile, mul_tabs):
    check_range_u64(values, 1 << 56, 1, "mxu inverse input")
    q = plan.q
    n, A, B = plan.n, plan.Ai, plan.Bi
    vlo, vhi, batch_shape, b, bp, tile = _pad_batch(values, n, tile)
    tabs = plan.tiled_tabs_inv(tile) + tuple(mul_tabs)
    if mul_tabs and mul_tabs[0].shape != (tile * A, B):
        raise ValueError(
            f"mul_tabs built for a different tile: have {mul_tabs[0].shape}, "
            f"kernel needs {(tile * A, B)}"
        )
    kernel = _make_inv_kernel(q, A, B, out_factor, tile, mul=bool(mul_tabs))
    olo, ohi = _natural_call(
        kernel, len(tabs), A, B, plan.w1mf, plan.w2mf, tabs,
        vlo.reshape(bp * A, B), vhi.reshape(bp * A, B), bp, tile,
    )
    olo = olo.reshape(bp, n)[:b].reshape(*batch_shape, n)
    ohi = ohi.reshape(bp, n)[:b].reshape(*batch_shape, n)
    return U64(olo, ohi)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def mxu_fused_inverse64(
    plan: MxuNttPlan64, values: U64, out_factor: int = 1, tile: int = 16
) -> U64:
    """Fused-Pallas MXU inverse NTT; contract of :func:`mxu_inverse64`
    (bit-reversed input, normal-order output, ``inv_n`` folded into the
    pass-2 matrix).  Natural-layout in/out via the mirrored kernel; uses
    the plan's inverse split (Ai, Bi)."""
    if jax.default_backend() == "tpu" and (plan.Bi % 128 or plan.Ai % 8):
        return mxu_inverse64(plan, values, out_factor)
    return _inv_common(plan, values, out_factor, tile, ())


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def mxu_fused_inverse64_mul(
    plan: MxuNttPlan64,
    values: U64,
    mul_tabs,
    out_factor: int = 1,
    tile: int = 16,
) -> U64:
    """Fused pointwise-multiply + inverse NTT: ``INTT(values * key)`` with
    the elementwise lazy Shoup multiply running inside the kernel (the
    NTT-domain half of a negacyclic product never touches HBM).  ``mul_tabs``
    come from :meth:`MxuNttPlan64.inverse_mul_tabs` built with the same
    ``tile``.  Mirrors the reference's pointwise-then-inverse sequence
    (crates/primus_lattice/src/rlwe/coeff.rs:114-116) as one fused op."""
    return _inv_common(plan, values, out_factor, tile, tuple(mul_tabs))
