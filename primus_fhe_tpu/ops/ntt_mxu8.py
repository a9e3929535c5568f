"""Byte-radix (signed base-256) MXU four-step NTT — the wide-tier kernel.

Four-step (Bailey) factorization with both dense passes as exact int8
matmuls on the systolic array plus one pointwise twiddle per direction
(host matrices from :func:`ops.mxu_common.four_step_matrices`; reference
semantics ``crates/primus_ntt/src/ntt/prime64/scalar/transform.rs``),
with the coefficients entering the MXU through a **signed byte split**:

* value side — the bytes of ``v`` XOR ``0x80``, bitcast to int8
  (``byte - 128``): byte boundaries align with the u32 words, so a limb
  is one shift + one truncating cast, and the XOR is two whole-word ops;
* matrix side — **balanced base-256 digits** in ``[-128, 127]`` of
  ``M * 2^(8l) mod q``;
* the systematic offsets (value ``-128`` per byte, digit-sum bias) fold
  into ONE per-row additive constant applied at the twiddle/finish folds
  (``corr = sum_c (128 * rowsum_c - BIAS) 2^(8c) mod q``).

This buys two things over the 7-bit kernel:

1. ~12.5% fewer matmul MACs than a 7-bit unsigned-limb split and a
   cheaper per-plane extraction (7 planes instead of 8 for the
   ``q < 2^53`` tier) — the round-trip headline path;
2. **the 60-bit prime tier**: 8 byte planes cover any u64 value, and
   int32 digit sums stay exact (``8*256*128^2 = 2^25``), so the MXU path
   extends to ``q < 2^62`` — covering the reference's full AVX-512 range
   (``crates/primus_ntt/src/ntt/prime64/avx512/internal.rs:1-73``, golden
   60-bit prime 1152921504606830593) that previously rode the VPU
   butterfly.

Bit-exact against the golden model on the reference primes
(``tests/test_ntt_mxu8.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..numeric.limb import U64
from ..utils.contracts import check_range_u64
from .mxu_common import (
    _DOT,
    _const64,
    _make_shoup_lazy64,
    _make_shoup_narrow64,
    _mask64p,
    _natural_call,
    _pad_batch,
    _sconst,
    _shoup_tabs,
    _shr64p,
    _solinas_down,
    four_step_matrices,
)
from .ntt_pallas import (
    _add64,
    _reduce_once64,
    _shl64,
    _solinas_form,
    _sub64,
)

_U32 = jnp.uint32


# ---------------------------------------------------------------------------
# Host-side table construction
# ---------------------------------------------------------------------------


def _planes_for(q: int) -> int:
    """4 byte planes for the u32 tier (``q < 2^30``), 7 for ``q < 2^53``,
    8 for ``q < 2^62`` (the reference's full AVX-512 range; the 61/62-bit
    general-q paths take extra guard reductions to keep sums in u64)."""
    if q < 1 << 30:
        return 4
    if q < 1 << 53:
        return 7
    if q < 1 << 62:
        return 8
    raise ValueError("byte-radix MXU plan requires q < 2^62")


def _balanced_digits_arr(ms, planes: int):
    """Balanced base-256 digits (each in [-128,127]) of an object-int
    array of values in [0, 2^(8*planes - 2)); list of int8 arrays."""
    x = ms.astype(object, copy=True)
    digs = []
    for _c in range(planes):
        d = x & 255
        x = x >> 8
        over = d >= 128
        d = d - over * 256
        x = x + over
        digs.append(d)
    assert (x == 0).all(), "balanced digit overflow (value too wide)"
    assert all((abs(d) <= 128).all() for d in digs)
    return [d.astype(np.int8) for d in digs]


def _byte_matrix(m, q: int, planes: int) -> np.ndarray:
    """``W[(c,r),(l,k)] = bal_c(M[r,k] * 2^(8l) mod q)`` in block order
    (digit planes are contiguous row/col blocks)."""
    R, K = m.shape
    w = np.zeros((planes * R, planes * K), dtype=np.int8)
    for l in range(planes):
        scale = pow(2, 8 * l, q)
        digs = _balanced_digits_arr((m * scale) % q, planes)
        for c in range(planes):
            w[c * R : (c + 1) * R, l * K : (l + 1) * K] = digs[c]
    return w


def _bias_for(planes: int, K: int) -> int:
    """Worst-case digit-sum bias: |S| <= planes*K*128*128 exactly."""
    return planes * K * 128 * 128


def _bias_exact(w: np.ndarray) -> int:
    """Exact digit-sum bias for a concrete byte matrix: the value-side
    bytes are in [-128, 127], so ``|S[row]| <= 128 * sum_k |W[row, k]|``.
    For the DFT matrices this is ~half the worst case, which keeps the
    pass-2 sums inside the carry-free packing margin
    (``smax * 257 < 2^32``) that the fused planes→fold fast path needs."""
    return int(128 * np.abs(w.astype(np.int64)).sum(axis=1).max())


def _corr_vec(w: np.ndarray, planes: int, R: int, bias: int, q: int):
    """Per-output-row additive constant (canonical, mod q): the folded
    value-XOR and bias offsets.  ``w`` in block order (planes*R rows)."""
    rs = w.astype(np.int64).sum(axis=1).reshape(planes, R)
    wsum = sum(1 << (8 * c) for c in range(planes))
    corr = np.empty(R, dtype=object)
    for r in range(R):
        acc = sum(128 * int(rs[c, r]) * (1 << (8 * c)) for c in range(planes))
        corr[r] = (acc - bias * wsum) % q
    return corr


def _pair_np(vec) -> tuple[np.ndarray, np.ndarray]:
    """Object-int vector -> (lo, hi) u32 arrays."""
    lo = np.asarray([int(v) & 0xFFFFFFFF for v in vec], dtype=np.uint32)
    hi = np.asarray([int(v) >> 32 for v in vec], dtype=np.uint32)
    return lo, hi


def _mxu8_solinas(q: int):
    """Solinas form usable by the byte kernel's 2^32-split folds."""
    sol = _solinas_form(q)
    return sol if sol is not None and sol[0] > 32 else None


class Mxu8NttPlan64:
    """Byte-radix four-step plan: constant matrices, twiddle Shoup
    tables, and offset-correction vectors for forward + mirrored inverse.

    Valid for ``q < 2^62`` (8 planes; 7 when ``q < 2^53``, 4 when
    ``q < 2^30``).  Natural-layout kernel contracts: value/output blocks
    are free ``(batch*A, B)`` views of the natural ``(batch, n)`` array —
    no XLA-side transpose ever materializes.
    """

    def __init__(
        self,
        log_n: int,
        q: int,
        h1: int | None = None,
        root: int | None = None,
        planes: int | None = None,
    ):
        # ``planes`` overrides the natural tier upward (used by the
        # dynamic-q stacks to keep a heterogeneous residue set on ONE
        # plane count — e.g. a 50-bit modulus built at 8 planes so it
        # shares the SPMD program with a 60-bit neighbour)
        natural = _planes_for(q)
        if planes is None:
            planes = natural
        elif planes not in (4, 7, 8) or planes < natural:
            raise ValueError(
                f"planes override must be in {{4,7,8}} and >= the natural "
                f"tier {natural}, got {planes}"
            )
        self.planes = P = planes
        self.log_n = log_n
        self.n = n = 1 << log_n
        self.q = q
        if h1 is None:
            # lane-aligned default: B = 2^(log_n - h1) >= 128, so the MXU
            # tier covers log_n >= 8 (A as small as 2 for n=256 — pass-2,
            # the dominant matmul, stays at full lane efficiency)
            if log_n >= 10:
                h1 = log_n - max(7, -(-log_n // 2))
            elif log_n >= 8:
                h1 = log_n - 7
            else:
                h1 = (log_n + 1) // 2
        if not 0 <= h1 <= log_n:
            raise ValueError(f"h1 must be in [0, {log_n}], got {h1}")
        self.A = A = 1 << h1
        self.B = B = 1 << (log_n - h1)
        # mirrored split (rt fusion requires Ai == A)
        self.Ai, self.Bi = A, B
        if P * max(A, B) * 128 * 128 >= 1 << 31:
            raise ValueError("split too wide for int32 digit sums")
        fs = four_step_matrices(log_n, q, h1, h1, root)

        self.w1f = _byte_matrix(fs["m1"], q, P)  # (PA, PA): rows (c,r0)
        w2 = _byte_matrix(fs["m2"], q, P)  # rows (c,r1)
        self.w2f = np.ascontiguousarray(w2.T)  # (PB, PB): cols (c,r1)
        w1m = _byte_matrix(fs["m2i"], q, P)  # rows (c,k0)
        self.w1mf = np.ascontiguousarray(w1m.T)  # (PB, PB): cols (c,k0)
        self.w2mf = _byte_matrix(fs["m1i"], q, P)  # (PA, PA): rows (c,k1)

        # biases per pass — exact per-matrix bounds (~half the worst case
        # planes*K*128^2; the looser bound pushed pass-2 sums past the
        # carry-free packing margin)
        self.bias_f1 = _bias_exact(self.w1f)
        self.bias_f2 = _bias_exact(w2)
        self.bias_i1 = _bias_exact(w1m)
        self.bias_i2 = _bias_exact(self.w2mf)

        # per-row corrections (canonical u64 pairs).  Row-indexed ones are
        # stored lane-broadcast (R, B) (a lane dim of 1 has no legal
        # Mosaic layout); lane-indexed ones stay (1, C) and broadcast
        # over rows inside the kernel.  All twiddle/correction tables are
        # UNTILED (A, B) content — the kernels apply them per poly block,
        # so VMEM holds one copy regardless of tile.
        def row_tab(v):  # (R,) -> (R, B) lane-broadcast table
            return np.ascontiguousarray(
                np.broadcast_to(v.reshape(-1, 1), (v.size, B))
            )

        c_f1 = _pair_np(_corr_vec(self.w1f, P, A, self.bias_f1, q))
        self.corr_f1 = tuple(row_tab(x) for x in c_f1)  # rows r0
        c_f2 = _pair_np(_corr_vec(w2, P, B, self.bias_f2, q))
        self.corr_f2 = tuple(x.reshape(1, B) for x in c_f2)  # lanes r1
        c_i1 = _pair_np(_corr_vec(w1m, P, B, self.bias_i1, q))
        self.corr_i1 = tuple(x.reshape(1, B) for x in c_i1)  # lanes k0
        c_i2 = _pair_np(_corr_vec(self.w2mf, P, A, self.bias_i2, q))
        self.corr_i2 = tuple(row_tab(x) for x in c_i2)  # rows k1

        # twiddle Shoup tables; non-Solinas also needs the 2^32-scaled
        # tables and the pre-multiplied correction term corr*T mod q
        sol = _mxu8_solinas(q)
        tw, twi = fs["tw"], fs["twi"]
        self.t_tabs = _shoup_tabs(tw, q)
        self.tim_tabs = _shoup_tabs(twi, q)
        if sol is None:
            self.t32_tabs = _shoup_tabs((tw * ((1 << 32) % q)) % q, q)
            self.tim32_tabs = _shoup_tabs((twi * ((1 << 32) % q)) % q, q)
            cf = np.empty((A, B), dtype=object)
            ci = np.empty((A, B), dtype=object)
            corr1 = _corr_vec(self.w1f, P, A, self.bias_f1, q)
            corr1i = _corr_vec(w1m, P, B, self.bias_i1, q)
            for r in range(A):
                for k in range(B):
                    cf[r, k] = corr1[r] * tw[r, k] % q
                    ci[r, k] = corr1i[k] * twi[r, k] % q
            self.corrt_f = self._pair_tab(cf)
            self.corrt_i = self._pair_tab(ci)
        else:
            self.t32_tabs = self.tim32_tabs = None
            self.corrt_f = self.corrt_i = None

    @staticmethod
    def _pair_tab(m) -> tuple[np.ndarray, np.ndarray]:
        lo = np.vectorize(lambda v: int(v) & 0xFFFFFFFF, otypes=[np.uint32])(m)
        hi = np.vectorize(lambda v: int(v) >> 32, otypes=[np.uint32])(m)
        return lo, hi

    def tiled_tabs(self, tile: int = 0):
        """Forward tables, untiled: twiddle Shoup tabs (+2^32-scaled +
        corr*T for general q) ``(A, B)``, the pass-1 correction pair
        ``(A, B)``, the pass-2 correction pair ``(1, B)``.  ``tile`` is
        ignored (kept for call-site compatibility)."""
        if _mxu8_solinas(self.q):
            tabs = self.t_tabs + self.corr_f1
        else:
            tabs = self.t_tabs + self.t32_tabs + self.corrt_f + self.corr_f1
        return tabs + self.corr_f2

    def tiled_tabs_inv(self, tile: int = 0):
        """Mirrored-inverse tables, untiled: twiddle tabs ``(A, B)``,
        pass-1 correction ``(1, B)``, pass-2 correction ``(A, B)``."""
        if _mxu8_solinas(self.q):
            tabs = self.tim_tabs
        else:
            tabs = self.tim_tabs + self.tim32_tabs + self.corrt_i
        return tabs + self.corr_i1 + self.corr_i2

    def inverse_mul_tabs(self, key, tile: int = 0):
        """Shoup tables of a fixed NTT-domain operand, untiled ``(A, B)``
        (bit-reversed order); the kernels apply them per poly block.
        ``tile`` is ignored (kept for call-site compatibility)."""
        m = np.asarray([int(v) for v in np.asarray(key).reshape(-1)], dtype=object)
        m = m.reshape(self.Ai, self.Bi)
        return _shoup_tabs(m, self.q)


# ---------------------------------------------------------------------------
# In-kernel byte arithmetic
# ---------------------------------------------------------------------------


def _split_bytes_list(lo, hi, planes: int):
    """Signed byte planes of a (lo, hi) u32 pair: byte XOR 0x80 bitcast
    to int8 (= byte - 128).  Byte boundaries align with the words, so
    each plane is one shift + one truncating cast."""
    xl = lo ^ np.uint32(0x80808080)
    xh = hi ^ np.uint32(0x80808080 if planes == 8 else 0x00808080)
    out = []
    for l in range(planes):
        src = xl if l < 4 else xh
        s = 8 * (l % 4)
        part = src if s == 0 else src >> s
        out.append(part.astype(jnp.int8))
    return out


def _recombine_quad(ds, smax: int):
    """``sum_i ds[i] 2^(8i)`` of 2..4 biased u32 digit planes (< smax)
    as a u64 pair.  When ``smax*257 < 2^32`` the 8-bit-shifted pairing is
    carry-free in u32 (one add64 total); otherwise a carrying ladder."""
    k = len(ds)
    if smax * 257 < 1 << 32:
        e01 = ds[0] + (ds[1] << 8) if k >= 2 else ds[0]
        if k == 2:
            return e01, jnp.zeros_like(e01)
        e23 = ds[2] + (ds[3] << 8) if k == 4 else ds[2]
        return _add64(e01, jnp.zeros_like(e01), e23 << 16, e23 >> 16)
    r = (ds[0], jnp.zeros_like(ds[0]))
    for i in range(1, k):
        s = 8 * i
        r = _add64(*r, ds[i] << s, ds[i] >> (32 - s))
    return r


def _recombine_bytes(digs, bias: int, smax: int):
    """Biased halves of ``planes`` int32 digit planes: returns
    ``(Ulow, Uhigh)`` u64 pairs with value ``U = Ulow + 2^32 Uhigh``
    (the true mod-q value is ``U + corr``)."""
    b = np.uint32(bias)
    ds = [d.astype(_U32) + b for d in digs]
    low = _recombine_quad(ds[:4], smax)
    if len(ds) <= 4:  # u32 tier: the high half is identically zero
        z = jnp.zeros_like(low[0])
        return low, (z, z)
    return low, _recombine_quad(ds[4:], smax)


def _fold32(vl, vh, sol, high_bound: int | None = None):
    """``Ulow + 2^32 * Uhigh (mod q)`` for Solinas ``q = 2^a - 2^b + 1``
    with ``a > 32`` — multiply-free (``2^a === 2^b - 1``).

    When the caller proves ``Uhigh < min(2^a, 2^(32+s))`` (true for every
    recombined digit-sum half: < 2^50 at both tiers), the shifted part
    ``vh1 = Uhigh >> s`` fits one u32 word and ``Ulow``'s high word can
    absorb ``vh0`` carry-free, trimming the pair-op chains."""
    a, b = sol
    s = a - 32
    if high_bound is not None and 0 < s < 32 and b < 32 and high_bound <= 1 << a:
        vhlo, vhhi = vh
        vh1 = (vhlo >> s) | (vhhi << (32 - s))  # single u32 word
        vh0 = vhlo & ((1 << s) - 1)
        tlo = vh1 << b
        thi = vh1 >> (32 - b)
        t = _sub64(tlo, thi, vh1, jnp.zeros_like(vh1))
        # vl < 2^48 and vh0 < 2^s <= 2^31: the high-word add is carry-free
        return _add64(vl[0], vl[1] + vh0, *t)
    vh1 = _shr64p(*vh, s)
    vh0 = _mask64p(*vh, s)
    t = _sub64(*_shl64(*vh1, b), *vh1)
    r = _add64(*vl, *_shl64(*vh0, 32))
    return _add64(*r, *t)


def _fold32_bound(low_bound: int, high_bound: int, sol) -> int:
    a, b = sol
    vh1 = max(high_bound - 1, 0) >> (a - 32)
    return low_bound + (1 << a) + vh1 * ((1 << b) - 1)


def _u_bounds(bias: int, planes: int):
    """(low, high) recombined-half bounds for digit planes <= 2*bias."""
    smax = 2 * bias
    low = sum(smax << (8 * c) for c in range(4))
    high = sum(smax << (8 * c) for c in range(planes - 4))
    return low, high, smax


def _fold_ok(planes: int, bounds, sol) -> bool:
    """Eligibility of the fused planes→representative fast path.

    Only the 7/8-plane tiers qualify: the fold needs a Solinas form with
    exponent ``a > 32`` (``_mxu8_solinas``), which no ``q < 2^30``
    4-plane modulus has.  The u32 tier instead takes the ``u32_tier``
    skips in :func:`_twiddle8`/:func:`_finish8` (its recombined high
    half is identically zero)."""
    if not sol or planes not in (7, 8):
        return False
    low_b, high_b, smax = bounds
    if smax * 257 + (1 << 16) >= 1 << 32:
        return False
    a, b = sol
    return 17 <= a - 32 < 32 and b < 32 and high_b <= (1 << a)


def _planes_to_y(digs, bias: int, bounds, sol):
    """7/8 biased digit planes → one folded mod-q representative (u64
    pair), fusing the 16-bit-group packing with the 2^32 Solinas fold
    (4-plane callers never reach here — see :func:`_fold_ok`).

    The high half is ``V_H = lo16(e45) + uu·2^16`` with
    ``uu = (e45 >> 16) + e6`` (7 planes) or ``+ e67`` (8); its shifted
    part is then EXACTLY ``vh1 = uu >> (s-16)`` (the fractional parts
    cannot sum to 1: ``frac(uu/2^(s-16)) <= 1 - 2^-(s-16)`` and
    ``lo16/2^s < 2^-(s-16)``), which skips assembling the wide high
    half altogether.  Bit-identical to ``_recombine_bytes`` +
    ``_fold32``."""
    a, b = sol
    s = a - 32
    # biased pair sums via wrapping u32 arithmetic: (d0+bias) + (d1+bias)
    # << 8 == d0 + (d1 << 8) + bias*257 exactly mod 2^32, so the per-plane
    # bias adds fold into one packed constant per pair
    b2 = np.uint32((bias * 257) & 0xFFFFFFFF)
    du = [d.astype(_U32) for d in digs]
    e01 = du[0] + (du[1] << 8) + b2
    e23 = du[2] + (du[3] << 8) + b2
    vl = _add64(e01, jnp.zeros_like(e01), e23 << 16, e23 >> 16)
    e45 = du[4] + (du[5] << 8) + b2
    top = (
        du[6] + np.uint32(bias)
        if len(du) == 7
        else du[6] + (du[7] << 8) + b2
    )
    uu = (e45 >> 16) + top
    vh1 = uu >> (s - 16)
    vh0 = (e45 & np.uint32(0xFFFF)) | (
        (uu & np.uint32((1 << (s - 16)) - 1)) << 16
    )
    t = _sub64(vh1 << b, vh1 >> (32 - b), vh1, jnp.zeros_like(vh1))
    return _add64(vl[0], vl[1] + vh0, *t)


def _twiddle8(
    q, sol, shoup, narrow, v_lo, v_hi, corr, t_t, t32_t, ct_t, qc,
    high_bound: int | None = None, y=None, u32_tier: bool = False,
    bounds=None,
):
    """Twiddle on biased halves: Solinas folds + corr-add + ONE Shoup
    (output < 4q); general q: two narrow Shoups (reduced once to < 4q) +
    precomputed corr*T add (output < 5q — fits the byte split range).
    ``y`` short-circuits the fold when the caller already holds the
    fused planes→representative value (:func:`_planes_to_y`);
    ``u32_tier`` (4 planes) drops the high-half Shoup — the recombined
    high half of a 4-plane digit sum is identically zero.  ``bounds``
    (the pass's ``_u_bounds``) gates the narrow Shoup: a half whose
    PROVEN bound reaches 2^48 (the 8-plane B-contractions) must take the
    full lazy Shoup — narrow's dropped y3 row would corrupt the quotient
    for adversarial digit sums."""
    if sol:
        if y is None:
            y = _fold32(v_lo, v_hi, sol, high_bound)
        y = _add64(*y, *corr)
        return shoup(*y, *t_t, *qc)
    lo_mul = narrow if bounds is None or bounds[0] < 1 << 48 else shoup
    hi_mul = narrow if bounds is None or bounds[1] < 1 << 48 else shoup
    m1 = lo_mul(*v_lo, *t_t, *qc)
    if u32_tier:
        return _add64(*m1, *ct_t)  # m1 < 4q; output < 5q as below
    m2 = hi_mul(*v_hi, *t32_t, *qc)
    if 8 * q >= 1 << 64:  # 61/62-bit tier: keep every sum inside u64
        m1 = _reduce_once64(*m1, *_const64(2 * q))
        m2 = _reduce_once64(*m2, *_const64(2 * q))
        s = _reduce_once64(*_add64(*m1, *m2), *_const64(2 * q))
    else:
        s = _reduce_once64(*_add64(*m1, *m2), *_const64(4 * q))
    return _add64(*s, *ct_t)


def _finish8(
    q, sol, shoup, narrow, v2l, v2h, corr, bounds, out_factor, qc, y=None,
    u32_tier: bool = False,
):
    """Final fold of pass-2 halves + correction down to the output range."""
    low_b, high_b, _ = bounds
    if sol:
        r = y if y is not None else _fold32(v2l, v2h, sol, high_b)
        r = _add64(*r, *corr)
        bound = _fold32_bound(low_b, high_b, sol) + q
        rlo, rhi = _solinas_down(r, bound, sol, q)
    else:
        if u32_tier:  # 4-plane high half is identically zero: skip it
            t = _add64(*v2l, *corr)
        else:
            # narrow is only sound below its y < 2^48 contract (see
            # _twiddle8); the 8-plane B-contraction can prove up to 2^49
            hi_mul = narrow if high_b < 1 << 48 else shoup
            mh = hi_mul(*v2h, *_sconst((1 << 32) % q, q), *qc)
            if 8 * q >= 1 << 64:  # 61/62-bit tier: sums must fit u64
                mh = _reduce_once64(*mh, *_const64(2 * q))
            t = _add64(*_add64(*v2l, *mh), *corr)
        rlo, rhi = shoup(*t, *_sconst(1, q), *qc)  # Barrett, [0,4q)
        if out_factor <= 2:
            rlo, rhi = _reduce_once64(rlo, rhi, *_const64(2 * q))
    if out_factor == 1:
        rlo, rhi = _reduce_once64(rlo, rhi, *_const64(q))
    return rlo, rhi


def _chunking(tile: int, A: int):
    """Chunk size: wide matmuls (big cs) amortize MXU issue, but >= 2
    chunks lets the staged phases co-issue one chunk's VPU tail under the
    next chunk's matmul — the sweet spot on v5e is cs = tile/2 capped at
    16 (sweeps in scratch/probe_cs_r3.py), floored at lane alignment."""
    lo = max(1, -(-128 // A))
    cs = max(min(tile // 2, 16), lo)
    while tile % cs:
        cs -= 1
    return cs, tile // cs


def _n_twid(sol) -> int:
    """Twiddle-group table count (excl. the 4 correction tables)."""
    return 8 if sol else 18  # +8 scaled tables +2 corr*T planes


def _unpack_tabs(rest, sol):
    """(t8, t32, ct, cA, cB, next_index) from a kernel's rest tuple:
    twiddle group, then the two correction pairs."""
    t8 = rest[:8]
    k = 8 if sol else 18
    t32 = rest[8:16] if not sol else ()
    ct = rest[16:18] if not sol else ()
    cA = rest[k : k + 2]
    cB = rest[k + 2 : k + 4]
    return t8, t32, ct, cA, cB, k + 4


# ---------------------------------------------------------------------------
# Fused kernels (natural layout; chunked, stage-grouped emission)
# ---------------------------------------------------------------------------


def _make_fwd_kernel8(plan: Mxu8NttPlan64, out_factor: int, tile: int):
    q, A, B, P = plan.q, plan.A, plan.B, plan.planes
    u32t = P == 4
    sol = _mxu8_solinas(q)
    shoup = _make_shoup_lazy64(q, exact=False)
    narrow = _make_shoup_narrow64(q)
    cs, chunks = _chunking(tile, A)
    b1 = _u_bounds(plan.bias_f1, P)
    b2 = _u_bounds(plan.bias_f2, P)

    def kernel(w1_ref, w2_ref, *rest):
        t_t8, t32_8, ct_2, c1_t, c2_t, nt = _unpack_tabs(rest, sol)
        vlo_ref, vhi_ref, olo_ref, ohi_ref = rest[nt : nt + 4]
        qc = _const64(q)
        c2 = (c2_t[0][:], c2_t[1][:])  # (1, B): broadcasts over rows

        def stage1(g):
            parts = []
            for p in range(g * cs, (g + 1) * cs):
                sl = vlo_ref[p * A : (p + 1) * A, :]
                sh = vhi_ref[p * A : (p + 1) * A, :]
                parts.append(
                    jnp.concatenate(_split_bytes_list(sl, sh, P), axis=0)
                )
            x8 = jnp.concatenate(parts, axis=1)  # (PA, cs*B)
            return _DOT(w1_ref[:], x8)  # rows (c, r0)

        def stage2(g, o1):
            digs = [o1[c * A : (c + 1) * A, :] for c in range(P)]
            if _fold_ok(P, b1, sol):
                y = _planes_to_y(digs, plan.bias_f1, b1, sol)
                v_lo = v_hi = None
            else:
                y = None
                v_lo, v_hi = _recombine_bytes(digs, plan.bias_f1, b1[2])
            t_t = [r[:] for r in t_t8]  # (A, B), applied per poly block
            t32 = [r[:] for r in t32_8]
            ct = [r[:] for r in ct_2]
            c1 = (c1_t[0][:], c1_t[1][:])
            parts = []
            for p in range(cs):
                lanes = slice(p * B, (p + 1) * B)
                s2lo, s2hi = _twiddle8(
                    q, sol, shoup, narrow,
                    None if y else (v_lo[0][:, lanes], v_lo[1][:, lanes]),
                    None if y else (v_hi[0][:, lanes], v_hi[1][:, lanes]),
                    c1, t_t, t32, ct, qc, b1[1], bounds=b1,
                    y=(y[0][:, lanes], y[1][:, lanes]) if y else None,
                    u32_tier=u32t,
                )
                parts.append(
                    jnp.concatenate(_split_bytes_list(s2lo, s2hi, P), axis=1)
                )
            a2 = jnp.concatenate(parts, axis=0)  # (cs*A, PB)
            return _DOT(a2, w2_ref[:])  # cols (c, r1)

        def stage3(g, o2):
            d2 = [o2[:, c * B : (c + 1) * B] for c in range(P)]
            if _fold_ok(P, b2, sol):
                y = _planes_to_y(d2, plan.bias_f2, b2, sol)
                rlo, rhi = _finish8(
                    q, sol, shoup, narrow, None, None, c2, b2, out_factor,
                    qc, y=y, u32_tier=u32t,
                )
            else:
                v2l, v2h = _recombine_bytes(d2, plan.bias_f2, b2[2])
                rlo, rhi = _finish8(
                    q, sol, shoup, narrow, v2l, v2h, c2, b2, out_factor, qc,
                    u32_tier=u32t,
                )
            rows = slice(g * cs * A, (g + 1) * cs * A)
            olo_ref[rows, :] = rlo
            ohi_ref[rows, :] = rhi

        o1s = [stage1(g) for g in range(chunks)]
        o2s = [stage2(g, o1) for g, o1 in enumerate(o1s)]
        for g, o2 in enumerate(o2s):
            stage3(g, o2)

    return kernel


def _make_inv_kernel8(plan: Mxu8NttPlan64, out_factor: int, tile: int, mul: bool):
    q, A, B, P = plan.q, plan.Ai, plan.Bi, plan.planes
    u32t = P == 4
    sol = _mxu8_solinas(q)
    shoup = _make_shoup_lazy64(q, exact=False)
    narrow = _make_shoup_narrow64(q)
    cs, chunks = _chunking(tile, A)
    b1 = _u_bounds(plan.bias_i1, P)
    b2 = _u_bounds(plan.bias_i2, P)

    def kernel(w1m_ref, w2m_ref, *rest):
        t_t8, t32_8, ct_2, ci1_t, ci2_t, pos = _unpack_tabs(rest, sol)
        mul_refs = rest[pos : pos + 8] if mul else ()
        nt = pos + (8 if mul else 0)
        vlo_ref, vhi_ref, olo_ref, ohi_ref = rest[nt : nt + 4]
        qc = _const64(q)
        c1 = (ci1_t[0][:], ci1_t[1][:])  # (1, B): broadcasts over rows
        c2 = (ci2_t[0][:], ci2_t[1][:])  # (A, B), applied per poly block

        def stage1(g):
            if mul:
                m_t = [r[:] for r in mul_refs]  # (A, B) per poly block
            parts = []
            for p in range(g * cs, (g + 1) * cs):
                rows = slice(p * A, (p + 1) * A)
                vlo = vlo_ref[rows, :]
                vhi = vhi_ref[rows, :]
                if mul:
                    vlo, vhi = shoup(vlo, vhi, *m_t, *qc)
                parts.append(
                    jnp.concatenate(_split_bytes_list(vlo, vhi, P), axis=1)
                )
            x8 = jnp.concatenate(parts, axis=0)  # (cs*A, PB)
            return _DOT(x8, w1m_ref[:])  # cols (c, k0)

        def stage2(g, o1):
            digs = [o1[:, c * B : (c + 1) * B] for c in range(P)]
            if _fold_ok(P, b1, sol):
                y = _planes_to_y(digs, plan.bias_i1, b1, sol)
                v_lo = v_hi = None
            else:
                y = None
                v_lo, v_hi = _recombine_bytes(digs, plan.bias_i1, b1[2])
            t_t = [r[:] for r in t_t8]  # (A, B) per poly block
            t32 = [r[:] for r in t32_8]
            ct = [r[:] for r in ct_2]
            parts = []
            for p in range(cs):
                rows = slice(p * A, (p + 1) * A)
                s2lo, s2hi = _twiddle8(
                    q, sol, shoup, narrow,
                    None if y else (v_lo[0][rows, :], v_lo[1][rows, :]),
                    None if y else (v_hi[0][rows, :], v_hi[1][rows, :]),
                    c1, t_t, t32, ct, qc, b1[1], bounds=b1,
                    y=(y[0][rows, :], y[1][rows, :]) if y else None,
                    u32_tier=u32t,
                )
                parts.append(
                    jnp.concatenate(_split_bytes_list(s2lo, s2hi, P), axis=0)
                )
            a2 = jnp.concatenate(parts, axis=1)  # (PA, cs*B)
            return _DOT(w2m_ref[:], a2)  # rows (c, k1)

        def stage3(g, o2):
            d2 = [o2[c * A : (c + 1) * A, :] for c in range(P)]
            if _fold_ok(P, b2, sol):
                yf = _planes_to_y(d2, plan.bias_i2, b2, sol)
                v2l = v2h = None
            else:
                yf = None
                v2l, v2h = _recombine_bytes(d2, plan.bias_i2, b2[2])
            rows = slice(g * cs * A, (g + 1) * cs * A)
            los, his = [], []
            for p in range(cs):
                lanes = slice(p * B, (p + 1) * B)
                rlo, rhi = _finish8(
                    q, sol, shoup, narrow,
                    None if yf else (v2l[0][:, lanes], v2l[1][:, lanes]),
                    None if yf else (v2h[0][:, lanes], v2h[1][:, lanes]),
                    c2, b2, out_factor, qc,
                    y=(yf[0][:, lanes], yf[1][:, lanes]) if yf else None,
                    u32_tier=u32t,
                )
                los.append(rlo)
                his.append(rhi)
            olo_ref[rows, :] = jnp.concatenate(los, axis=0)
            ohi_ref[rows, :] = jnp.concatenate(his, axis=0)

        o1s = [stage1(g) for g in range(chunks)]
        o2s = [stage2(g, o1) for g, o1 in enumerate(o1s)]
        for g, o2 in enumerate(o2s):
            stage3(g, o2)

    return kernel


def _make_rt_kernel8(plan: Mxu8NttPlan64, out_factor: int, tile: int):
    """Fused round trip: forward -> pointwise key multiply -> inverse in
    one kernel (the negacyclic multiply-by-fixed-operand,
    crates/primus_lattice/src/rlwe/coeff.rs:114-116)."""
    q, A, B, P = plan.q, plan.A, plan.B, plan.planes
    u32t = P == 4
    sol = _mxu8_solinas(q)
    shoup = _make_shoup_lazy64(q, exact=False)
    narrow = _make_shoup_narrow64(q)
    cs, chunks = _chunking(tile, A)
    bf1 = _u_bounds(plan.bias_f1, P)
    bf2 = _u_bounds(plan.bias_f2, P)
    bi1 = _u_bounds(plan.bias_i1, P)
    bi2 = _u_bounds(plan.bias_i2, P)
    ntab = _n_twid(sol) + 4  # per direction: twiddle group + 2 corr pairs

    def kernel(w1_ref, w2_ref, w1m_ref, w2m_ref, *rest):
        ft8, ft32, fct, cf1_t, cf2_t, _ = _unpack_tabs(rest[:ntab], sol)
        it8, it32, ict, ci1_t, ci2_t, _ = _unpack_tabs(
            rest[ntab : 2 * ntab], sol
        )
        mul_refs = rest[2 * ntab : 2 * ntab + 8]
        vlo_ref, vhi_ref, olo_ref, ohi_ref = rest[2 * ntab + 8 : 2 * ntab + 12]
        qc = _const64(q)
        cf2 = (cf2_t[0][:], cf2_t[1][:])
        ci1 = (ci1_t[0][:], ci1_t[1][:])
        ci2 = (ci2_t[0][:], ci2_t[1][:])  # (A, B), applied per poly block

        # Staged phases (one list entry per chunk): each phase's VPU tail
        # for chunk g is program-order adjacent to chunk g+1's MXU dot, so
        # Mosaic can co-issue vector work under the systolic-array pushes
        # (a ~30% wall win over the strictly sequential per-chunk order).
        # Twiddle/correction/key tables are untiled (A, B) applied per
        # poly block — one VMEM copy regardless of tile.
        def fwd_dot1(g):
            parts = []
            for p in range(g * cs, (g + 1) * cs):
                sl = vlo_ref[p * A : (p + 1) * A, :]
                sh = vhi_ref[p * A : (p + 1) * A, :]
                parts.append(
                    jnp.concatenate(_split_bytes_list(sl, sh, P), axis=0)
                )
            x8 = jnp.concatenate(parts, axis=1)
            return _DOT(w1_ref[:], x8)

        def fwd_dot2(g, o1):
            digs = [o1[c * A : (c + 1) * A, :] for c in range(P)]
            if _fold_ok(P, bf1, sol):
                y = _planes_to_y(digs, plan.bias_f1, bf1, sol)
                v_lo = v_hi = None
            else:
                y = None
                v_lo, v_hi = _recombine_bytes(digs, plan.bias_f1, bf1[2])
            t_t = [r[:] for r in ft8]
            t32 = [r[:] for r in ft32]
            ct = [r[:] for r in fct]
            cf1 = (cf1_t[0][:], cf1_t[1][:])
            parts = []
            for p in range(cs):
                lanes = slice(p * B, (p + 1) * B)
                s2lo, s2hi = _twiddle8(
                    q, sol, shoup, narrow,
                    None if y else (v_lo[0][:, lanes], v_lo[1][:, lanes]),
                    None if y else (v_hi[0][:, lanes], v_hi[1][:, lanes]),
                    cf1, t_t, t32, ct, qc, bf1[1], bounds=bf1,
                    y=(y[0][:, lanes], y[1][:, lanes]) if y else None,
                    u32_tier=u32t,
                )
                parts.append(
                    jnp.concatenate(_split_bytes_list(s2lo, s2hi, P), axis=1)
                )
            a2 = jnp.concatenate(parts, axis=0)
            return _DOT(a2, w2_ref[:])

        def inv_dot1(g, o2):
            d2 = [o2[:, c * B : (c + 1) * B] for c in range(P)]
            if _fold_ok(P, bf2, sol):
                yf = _planes_to_y(d2, plan.bias_f2, bf2, sol)
                v2l = v2h = None
            else:
                yf = None
                v2l, v2h = _recombine_bytes(d2, plan.bias_f2, bf2[2])
            m_t = [r[:] for r in mul_refs]  # (A, B) per poly block
            parts = []
            for p in range(cs):
                rows = slice(p * A, (p + 1) * A)
                # Lazy NTT-domain value feeds the key multiply directly.
                # The Shoup multiply accepts any u64 operand, so for
                # Solinas q the mod-q representative from one fold
                # (< 2^51 for the 50-bit tier) skips the _solinas_down
                # ladder the standalone forward kernel needs for its
                # [0,4q) contract.
                if sol:
                    yb = (
                        (yf[0][rows, :], yf[1][rows, :])
                        if yf
                        else _fold32(
                            (v2l[0][rows, :], v2l[1][rows, :]),
                            (v2h[0][rows, :], v2h[1][rows, :]),
                            sol, bf2[1],
                        )
                    )
                    flo, fhi = _add64(*yb, *cf2)
                else:
                    flo, fhi = _finish8(
                        q, sol, shoup, narrow,
                        (v2l[0][rows, :], v2l[1][rows, :]),
                        (v2h[0][rows, :], v2h[1][rows, :]),
                        cf2, bf2, 4, qc, u32_tier=u32t,
                    )
                vlo, vhi = shoup(flo, fhi, *m_t, *qc)  # * key, < 4q
                parts.append(
                    jnp.concatenate(_split_bytes_list(vlo, vhi, P), axis=1)
                )
            x8 = jnp.concatenate(parts, axis=0)
            return _DOT(x8, w1m_ref[:])

        def inv_dot2(g, o1):
            digs = [o1[:, c * B : (c + 1) * B] for c in range(P)]
            if _fold_ok(P, bi1, sol):
                y = _planes_to_y(digs, plan.bias_i1, bi1, sol)
                v_lo = v_hi = None
            else:
                y = None
                v_lo, v_hi = _recombine_bytes(digs, plan.bias_i1, bi1[2])
            t_t = [r[:] for r in it8]
            t32 = [r[:] for r in it32]
            ct = [r[:] for r in ict]
            parts = []
            for p in range(cs):
                rows = slice(p * A, (p + 1) * A)
                s2lo, s2hi = _twiddle8(
                    q, sol, shoup, narrow,
                    None if y else (v_lo[0][rows, :], v_lo[1][rows, :]),
                    None if y else (v_hi[0][rows, :], v_hi[1][rows, :]),
                    ci1, t_t, t32, ct, qc, bi1[1], bounds=bi1,
                    y=(y[0][rows, :], y[1][rows, :]) if y else None,
                    u32_tier=u32t,
                )
                parts.append(
                    jnp.concatenate(_split_bytes_list(s2lo, s2hi, P), axis=0)
                )
            a2 = jnp.concatenate(parts, axis=1)
            return _DOT(w2m_ref[:], a2)

        def finish_chunk(g, o2):
            d2 = [o2[c * A : (c + 1) * A, :] for c in range(P)]
            if _fold_ok(P, bi2, sol):
                yf = _planes_to_y(d2, plan.bias_i2, bi2, sol)
                v2l = v2h = None
            else:
                yf = None
                v2l, v2h = _recombine_bytes(d2, plan.bias_i2, bi2[2])
            rows = slice(g * cs * A, (g + 1) * cs * A)
            los, his = [], []
            for p in range(cs):
                lanes = slice(p * B, (p + 1) * B)
                rlo, rhi = _finish8(
                    q, sol, shoup, narrow,
                    None if yf else (v2l[0][:, lanes], v2l[1][:, lanes]),
                    None if yf else (v2h[0][:, lanes], v2h[1][:, lanes]),
                    ci2, bi2, out_factor, qc,
                    y=(yf[0][:, lanes], yf[1][:, lanes]) if yf else None,
                    u32_tier=u32t,
                )
                los.append(rlo)
                his.append(rhi)
            olo_ref[rows, :] = jnp.concatenate(los, axis=0)
            ohi_ref[rows, :] = jnp.concatenate(his, axis=0)

        o1s = [fwd_dot1(g) for g in range(chunks)]
        o2s = [fwd_dot2(g, o) for g, o in enumerate(o1s)]
        i1s = [inv_dot1(g, o) for g, o in enumerate(o2s)]
        i2s = [inv_dot2(g, o) for g, o in enumerate(i1s)]
        for g, o in enumerate(i2s):
            finish_chunk(g, o)

    return kernel


# ---------------------------------------------------------------------------
# Entry points
# ---------------------------------------------------------------------------


def _check_in(plan, values, what):
    if plan.planes < 8:
        check_range_u64(values, 1 << (8 * plan.planes), 1, what)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def mxu8_fused_forward64(
    plan: Mxu8NttPlan64, values: U64, out_factor: int = 1, tile: int = 16
) -> U64:
    """Byte-radix fused MXU forward NTT; contract of
    :func:`transforms.ntt.forward64` (input any u64 < 2^56 for the
    7-plane tier, any u64 for the 8-plane tier; bit-reversed output in
    ``[0, out_factor*q)``)."""
    _check_in(plan, values, "mxu8_fused_forward64 input")
    n, A, B = plan.n, plan.A, plan.B
    vlo, vhi, batch_shape, b, bp, tile = _pad_batch(values, n, tile)
    kernel = _make_fwd_kernel8(plan, out_factor, tile)
    tabs = plan.tiled_tabs(tile)
    olo, ohi = _natural_call(
        kernel, len(tabs), A, B, plan.w1f, plan.w2f, tabs,
        vlo.reshape(bp * A, B), vhi.reshape(bp * A, B), bp, tile,
    )
    olo = olo.reshape(bp, n)[:b].reshape(*batch_shape, n)
    ohi = ohi.reshape(bp, n)[:b].reshape(*batch_shape, n)
    return U64(olo, ohi)


def _inv_common8(plan, values, out_factor, tile, mul_tabs):
    _check_in(plan, values, "mxu8 inverse input")
    n, A, B = plan.n, plan.Ai, plan.Bi
    vlo, vhi, batch_shape, b, bp, tile = _pad_batch(values, n, tile)
    tabs = plan.tiled_tabs_inv(tile) + tuple(mul_tabs)
    if mul_tabs and mul_tabs[0].shape != (A, B):
        raise ValueError(
            f"mul_tabs have shape {mul_tabs[0].shape}, kernel needs the "
            f"untiled {(A, B)}"
        )
    kernel = _make_inv_kernel8(plan, out_factor, tile, mul=bool(mul_tabs))
    olo, ohi = _natural_call(
        kernel, len(tabs), A, B, plan.w1mf, plan.w2mf, tabs,
        vlo.reshape(bp * A, B), vhi.reshape(bp * A, B), bp, tile,
    )
    olo = olo.reshape(bp, n)[:b].reshape(*batch_shape, n)
    ohi = ohi.reshape(bp, n)[:b].reshape(*batch_shape, n)
    return U64(olo, ohi)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def mxu8_fused_inverse64(
    plan: Mxu8NttPlan64, values: U64, out_factor: int = 1, tile: int = 16
) -> U64:
    """Byte-radix fused MXU inverse NTT (bit-reversed input, normal-order
    output, ``inv_n`` folded into the pass-2 matrix)."""
    return _inv_common8(plan, values, out_factor, tile, ())


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def mxu8_fused_inverse64_mul(
    plan: Mxu8NttPlan64, values: U64, mul_tabs, out_factor: int = 1,
    tile: int = 16,
) -> U64:
    """Fused pointwise-multiply + inverse NTT (``INTT(values * key)``)."""
    return _inv_common8(plan, values, out_factor, tile, tuple(mul_tabs))


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def mxu8_fused_roundtrip64_mul(
    plan: Mxu8NttPlan64, values: U64, mul_tabs, out_factor: int = 1,
    tile: int = 8,
) -> U64:
    """``INTT(NTT(values) * key)`` — the negacyclic product by a fixed
    NTT-domain operand (crates/primus_lattice/src/rlwe/coeff.rs:114-116)
    — as ONE fused byte-radix kernel (bit-identical to
    :func:`mxu8_fused_forward64` + :func:`mxu8_fused_inverse64_mul`)."""
    _check_in(plan, values, "mxu8_fused_roundtrip64_mul input")
    n, A, B = plan.n, plan.A, plan.B
    vlo, vhi, batch_shape, b, bp, tile = _pad_batch(values, n, tile)
    tabs = plan.tiled_tabs(tile) + plan.tiled_tabs_inv(tile) + tuple(mul_tabs)
    if mul_tabs and mul_tabs[0].shape != (A, B):
        raise ValueError(
            f"mul_tabs have shape {mul_tabs[0].shape}, kernel needs the "
            f"untiled {(A, B)}"
        )
    kernel = _make_rt_kernel8(plan, out_factor, tile)
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
