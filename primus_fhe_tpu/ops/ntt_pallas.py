"""Fused negacyclic NTT kernels (Pallas, TPU).

Replaces the reference's AVX-512 stage kernels
(``crates/primus_ntt/src/ntt/prime64/avx512/{stages,transform}.rs``) with a
single VMEM-resident kernel: all ``log n`` butterfly stages execute on a
polynomial batch tile without touching HBM in between — the XLA-staged jnp
path streams every stage through HBM, which is exactly the bandwidth wall
this kernel removes.

Design:
- **Uniform stage formulation.** Every stage is a lane/sublane ``roll`` by
  ``±t`` plus a mask select — no reshapes.  For element position ``p`` in a
  stage with half-block ``t``: ``is_x = (p & t) == 0``; the butterfly pair
  is ``(v[p], v[p+t])``.  The HEXL T8/T4/T2/T1 register layouts collapse
  into this one pattern.
- **Pre-expanded per-lane root tables** ``(log n, n)``: stage ``s`` uses
  ``roots[m + p // (2t)]`` at every position — expanded host-side once per
  plan (the Pallas analogue of the reference's pre-expanded AVX tables,
  ``table.rs:91-103``), so the kernel does zero gathers.
- Lazy-range discipline identical to the scalar reference: values stay in
  ``[0, 4q)``; one ``reduce_twice`` at the end when a canonical output is
  requested.

The modulus is a Python-int closure constant: one compiled kernel per
(modulus, n, batch-tile), cached by jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..golden.model import GoldenNtt
from ..utils.contracts import check_range_u32, check_range_u64
from ..numeric.limb import U64, to_u64_pair

_U32 = jnp.uint32


# ---------------------------------------------------------------------------
# Host-side plan with per-lane expanded tables
# ---------------------------------------------------------------------------


class PallasNttPlan64:
    """Expanded root tables for the fused u64 NTT kernel."""

    def __init__(self, log_n: int, q: int, root: int | None = None):
        if log_n > 15:
            # expanded per-lane tables are (log_n, n) x 4 u32 arrays; above
            # n = 2^15 they exceed VMEM — use the four-step composition
            # (transforms.ntt_large) or the XLA-staged transforms.
            raise ValueError("PallasNttPlan64 supports n <= 2^15 (table VMEM)")
        self.log_n = log_n
        self.n = n = 1 << log_n
        self.q = q
        g = GoldenNtt(log_n, q, root=root)

        def quot64(w):
            return ((w << 64) // q) & 0xFFFFFFFFFFFFFFFF

        # forward: stage s has m = 2^s blocks, t = n >> (s+1);
        # position p uses roots[m + p // (2t)].
        fwd_w = np.zeros((log_n, n), dtype=np.uint64)
        fwd_p = np.zeros((log_n, n), dtype=np.uint64)
        p_idx = np.arange(n)
        for s in range(log_n):
            m = 1 << s
            t = n >> (s + 1)
            idx = m + p_idx // (2 * t)
            fwd_w[s] = [g.roots[i] for i in idx]
            fwd_p[s] = [quot64(g.roots[i]) for i in idx]

        # inverse: stage s has t = 2^s, m = n >> (s+1); roots are consumed
        # sequentially starting at 1 + n - (n >> s); block j uses
        # inv_roots[start + j], j = p // (2t).  Final stage uses inv_n and
        # inv_n_w on the two halves.
        inv_w = np.zeros((log_n, n), dtype=np.uint64)
        inv_p = np.zeros((log_n, n), dtype=np.uint64)
        for s in range(log_n - 1):
            t = 1 << s
            start = 1 + n - (n >> s)
            idx = start + p_idx // (2 * t)
            inv_w[s] = [g.inv_roots[i] for i in idx]
            inv_p[s] = [quot64(g.inv_roots[i]) for i in idx]
        # final fused stage: x half gets inv_n, y half gets inv_n_w
        inv_w[log_n - 1, : n // 2] = g.inv_n
        inv_w[log_n - 1, n // 2 :] = g.inv_n_w
        inv_p[log_n - 1, : n // 2] = quot64(g.inv_n)
        inv_p[log_n - 1, n // 2 :] = quot64(g.inv_n_w)

        self.fwd_w = to_u64_pair(fwd_w)
        self.fwd_p = to_u64_pair(fwd_p)
        self.inv_w = to_u64_pair(inv_w)
        self.inv_p = to_u64_pair(inv_p)

        # Pre-split 16-bit limb tables (the kernel's Shoup multiply consumes
        # w and precon as 16-bit limbs; extracting them host-side once saves
        # six vector ops per element per stage — the Pallas analogue of the
        # reference's pre-expanded AVX tables, table.rs:91-103).
        def split_tabs(w, p):
            wpair = to_u64_pair(w)
            ppair = to_u64_pair(p)
            return (
                wpair.lo,
                wpair.hi,
                wpair.lo & 0xFFFF,
                wpair.lo >> 16,
                ppair.lo & 0xFFFF,
                ppair.lo >> 16,
                ppair.hi & 0xFFFF,
                ppair.hi >> 16,
            )

        self.fwd_tabs = split_tabs(fwd_w, fwd_p)
        self.inv_tabs = split_tabs(inv_w, inv_p)


# ---------------------------------------------------------------------------
# In-kernel u64 helpers (lo/hi uint32 pairs as separate arrays)
# ---------------------------------------------------------------------------


def _mul_wide_u32(a, b):
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    ll = a0 * b0
    m1 = a1 * b0 + (ll >> 16)
    m2 = a0 * b1 + (m1 & 0xFFFF)
    hi = a1 * b1 + (m1 >> 16) + (m2 >> 16)
    return a * b, hi


def _mul_lo64(alo, ahi, blo, bhi):
    lo, hi = _mul_wide_u32(alo, blo)
    return lo, hi + alo * bhi + ahi * blo


def _mul_wide_limbs(a, a0, a1, b, b0, b1):
    """``mul_wide_u32`` with caller-hoisted 16-bit limbs (shared across the
    four cross products of a 64x64 multiply)."""
    ll = a0 * b0
    m1 = a1 * b0 + (ll >> 16)
    m2 = a0 * b1 + (m1 & 0xFFFF)
    hi = a1 * b1 + (m1 >> 16) + (m2 >> 16)
    return a * b, hi


def _mul_hi64(alo, ahi, blo, bhi):
    a0 = alo & 0xFFFF
    a1 = alo >> 16
    a2 = ahi & 0xFFFF
    a3 = ahi >> 16
    b0 = blo & 0xFFFF
    b1 = blo >> 16
    b2 = bhi & 0xFFFF
    b3 = bhi >> 16
    l00, h00 = _mul_wide_limbs(alo, a0, a1, blo, b0, b1)
    l01, h01 = _mul_wide_limbs(alo, a0, a1, bhi, b2, b3)
    l10, h10 = _mul_wide_limbs(ahi, a2, a3, blo, b0, b1)
    l11, h11 = _mul_wide_limbs(ahi, a2, a3, bhi, b2, b3)
    s1 = h00 + l01
    c1 = (s1 < h00).astype(_U32)
    r1 = s1 + l10
    c1 = c1 + (r1 < s1).astype(_U32)
    s2 = h01 + h10
    c2 = (s2 < h01).astype(_U32)
    s2b = s2 + l11
    c2 = c2 + (s2b < s2).astype(_U32)
    r2 = s2b + c1
    c2 = c2 + (r2 < s2b).astype(_U32)
    r3 = h11 + c2
    return r2, r3


def _add64(alo, ahi, blo, bhi):
    lo = alo + blo
    return lo, ahi + bhi + (lo < alo).astype(_U32)


def _sub64(alo, ahi, blo, bhi):
    lo = alo - blo
    return lo, ahi - bhi - (alo < blo).astype(_U32)


def _lt64(alo, ahi, blo, bhi):
    return (ahi < bhi) | ((ahi == bhi) & (alo < blo))


def _min64(alo, ahi, blo, bhi):
    take = _lt64(alo, ahi, blo, bhi)
    return jnp.where(take, alo, blo), jnp.where(take, ahi, bhi)


def _solinas_form(q: int):
    """Returns ``(a, b)`` if ``q == 2^a - 2^b + 1`` (the common NTT-prime
    shape, e.g. both reference bench primes), else ``None``.  Such q admit
    a multiply-free ``q * x mod 2^64``: ``(x<<a) - (x<<b) + x``."""
    a = q.bit_length()
    rest = (1 << a) - q + 1
    if rest > 0 and rest & (rest - 1) == 0:
        b = rest.bit_length() - 1
        if 1 <= b < a < 64 and (1 << a) - (1 << b) + 1 == q:
            return a, b
    return None


def _shl64(xlo, xhi, k: int):
    """``x << k mod 2^64`` on (lo, hi) u32 pairs; static k in [0, 64)."""
    if k == 0:
        return xlo, xhi
    if k < 32:
        return xlo << k, (xhi << k) | (xlo >> (32 - k))
    if k == 32:
        return jnp.zeros_like(xlo), xlo
    return jnp.zeros_like(xlo), xlo << (k - 32)


def _hi_limbs(a, a0, a1, b0, b1):
    """hi32 of ``a (u32) * b (u32)`` from pre-split 16-bit limbs; the full
    ``b`` word is never needed (only its limbs)."""
    m1 = a1 * b0 + ((a0 * b0) >> 16)
    m2 = a0 * b1 + (m1 & 0xFFFF)
    return a1 * b1 + (m1 >> 16) + (m2 >> 16)


def _make_shoup_lazy64(q: int, exact: bool = True):
    """Builds the lazy Shoup multiply ``w*y - q*hi(precon*y)``.

    The 16-bit limbs of ``y`` are extracted once and shared between the
    ``precon*y`` hi-product and the ``w*y`` lo-product; the w/precon limbs
    arrive pre-split from the plan tables.  When q is a Solinas prime
    ``2^a - 2^b + 1`` (both reference bench primes are), ``q * q_hat mod
    2^64`` becomes shifts+adds — the integer analogue of HEXL's
    special-prime path.

    ``exact=False`` drops the low cross-product and its carry chain from
    the quotient (q_hat may be under by <= 2, so the result lands in
    ``[0, 4q)`` instead of ``[0, 2q)``) — only valid when the caller's
    range accounting absorbs the wider output (the deferred-reduction
    kernels do)."""
    sol = _solinas_form(q)

    def shoup(ylo, yhi, wlo, whi, w0, w1, p0, p1, p2, p3, qlo, qhi):
        y0 = ylo & 0xFFFF
        y1 = ylo >> 16
        y2 = yhi & 0xFFFF
        y3 = yhi >> 16
        # hi64(y * precon): exact keeps the [2^32] column carry; approx
        # drops product 00 and the column-32 carries entirely.
        h01 = _hi_limbs(ylo, y0, y1, p2, p3)
        h10 = _hi_limbs(yhi, y2, y3, p0, p1)
        l11 = yhi * (p2 | (p3 << 16))
        h11 = _hi_limbs(yhi, y2, y3, p2, p3)
        s2 = h01 + h10
        c2 = (s2 < h01).astype(_U32)
        s2b = s2 + l11
        c2 = c2 + (s2b < s2).astype(_U32)
        if exact:
            h00 = _hi_limbs(ylo, y0, y1, p0, p1)
            l01 = ylo * (p2 | (p3 << 16))
            l10 = yhi * (p0 | (p1 << 16))
            s1 = h00 + l01
            c1 = (s1 < h00).astype(_U32)
            r1 = s1 + l10
            c1 = c1 + (r1 < s1).astype(_U32)
            hlo = s2b + c1
            c2 = c2 + (hlo < s2b).astype(_U32)
        else:
            hlo = s2b
        hhi = h11 + c2
        # lo64(w * y), reusing y limbs
        wy_lo = wlo * ylo
        wy_hi0 = _hi_limbs(wlo, w0, w1, y0, y1)
        wy_hi = wy_hi0 + wlo * yhi + whi * ylo
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


def _reduce_once64(xlo, xhi, qlo, qhi):
    slo, shi = _sub64(xlo, xhi, qlo, qhi)
    return _min64(xlo, xhi, slo, shi)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _const64(value: int):
    return (
        jnp.full((1, 1), np.uint32(value & 0xFFFFFFFF), _U32),
        jnp.full((1, 1), np.uint32((value >> 32) & 0xFFFFFFFF), _U32),
    )


def _reduce_chain64(vlo, vhi, q: int, bound: int, target: int):
    """Conditional-subtract chain taking values < ``bound*q`` down to
    ``< target*q`` (both power-of-two unit counts)."""
    cp = 1 << (bound - 1).bit_length()
    while cp > target:
        cp //= 2
        klo, khi = _const64(cp * q)
        vlo, vhi = _reduce_once64(vlo, vhi, klo, khi)
    return vlo, vhi


def _make_fwd_kernel(log_n: int, q: int, out_factor: int):
    n = 1 << log_n
    # Deferred lazy ranges: the Shoup quotient estimate is valid for ANY
    # y < 2^64, and each butterfly adds at most 4q (approximate-quotient
    # multiply, m < 4q), so the per-stage reduce_once is unnecessary while
    # (4 + 4*stages)*q < 2^64 — one conditional-subtract chain at the end
    # restores the [0,4q) contract.
    defer = (4 + 4 * log_n) * q < (1 << 64)
    _shoup = _make_shoup_lazy64(q, exact=not defer)

    def kernel(
        wlo_ref, whi_ref, w0_ref, w1_ref, p0_ref, p1_ref, p2_ref, p3_ref,
        vlo_ref, vhi_ref, olo_ref, ohi_ref,
    ):
        vlo = vlo_ref[:]
        vhi = vhi_ref[:]
        iota = jax.lax.broadcasted_iota(_U32, (1, n), 1)
        qlo, qhi = _const64(q)
        tqlo, tqhi = _const64(2 * q)
        # m < 4q in approximate (deferred) mode, < 2q in exact mode.
        mqlo, mqhi = _const64(4 * q if defer else 2 * q)
        for s in range(log_n):
            t = n >> (s + 1)
            is_x = (iota & t) == 0
            tabs = tuple(
                r[s, :][None]
                for r in (w0_ref, w1_ref, p0_ref, p1_ref, p2_ref, p3_ref)
            )
            wlo = wlo_ref[s, :][None]
            whi = whi_ref[s, :][None]
            # Compute the whole butterfly at the x lanes (the per-lane root
            # table repeats the pair's root at both lanes), then roll the
            # y' outputs into place — halves the selects per stage.
            ylo = pltpu.roll(vlo, n - t, 1)  # v[p+t] seen from lane p
            yhi = pltpu.roll(vhi, n - t, 1)
            if defer:
                txlo, txhi = vlo, vhi
            else:
                txlo, txhi = _reduce_once64(vlo, vhi, tqlo, tqhi)
            mlo, mhi = _shoup(ylo, yhi, wlo, whi, *tabs, qlo, qhi)
            alo, ahi = _add64(txlo, txhi, mlo, mhi)  # x' = tx + m
            s1lo, s1hi = _sub64(mqlo, mqhi, mlo, mhi)  # (2q|4q) - m > 0
            blo, bhi = _add64(txlo, txhi, s1lo, s1hi)  # y' = tx + kq - m
            vlo = jnp.where(is_x, alo, pltpu.roll(blo, t, 1))
            vhi = jnp.where(is_x, ahi, pltpu.roll(bhi, t, 1))
        if defer:
            vlo, vhi = _reduce_chain64(vlo, vhi, q, 4 + 4 * log_n, 4)
        if out_factor == 2:
            vlo, vhi = _reduce_once64(vlo, vhi, tqlo, tqhi)
        if out_factor == 1:
            vlo, vhi = _reduce_once64(vlo, vhi, tqlo, tqhi)
            vlo, vhi = _reduce_once64(vlo, vhi, qlo, qhi)
        olo_ref[:] = vlo
        ohi_ref[:] = vhi

    return kernel


def _make_inv_kernel(log_n: int, q: int, out_factor: int, in_factor: int = 2):
    n = 1 << log_n
    # Approximate-quotient multiply: y' lanes reset to < 4q; x' = x + y
    # doubles the bound each stage.  Reduce with a conditional-subtract
    # chain only when the next stage would overflow 2^64 — for 50-bit q
    # and n <= 2^12 that is never.
    _shoup = _make_shoup_lazy64(q, exact=False)
    limit = 1 << 64

    def kernel(
        wlo_ref, whi_ref, w0_ref, w1_ref, p0_ref, p1_ref, p2_ref, p3_ref,
        vlo_ref, vhi_ref, olo_ref, ohi_ref,
    ):
        vlo = vlo_ref[:]
        vhi = vhi_ref[:]
        iota = jax.lax.broadcasted_iota(_U32, (1, n), 1)
        qlo, qhi = _const64(q)
        tqlo, tqhi = _const64(2 * q)
        c = in_factor  # current uniform bound, in units of q (input contract)
        for s in range(log_n):
            last = s == log_n - 1
            t = (1 << s) if not last else (n >> 1)
            is_x = (iota & t) == 0
            tabs = tuple(
                r[s, :][None]
                for r in (w0_ref, w1_ref, p0_ref, p1_ref, p2_ref, p3_ref)
            )
            wlo = wlo_ref[s, :][None]
            whi = whi_ref[s, :][None]
            if 2 * c * q >= limit:
                vlo, vhi = _reduce_chain64(vlo, vhi, q, c, 2)
                c = 2
            # x-lane formulation: y = v[p+t] via one roll; y' rolls back.
            ylo = pltpu.roll(vlo, n - t, 1)
            yhi = pltpu.roll(vhi, n - t, 1)
            slo, shi = _add64(vlo, vhi, ylo, yhi)  # x' raw, < 2c*q
            cqlo, cqhi = _const64(c * q)
            d1lo, d1hi = _add64(vlo, vhi, cqlo, cqhi)
            dlo, dhi = _sub64(d1lo, d1hi, ylo, yhi)  # x + cq - y >= 0
            if last:
                # final fused stage: x half * inv_n, y half * inv_n_w.  The
                # per-lane table differs between halves, so select the
                # shoup input per half (both operands live at x lanes of
                # their own half: roll d into the y half first).
                inlo = jnp.where(is_x, slo, pltpu.roll(dlo, t, 1))
                inhi = jnp.where(is_x, shi, pltpu.roll(dhi, t, 1))
                vlo, vhi = _shoup(inlo, inhi, wlo, whi, *tabs, qlo, qhi)
                c = 4
            else:
                mlo, mhi = _shoup(dlo, dhi, wlo, whi, *tabs, qlo, qhi)
                vlo = jnp.where(is_x, slo, pltpu.roll(mlo, t, 1))
                vhi = jnp.where(is_x, shi, pltpu.roll(mhi, t, 1))
                c = max(2 * c, 4)
        # approximate multiply leaves the final stage < 4q; restore the
        # [0,2q) lazy contract, then canonical if requested.
        if out_factor <= 2:
            vlo, vhi = _reduce_once64(vlo, vhi, tqlo, tqhi)
        if out_factor == 1:
            vlo, vhi = _reduce_once64(vlo, vhi, qlo, qhi)
        olo_ref[:] = vlo
        ohi_ref[:] = vhi

    return kernel


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------


def _call(plan: PallasNttPlan64, values: U64, kernel, tables, tile: int):
    n = plan.n
    vlo, vhi = values.lo, values.hi
    batch_shape = vlo.shape[:-1]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    vlo2 = vlo.reshape(b, n)
    vhi2 = vhi.reshape(b, n)
    tile = min(tile, b)
    pad = (-b) % tile
    if pad:
        # pad to a tile multiple: a tile=1 fallback trips a Mosaic lowering
        # bug on TPU and tiny tiles waste sublanes anyway.
        vlo2 = jnp.concatenate([vlo2, jnp.zeros((pad, n), jnp.uint32)])
        vhi2 = jnp.concatenate([vhi2, jnp.zeros((pad, n), jnp.uint32)])
    grid = ((b + pad) // tile,)
    table_spec = pl.BlockSpec((plan.log_n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    val_spec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[table_spec] * len(tables) + [val_spec] * 2,
        out_specs=[val_spec] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((b + pad, n), jnp.uint32),
            jax.ShapeDtypeStruct((b + pad, n), jnp.uint32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(*tables, vlo2, vhi2)
    return U64(
        out[0][:b].reshape(*batch_shape, n), out[1][:b].reshape(*batch_shape, n)
    )


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def pallas_forward64(plan: PallasNttPlan64, values: U64, out_factor: int = 1, tile: int = 8) -> U64:
    """Fused forward NTT; same contract as :func:`transforms.ntt.forward64`."""
    check_range_u64(values, plan.q, 4, "pallas_forward64 input")
    kernel = _make_fwd_kernel(plan.log_n, plan.q, out_factor)
    return _call(plan, values, kernel, plan.fwd_tabs, tile)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def pallas_inverse64(
    plan: PallasNttPlan64,
    values: U64,
    out_factor: int = 1,
    tile: int = 8,
    in_factor: int = 2,
) -> U64:
    """Fused inverse NTT; same contract as :func:`transforms.ntt.inverse64`.

    ``in_factor``: static bound on the input's lazy range (``< in_factor*q``)
    — the range-doubling accounting starts there, so callers feeding wider
    representatives (e.g. a forward's [0,4q) output) must say so."""
    check_range_u64(values, plan.q, in_factor, "pallas_inverse64 input")
    kernel = _make_inv_kernel(plan.log_n, plan.q, out_factor, in_factor)
    return _call(plan, values, kernel, plan.inv_tabs, tile)


# ---------------------------------------------------------------------------
# Partial-transform entry points (coeff-sharded local stages)
#
# A coefficient-sharded forward NTT (parallel/coeff_sharded.py) runs its
# first ``log2 D`` stages as ppermute exchanges; the remaining stages pair
# elements within one shard and are *exactly* a full width-``shard``
# forward transform over that shard's slice of the expanded per-lane
# tables (stage ``log2 D + s`` has ``t = shard >> (s+1)``, and for
# ``t < shard`` the pair mask/roll depend only on the local position).
# The inverse is mirrored: stages ``t = 1 .. shard/2`` are shard-local and
# run FIRST, all as regular butterflies (the fused ``inv_n`` final stage
# is a cross-shard exchange), so it needs the stages-only kernels below.
# ---------------------------------------------------------------------------


def _make_inv_stages_kernel32(log_w: int, q: int):
    """``log_w`` regular inverse stages (t = 1..2^(log_w-1)) over width
    ``2^log_w`` blocks; input/output lazy ``[0, 2q)``."""
    w_width = 1 << log_w
    qc = np.uint32(q)
    tqc = np.uint32(2 * q)

    def kernel(w_ref, p_ref, v_ref, o_ref):
        v = v_ref[:]
        iota = jax.lax.broadcasted_iota(_U32, (1, w_width), 1)
        for s in range(log_w):
            t = 1 << s
            is_x = (iota & t) == 0
            w = w_ref[s, :][None]
            wp = p_ref[s, :][None]
            r_m = pltpu.roll(v, w_width - t, 1)
            r_p = pltpu.roll(v, t, 1)
            x = jnp.where(is_x, v, r_p)
            y = jnp.where(is_x, r_m, v)
            sxy = x + y
            tx = jnp.where(sxy >= tqc, sxy - tqc, sxy)
            d = x + tqc - y
            mm = w * d - qc * _mulhi_u32(d, wp)
            v = jnp.where(is_x, tx, mm)
        o_ref[:] = v

    return kernel


def _make_inv_stages_kernel64(log_w: int, q: int, in_factor: int):
    """u64 variant of :func:`_make_inv_stages_kernel32`; output ``[0,2q)``."""
    w_width = 1 << log_w
    _shoup = _make_shoup_lazy64(q, exact=False)
    limit = 1 << 64

    def kernel(
        wlo_ref, whi_ref, w0_ref, w1_ref, p0_ref, p1_ref, p2_ref, p3_ref,
        vlo_ref, vhi_ref, olo_ref, ohi_ref,
    ):
        vlo = vlo_ref[:]
        vhi = vhi_ref[:]
        iota = jax.lax.broadcasted_iota(_U32, (1, w_width), 1)
        qlo, qhi = _const64(q)
        c = in_factor
        for s in range(log_w):
            t = 1 << s
            is_x = (iota & t) == 0
            tabs = tuple(
                r[s, :][None]
                for r in (w0_ref, w1_ref, p0_ref, p1_ref, p2_ref, p3_ref)
            )
            wlo = wlo_ref[s, :][None]
            whi = whi_ref[s, :][None]
            if 2 * c * q >= limit:
                vlo, vhi = _reduce_chain64(vlo, vhi, q, c, 2)
                c = 2
            ylo = pltpu.roll(vlo, w_width - t, 1)
            yhi = pltpu.roll(vhi, w_width - t, 1)
            slo, shi = _add64(vlo, vhi, ylo, yhi)
            cqlo, cqhi = _const64(c * q)
            d1lo, d1hi = _add64(vlo, vhi, cqlo, cqhi)
            dlo, dhi = _sub64(d1lo, d1hi, ylo, yhi)
            mlo, mhi = _shoup(dlo, dhi, wlo, whi, *tabs, qlo, qhi)
            vlo = jnp.where(is_x, slo, pltpu.roll(mlo, t, 1))
            vhi = jnp.where(is_x, shi, pltpu.roll(mhi, t, 1))
            c = max(2 * c, 4)
        vlo, vhi = _reduce_chain64(vlo, vhi, q, c, 2)
        olo_ref[:] = vlo
        ohi_ref[:] = vhi

    return kernel


def _stage_call32(kernel, log_w: int, w_loc, p_loc, v2, tile: int):
    w_width = 1 << log_w
    b = v2.shape[0]
    tile = min(tile, b)
    pad = (-b) % tile
    if pad:
        v2 = jnp.concatenate([v2, jnp.zeros((pad, w_width), jnp.uint32)])
    grid = ((b + pad) // tile,)
    table_spec = pl.BlockSpec((log_w, w_width), lambda i: (0, 0), memory_space=pltpu.VMEM)
    val_spec = pl.BlockSpec((tile, w_width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[table_spec] * 2 + [val_spec],
        out_specs=val_spec,
        out_shape=jax.ShapeDtypeStruct((b + pad, w_width), jnp.uint32),
        interpret=jax.default_backend() != "tpu",
    )(w_loc, p_loc, v2)
    return out[:b]


def pallas_stages_forward32(log_w, q, w_loc, p_loc, v2, out_factor=1, tile=16):
    """Final ``log_w`` forward stages over width-``2^log_w`` blocks with
    caller-supplied per-lane table slices ``(log_w, 2^log_w)``.  ``v2``:
    ``(batch, 2^log_w)`` u32 in ``[0, 4q)``."""
    return _stage_call32(
        _make_fwd_kernel32(log_w, q, out_factor), log_w, w_loc, p_loc, v2, tile
    )


def pallas_stages_inverse32(log_w, q, w_loc, p_loc, v2, tile=16):
    """First ``log_w`` inverse stages (all regular butterflies); output
    lazy ``[0, 2q)`` for the cross-shard exchange stages to consume."""
    return _stage_call32(
        _make_inv_stages_kernel32(log_w, q), log_w, w_loc, p_loc, v2, tile
    )


def _split_tabs64(w_loc: U64, p_loc: U64):
    return (
        w_loc.lo,
        w_loc.hi,
        w_loc.lo & 0xFFFF,
        w_loc.lo >> 16,
        p_loc.lo & 0xFFFF,
        p_loc.lo >> 16,
        p_loc.hi & 0xFFFF,
        p_loc.hi >> 16,
    )


def _stage_call64(kernel, log_w: int, tabs, vlo2, vhi2, tile: int):
    w_width = 1 << log_w
    b = vlo2.shape[0]
    tile = min(tile, b)
    pad = (-b) % tile
    if pad:
        vlo2 = jnp.concatenate([vlo2, jnp.zeros((pad, w_width), jnp.uint32)])
        vhi2 = jnp.concatenate([vhi2, jnp.zeros((pad, w_width), jnp.uint32)])
    grid = ((b + pad) // tile,)
    table_spec = pl.BlockSpec((log_w, w_width), lambda i: (0, 0), memory_space=pltpu.VMEM)
    val_spec = pl.BlockSpec((tile, w_width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[table_spec] * len(tabs) + [val_spec] * 2,
        out_specs=[val_spec] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((b + pad, w_width), jnp.uint32),
            jax.ShapeDtypeStruct((b + pad, w_width), jnp.uint32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(*tabs, vlo2, vhi2)
    return out[0][:b], out[1][:b]


def pallas_stages_forward64(log_w, q, w_loc: U64, p_loc: U64, vlo2, vhi2,
                            out_factor=1, tile=8):
    """u64 final-``log_w``-stage forward kernel; tables as U64 pairs
    ``(log_w, 2^log_w)``; values ``(batch, 2^log_w)`` lo/hi in ``[0,4q)``."""
    kernel = _make_fwd_kernel(log_w, q, out_factor)
    return _stage_call64(kernel, log_w, _split_tabs64(w_loc, p_loc), vlo2, vhi2, tile)


def pallas_stages_inverse64(log_w, q, w_loc: U64, p_loc: U64, vlo2, vhi2,
                            in_factor=2, tile=8):
    """u64 first-``log_w``-stage inverse kernel; output lazy ``[0, 2q)``."""
    kernel = _make_inv_stages_kernel64(log_w, q, in_factor)
    return _stage_call64(kernel, log_w, _split_tabs64(w_loc, p_loc), vlo2, vhi2, tile)


# ===========================================================================
# uint32 path (q < 2^30) — the torus-convolver / 30-bit-prime kernel
# ===========================================================================


class PallasNttPlan32:
    """Expanded root tables for the fused u32 NTT kernel (q < 2^30)."""

    def __init__(self, log_n: int, q: int):
        if q >= 1 << 30:
            raise ValueError("PallasNttPlan32 requires q < 2^30")
        self.log_n = log_n
        self.n = n = 1 << log_n
        self.q = q
        g = GoldenNtt(log_n, q)

        def quot32(w):
            return ((w << 32) // q) & 0xFFFFFFFF

        p_idx = np.arange(n)
        fwd_w = np.zeros((log_n, n), dtype=np.uint32)
        fwd_p = np.zeros((log_n, n), dtype=np.uint32)
        for s in range(log_n):
            m = 1 << s
            t = n >> (s + 1)
            idx = m + p_idx // (2 * t)
            fwd_w[s] = [g.roots[i] for i in idx]
            fwd_p[s] = [quot32(g.roots[i]) for i in idx]

        inv_w = np.zeros((log_n, n), dtype=np.uint32)
        inv_p = np.zeros((log_n, n), dtype=np.uint32)
        for s in range(log_n - 1):
            t = 1 << s
            start = 1 + n - (n >> s)
            idx = start + p_idx // (2 * t)
            inv_w[s] = [g.inv_roots[i] for i in idx]
            inv_p[s] = [quot32(g.inv_roots[i]) for i in idx]
        inv_w[log_n - 1, : n // 2] = g.inv_n
        inv_w[log_n - 1, n // 2 :] = g.inv_n_w
        inv_p[log_n - 1, : n // 2] = quot32(g.inv_n)
        inv_p[log_n - 1, n // 2 :] = quot32(g.inv_n_w)

        self.fwd_w = jnp.asarray(fwd_w)
        self.fwd_p = jnp.asarray(fwd_p)
        self.inv_w = jnp.asarray(inv_w)
        self.inv_p = jnp.asarray(inv_p)


def _mulhi_u32(a, b):
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    m1 = a1 * b0 + ((a0 * b0) >> 16)
    m2 = a0 * b1 + (m1 & 0xFFFF)
    return a1 * b1 + (m1 >> 16) + (m2 >> 16)


def _make_fwd_kernel32(log_n: int, q: int, out_factor: int):
    n = 1 << log_n
    qc = np.uint32(q)
    tqc = np.uint32(2 * q)

    def kernel(w_ref, p_ref, v_ref, o_ref):
        v = v_ref[:]
        iota = jax.lax.broadcasted_iota(_U32, (1, n), 1)
        for s in range(log_n):
            t = n >> (s + 1)
            is_x = (iota & t) == 0
            w = w_ref[s, :][None]
            wp = p_ref[s, :][None]
            # select formulation: measured faster than computing at x lanes
            # and rolling outputs into place (the output roll lands on the
            # critical path after the multiply).
            r_m = pltpu.roll(v, n - t, 1)  # v[p+t]
            r_p = pltpu.roll(v, t, 1)  # v[p-t]
            x = jnp.where(is_x, v, r_p)
            y = jnp.where(is_x, r_m, v)
            tx = jnp.where(x >= tqc, x - tqc, x)
            mm = w * y - qc * _mulhi_u32(y, wp)
            v = jnp.where(is_x, tx + mm, tx + tqc - mm)
        if out_factor == 1:
            v = jnp.where(v >= tqc, v - tqc, v)
            v = jnp.where(v >= qc, v - qc, v)
        o_ref[:] = v

    return kernel


def _make_inv_kernel32(log_n: int, q: int, out_factor: int):
    n = 1 << log_n
    qc = np.uint32(q)
    tqc = np.uint32(2 * q)

    def kernel(w_ref, p_ref, v_ref, o_ref):
        v = v_ref[:]
        iota = jax.lax.broadcasted_iota(_U32, (1, n), 1)
        for s in range(log_n - 1):
            t = 1 << s
            is_x = (iota & t) == 0
            w = w_ref[s, :][None]
            wp = p_ref[s, :][None]
            r_m = pltpu.roll(v, n - t, 1)
            r_p = pltpu.roll(v, t, 1)
            x = jnp.where(is_x, v, r_p)
            y = jnp.where(is_x, r_m, v)
            sxy = x + y
            tx = jnp.where(sxy >= tqc, sxy - tqc, sxy)
            d = x + tqc - y
            mm = w * d - qc * _mulhi_u32(d, wp)
            v = jnp.where(is_x, tx, mm)
        half = n >> 1
        s = log_n - 1
        is_x = (iota & half) == 0
        w = w_ref[s, :][None]
        wp = p_ref[s, :][None]
        r_m = pltpu.roll(v, n - half, 1)
        r_p = pltpu.roll(v, half, 1)
        x = jnp.where(is_x, v, r_p)
        y = jnp.where(is_x, r_m, v)
        sxy = x + y
        tx = jnp.where(sxy >= tqc, sxy - tqc, sxy)
        d = x + tqc - y
        inp = jnp.where(is_x, tx, d)
        v = w * inp - qc * _mulhi_u32(inp, wp)
        if out_factor == 1:
            v = jnp.where(v >= qc, v - qc, v)
        o_ref[:] = v

    return kernel


def _call32(plan, values, make_kernel, tables, out_factor, tile):
    n = plan.n
    batch_shape = values.shape[:-1]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    v2 = values.reshape(b, n)
    tile = min(tile, b)
    pad = (-b) % tile
    if pad:
        v2 = jnp.concatenate([v2, jnp.zeros((pad, n), jnp.uint32)])
    grid = ((b + pad) // tile,)
    w, p = tables
    table_spec = pl.BlockSpec((plan.log_n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    val_spec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = make_kernel(plan.log_n, plan.q, out_factor)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[table_spec] * 2 + [val_spec],
        out_specs=val_spec,
        out_shape=jax.ShapeDtypeStruct((b + pad, n), jnp.uint32),
        interpret=jax.default_backend() != "tpu",
    )(w, p, v2)
    return out[:b].reshape(*batch_shape, n)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def pallas_forward32(plan: PallasNttPlan32, values, out_factor: int = 1, tile: int = 16):
    """Fused forward NTT (u32); contract of :func:`transforms.ntt.forward32`."""
    check_range_u32(values, plan.q, 4, "pallas_forward32 input")
    return _call32(plan, values, _make_fwd_kernel32, (plan.fwd_w, plan.fwd_p), out_factor, tile)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def pallas_inverse32(plan: PallasNttPlan32, values, out_factor: int = 1, tile: int = 16):
    """Fused inverse NTT (u32); contract of :func:`transforms.ntt.inverse32`."""
    check_range_u32(values, plan.q, 2, "pallas_inverse32 input")
    return _call32(plan, values, _make_inv_kernel32, (plan.inv_w, plan.inv_p), out_factor, tile)
