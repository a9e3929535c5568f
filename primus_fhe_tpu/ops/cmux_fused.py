"""Fully fused CMux step — two Pallas kernels per blind-rotation step.

The previous pipeline issued five kernels per CMux (rotate/decompose/lift
front end, one forward NTT per prime, one inverse NTT per prime) plus an
XLA-staged MAC and CRT recombination.  Per-kernel launch and HBM
round-trips dominated (~4x over pure NTT cost).  This module collapses the
step to:

- **stage 1** (:func:`cmux_stage1`): rotate-diff -> signed decompose ->
  per-prime centered lift -> per-prime forward NTT, one VMEM pass over
  accumulator row tiles.  All per-prime constants (q, Barrett/Shoup data,
  root tables) are static: the python loop over (prime, level) unrolls at
  trace time with compile-time moduli, exactly like the single-prime
  kernels.
- **stage 2** (:func:`cmux_stage2`): gadget MAC against the GGSW rows ->
  per-prime inverse NTT -> all-integer CRT recombination -> accumulator
  add, one VMEM pass over batch tiles.

Semantics are identical to the composed path (`lattice.tfhe.cmux_delta` +
add): differential-tested bit-exactly in ``tests/test_cmux_fused.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cmux_pallas import _lift_mod_p, _mul_wide_u32, _mulhi_u32

_U32 = jnp.uint32


def _fit_tile(total: int, tile: int) -> int:
    """Largest divisor of ``total`` that is <= ``tile`` (host-side)."""
    tile = max(1, min(tile, total))
    while total % tile:
        tile -= 1
    return tile


# ---------------------------------------------------------------------------
# In-kernel single-prime NTT stage loops (static q, tables sliced per prime)
# ---------------------------------------------------------------------------


def _fwd_ntt_stages(v, w_ref, p_ref, row0: int, log_n: int, q: int, iota):
    """Forward NTT on ``(tile, n)`` with tables at rows ``row0..row0+log_n``.

    Input canonical ``[0, q)``; output lazy ``[0, 4q)`` bit-reversed.
    """
    n = 1 << log_n
    qc = np.uint32(q)
    tqc = np.uint32(2 * q)
    for s in range(log_n):
        t = n >> (s + 1)
        is_x = (iota & t) == 0
        w = w_ref[row0 + s, :][None]
        wp = p_ref[row0 + s, :][None]
        r_m = pltpu.roll(v, n - t, 1)
        r_p = pltpu.roll(v, t, 1)
        x = jnp.where(is_x, v, r_p)
        y = jnp.where(is_x, r_m, v)
        tx = jnp.where(x >= tqc, x - tqc, x)
        mm = w * y - qc * _mulhi_u32(y, wp)
        v = jnp.where(is_x, tx + mm, tx + tqc - mm)
    return v


def _inv_ntt_stages(v, w_ref, p_ref, row0: int, log_n: int, q: int, iota):
    """Inverse NTT on ``(tile, n)``: bit-reversed ``[0, 2q)`` in, canonical out."""
    n = 1 << log_n
    qc = np.uint32(q)
    tqc = np.uint32(2 * q)
    for s in range(log_n - 1):
        t = 1 << s
        is_x = (iota & t) == 0
        w = w_ref[row0 + s, :][None]
        wp = p_ref[row0 + s, :][None]
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
    w = w_ref[row0 + s, :][None]
    wp = p_ref[row0 + s, :][None]
    r_m = pltpu.roll(v, n - half, 1)
    r_p = pltpu.roll(v, half, 1)
    x = jnp.where(is_x, v, r_p)
    y = jnp.where(is_x, r_m, v)
    sxy = x + y
    tx = jnp.where(sxy >= tqc, sxy - tqc, sxy)
    d = x + tqc - y
    inp = jnp.where(is_x, tx, d)
    v = w * inp - qc * _mulhi_u32(inp, wp)
    return jnp.where(v >= qc, v - qc, v)  # canonical


def _barrett_lazy_wide(lo, hi, q: int):
    """``hi*2^32 + lo mod q`` in [0, 2q) with static Barrett constants."""
    ratio = ((1 << 64) // q) & 0xFFFFFFFFFFFFFFFF
    r0 = np.uint32(ratio & 0xFFFFFFFF)
    r1 = np.uint32(ratio >> 32)
    ah = _mulhi_u32(lo, r0)
    b_lo, b_hi = _mul_wide_u32(lo, r1)
    b_lo2 = b_lo + ah
    b_hi = b_hi + (b_lo2 < b_lo).astype(_U32)
    c_lo, c_hi = _mul_wide_u32(hi, r0)
    d = hi * r1
    s = b_lo2 + c_lo
    carry = (s < b_lo2).astype(_U32)
    q_hat = d + b_hi + c_hi + carry
    return lo - q_hat * np.uint32(q)


def _lazy_mul_q(a, b, q: int):
    lo, hi = _mul_wide_u32(a, b)
    return _barrett_lazy_wide(lo, hi, q)


# ---------------------------------------------------------------------------
# Stage 1: rotate-diff + decompose + lift + forward NTT (all primes)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("basis", "primes", "log_n", "tile")
)
def cmux_stage1(acc, degrees, w_all, p_all, basis, primes: tuple, log_n: int, tile: int = 64):
    """``(B, k1, n)`` accumulator + ``(B,)`` degrees ->
    ``(kp, B*k1, L, n)`` NTT-domain digit residues of ``acc*X^d - acc``,
    lazy ``[0, 4p)``.

    ``w_all``/``p_all``: stacked forward tables ``(kp*log_n, n)``.
    """
    n = 1 << log_n
    bsz, k1, nn = acc.shape
    assert nn == n
    kp = len(primes)
    level = basis.decompose_length
    shrs = tuple(basis.shr_bits)
    bm1 = np.uint32(basis.basis_minus_one)
    cmask = np.uint32(basis.carry_mask)
    mmb = np.uint32(basis.modulus_minus_basis & 0xFFFFFFFF)
    init_mask = basis.init_carry_mask

    rows = bsz * k1
    acc2 = acc.reshape(rows, n)
    d_rows = jnp.repeat(jnp.asarray(degrees, jnp.int32), k1).reshape(rows, 1)
    tile = _fit_tile(rows, tile)
    grid = (rows // tile,)

    def kernel(d_ref, v_ref, w_ref, p_ref, out_ref):
        v0 = v_ref[:]
        d = d_ref[:]
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        iota_u = jax.lax.broadcasted_iota(_U32, (1, n), 1)
        # negacyclic rotate by the per-row traced degree (bit chain)
        v = v0
        for b in range(n.bit_length()):
            k = 1 << b
            if k == n:
                rolled = jnp.zeros_like(v) - v
            else:
                r = pltpu.roll(v, k, 1)
                wrapped = iota < k
                rolled = jnp.where(wrapped, jnp.zeros_like(r) - r, r)
            take = ((d >> b) & 1) == 1
            v = jnp.where(take, rolled, v)
        diff = v - v0

        if init_mask is not None:
            carry = ((diff & _U32(init_mask)) != 0).astype(_U32)
        else:
            carry = jnp.zeros_like(diff)
        for l in range(level):
            temp = ((diff >> shrs[l]) & bm1) + carry
            next_carry = ((temp & cmask) != 0).astype(_U32)
            over = temp > bm1
            signed = jnp.where(over, jnp.zeros_like(temp), temp + mmb)
            digit = jnp.where(next_carry == 1, signed, temp)
            carry = next_carry
            for pi, p in enumerate(primes):
                res = _lift_mod_p(digit, p)  # canonical [0, p)
                f = _fwd_ntt_stages(res, w_ref, p_ref, pi * log_n, log_n, p, iota_u)
                out_ref[pi, :, l, :] = f

    d_spec = pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec(
        (kp * log_n, n), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    o_spec = pl.BlockSpec(
        (kp, tile, level, n), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[d_spec, v_spec, t_spec, t_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((kp, rows, level, n), jnp.uint32),
        interpret=jax.default_backend() != "tpu",
    )(d_rows, acc2, w_all, p_all)


# ---------------------------------------------------------------------------
# Stage 2: MAC + inverse NTT + CRT recombine + accumulator add (all primes)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("primes", "log_n", "level", "crt", "tile_b"),
)
def cmux_stage2(f, key_ntt, acc, iw_all, ip_all, primes: tuple, log_n: int,
                level: int, crt: tuple, tile_b: int = 32):
    """``f (kp, B*k1, L, n)`` digits x ``key (kp, k1, L, k1, n)`` ->
    new accumulator ``(B, k1, n)`` (torus u32).

    ``crt``: per-prime static recombination constants
    ``((inv_w, inv_precon, alpha_fix, punctured_mod_t), ..., product_mod_t)``
    — the last element is the shared ``P mod 2^32``.
    """
    n = 1 << log_n
    kp = len(primes)
    bsz, k1, nn = acc.shape
    assert nn == n
    tile_b = _fit_tile(bsz, tile_b)
    grid = (bsz // tile_b,)
    rows = tile_b * k1
    f4 = f.reshape(kp, bsz, k1, level, n)
    per_prime, product_mod_t = crt[:-1], crt[-1]
    pmt = np.uint32(product_mod_t)

    def kernel(f_ref, key_ref, a_ref, iw_ref, ip_ref, out_ref):
        iota_u = jax.lax.broadcasted_iota(_U32, (1, n), 1)
        # per-prime inverse-transformed delta residues, rows (tile_b*k1, n)
        y_per_prime = []
        for pi, p in enumerate(primes):
            qc = np.uint32(p)
            cols = []
            for j in range(k1):
                acc_sum = None
                pending = 0
                for r in range(k1):
                    for l in range(level):
                        t = _lazy_mul_q(f_ref[pi, :, r, l, :], key_ref[pi, r, l, j, :][None], p)
                        t = jnp.where(t >= qc, t - qc, t)
                        if acc_sum is None:
                            acc_sum, pending = t, 1
                        else:
                            if pending == 4:
                                acc_sum = _barrett_lazy_wide(
                                    acc_sum, jnp.zeros_like(acc_sum), p
                                )
                                acc_sum = jnp.where(acc_sum >= qc, acc_sum - qc, acc_sum)
                                pending = 1
                            acc_sum = acc_sum + t
                            pending += 1
                acc_sum = _barrett_lazy_wide(acc_sum, jnp.zeros_like(acc_sum), p)
                acc_sum = jnp.where(acc_sum >= qc, acc_sum - qc, acc_sum)
                cols.append(acc_sum)  # (tile_b, n) canonical, NTT domain
            # stack component rows b-major for one inverse pass over
            # (tile_b*k1, n) — must match the (tile_b, k1, n) output order.
            res = jnp.stack(cols, axis=1).reshape(rows, n)
            y = _inv_ntt_stages(res, iw_ref, ip_ref, pi * log_n, log_n, p, iota_u)
            # Shoup multiply by (P/p)^-1 mod p -> canonical y_i
            iw, ipq, _, _ = per_prime[pi]
            q_hat = _mulhi_u32(y, np.uint32(ipq))
            yv = np.uint32(iw) * y - qc * q_hat
            yv = jnp.where(yv >= qc, yv - qc, yv)
            y_per_prime.append(yv)

        # alpha = round(sum y_i / p_i) via 64-bit fixed point (exact)
        acc_lo = jnp.zeros_like(y_per_prime[0])
        acc_hi = jnp.zeros_like(y_per_prime[0])
        overflow = jnp.zeros_like(y_per_prime[0])
        total = jnp.zeros_like(y_per_prime[0])
        for pi in range(kp):
            _, _, afix, pmod = per_prime[pi]
            a_lo = np.uint32(afix & 0xFFFFFFFF)
            a_hi = np.uint32(afix >> 32)
            y = y_per_prime[pi]
            plo, phi_c = _mul_wide_u32(y, a_lo)
            phi_c = phi_c + y * a_hi  # y * afix mod 2^64 (exact: y*afix < 2^64)
            lo = acc_lo + plo
            c1 = (lo < acc_lo).astype(_U32)
            hi = acc_hi + phi_c
            c2 = (hi < acc_hi).astype(_U32)
            hi2 = hi + c1
            c3 = (hi2 < hi).astype(_U32)
            acc_lo, acc_hi = lo, hi2
            overflow = overflow + c2 + c3
            total = total + y * np.uint32(pmod)  # wrapping
        alpha = overflow + (acc_hi >> 31)
        delta = total - alpha * pmt  # torus u32, rows (tile_b*k1, n)

        out_ref[:] = a_ref[:] + delta.reshape(tile_b, k1, n)

    f_spec = pl.BlockSpec(
        (kp, tile_b, k1, level, n), lambda i: (0, i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    key_spec = pl.BlockSpec(
        (kp, k1, level, k1, n), lambda i: (0, 0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    a_spec = pl.BlockSpec((tile_b, k1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((kp * log_n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[f_spec, key_spec, a_spec, t_spec, t_spec],
        out_specs=a_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, k1, n), jnp.uint32),
        interpret=jax.default_backend() != "tpu",
    )(f4, key_ntt, acc, iw_all, ip_all)


# ---------------------------------------------------------------------------
# Convolver-level driver with cached stacked tables/constants
# ---------------------------------------------------------------------------

_PLANS: dict = {}


def _fused_tables(conv):
    key = id(conv)
    got = _PLANS.get(key)
    if got is not None:
        return got
    # The cache must hold HOST numpy arrays: anything jnp-created while a
    # jit trace is active is a tracer and would leak into later traces.
    # numpy constants are converted per-trace by pallas_call.
    w_all = np.concatenate([np.asarray(p.fwd_w) for p in conv.pallas_plans])
    p_all = np.concatenate([np.asarray(p.fwd_p) for p in conv.pallas_plans])
    iw_all = np.concatenate([np.asarray(p.inv_w) for p in conv.pallas_plans])
    ip_all = np.concatenate([np.asarray(p.inv_p) for p in conv.pallas_plans])
    per_prime = []
    for i, p in enumerate(conv.primes):
        iw = int(np.asarray(conv.inv_punctured.value)[i])
        ipq = int(np.asarray(conv.inv_punctured.quotient)[i])
        afix = (1 << 64) // p
        pmod = (conv.product // p) % (1 << 32)
        per_prime.append((iw, ipq, afix, pmod))
    crt = tuple(per_prime) + (conv.product % (1 << 32),)
    got = (w_all, p_all, iw_all, ip_all, crt)
    _PLANS[key] = got
    return got


def fused_cmux_step(conv, basis, acc, degrees, key_ntt, tile1: int = 64, tile2: int = 32):
    """One blind-rotation step: returns ``acc + (acc*X^d - acc) ⊡ key``.

    ``acc``: ``(B, k1, n)`` torus u32; ``degrees``: ``(B,)`` int32 mod 2N;
    ``key_ntt``: ``(kp, k1, L, k1, n)`` canonical NTT-domain GGSW.
    """
    w_all, p_all, iw_all, ip_all, crt = _fused_tables(conv)
    primes = tuple(conv.primes)
    log_n = conv.log_n
    # VMEM guard: keep the big per-tile buffers (stage-1 digit output,
    # stage-2 digit input) under ~4 MB each; _fit_tile then snaps to a
    # divisor of the row/batch count.
    kp = len(primes)
    level = basis.decompose_length
    n = 1 << log_n
    tile1 = min(tile1, max(1, (4 << 20) // (kp * level * n * 4)))
    tile2 = min(tile2, max(1, (4 << 20) // (kp * acc.shape[1] * level * n * 4)))
    f = cmux_stage1(acc, degrees, w_all, p_all, basis, primes, log_n, tile1)
    return cmux_stage2(
        f, key_ntt, acc, iw_all, ip_all, primes, log_n,
        basis.decompose_length, crt, tile2,
    )
