"""MXU-backed fused CMux step — ONE Pallas kernel per blind-rotation step.

The round-3 fused CMux (:mod:`.cmux_fused`) runs its 768 per-step NTTs on
the VPU butterfly (~200 u32 ops/element/transform); this kernel moves them
onto the int8 MXU with a u32-native byte-radix four-step, cutting the
VPU work per element ~2.3x:

* the whole step lives in the four-step **natural layout** ``(poly*A, B)``
  (``A = n/128``, ``B = 128``) — the accumulator is carried in this layout
  across the entire ``lax.scan``, so no in-kernel relayout ever happens;
  rotation becomes lane rolls + within-group sublane rolls,
* gadget digits are **tiny** (``|d| <= B/2 + 1``), so the forward pass-1
  matmul takes a true-signed **2-plane** split (one i8 truncating cast +
  a borrow plane) against a ``(4A x 2A)`` matrix — half the planes, no
  value-side bias, and both primes' pass-1 matrices stack into one dot,
* all folds are single-u32-word: digit planes pack into two 16-bit-group
  words ``e01``/``e23`` (bias folded into one wrapping constant) and every
  twiddle/finish is one or two 32-bit Shoup multiplies (``w*y - q*
  mulhi_32(y, w')``) with lazy ``[0,4q)`` discipline — never a u64-pair
  chain (the generic :mod:`.ntt_mxu8` kernels pay pair arithmetic
  everywhere, which is why their 4-plane tier only broke even),
* the gadget MAC multiplies by Shoup-preconditioned bootstrap-key tables
  (device-computed exact ``floor(w*2^32/p)``), four canonical terms
  summing raw in u32,
* ``(P/p_i)^-1 * inv_n`` is folded into the inverse pass-2 matrix, so the
  CRT y_i come straight off the final fold,
* stage phases are emitted chain-interleaved (all pass-1 dots, then all
  twiddles, ...) so each chain's VPU tail co-issues under another chain's
  matmul (the round-3 staged-phase lesson).

Semantics: identical to ``cmux_fused.fused_cmux_step`` / the composed
``lattice.tfhe.cmux_delta`` path (reference external product
``crates/primus_lattice/src/tfhe/external_product.rs:36-93`` under a CMux
scan) — differential-tested bit-exactly in ``tests/test_cmux_mxu.py``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cmux_pallas import _mulhi_u32
from .mxu_common import _DOT, four_step_matrices

_U32 = jnp.uint32
_I32 = jnp.int32
_I8 = jnp.int8


# ---------------------------------------------------------------------------
# Host-side plan
# ---------------------------------------------------------------------------


def _balanced_digits(ms, planes: int):
    x = ms.astype(object, copy=True)
    digs = []
    for _c in range(planes):
        d = x & 255
        x = x >> 8
        over = d >= 128
        d = d - over * 256
        x = x + over
        digs.append(d.astype(np.int8))
    assert (x == 0).all(), "balanced digit overflow"
    return digs


def _byte_matrix4(m, q: int, value_planes: int = 4) -> np.ndarray:
    """``W[(c,r),(l,k)] = bal_c(M[r,k] * 2^(8l) mod q)``, 4 output planes,
    ``value_planes`` input planes (2 for the signed digit input)."""
    R, K = m.shape
    w = np.zeros((4 * R, value_planes * K), dtype=np.int8)
    for l in range(value_planes):
        scale = pow(2, 8 * l, q)
        digs = _balanced_digits((m * scale) % q, 4)
        for c in range(4):
            w[c * R : (c + 1) * R, l * K : (l + 1) * K] = digs[c]
    return w


def _rowsum_corr(w: np.ndarray, R: int, q: int) -> np.ndarray:
    """Per-output-row value-bias correction for the XOR-0x80 biased split:
    fed bytes are ``byte - 128``, so the true dot is short by
    ``128 * sum_k W[(c,row),k] * 2^(8c)`` — returned canonical mod q."""
    rs = w.astype(np.int64).sum(axis=1).reshape(4, R)
    out = np.empty(R, dtype=object)
    for r in range(R):
        out[r] = sum(128 * int(rs[c, r]) * (1 << (8 * c)) for c in range(4)) % q
    return out


def _u32t(a) -> np.ndarray:
    return np.asarray([int(v) & 0xFFFFFFFF for v in np.ravel(a)], dtype=np.uint32).reshape(np.shape(a))


def _precon32(w, q: int) -> np.ndarray:
    """floor(w * 2^32 / q) for canonical w (host, exact)."""
    return np.asarray(
        [(int(v) << 32) // q for v in np.ravel(w)], dtype=np.uint64
    ).astype(np.uint32).reshape(np.shape(w))


class CmuxMxuPlan:
    """Per-(log_n, primes) table pack for the fused MXU CMux kernel.

    ``B = 128`` lanes always (``log_n >= 7 + 1`` required so ``A >= 2``);
    the digit-sum int32 bound needs ``4B*128*128 < 2^31`` (true for
    B = 128) and the carry-free 16-bit-group packing needs
    ``2 * bias_exact * 257 < 2^32`` per pass, asserted here.
    """

    def __init__(self, log_n: int, primes: tuple[int, ...]):
        if log_n < 8:
            raise ValueError("cmux_mxu needs log_n >= 8 (B = 128 lanes)")
        self.log_n = log_n
        self.n = n = 1 << log_n
        h1 = log_n - 7
        self.A = A = 1 << h1
        self.B = B = 1 << (log_n - h1)
        self.primes = tuple(int(p) for p in primes)
        for p in self.primes:
            if p >= 1 << 30:
                raise ValueError("cmux_mxu primes must be < 2^30")

        per = []
        for p in self.primes:
            fs = four_step_matrices(log_n, p, h1, h1)
            w1d = _byte_matrix4(fs["m1"], p, value_planes=2)  # (4A, 2A)
            w2 = _byte_matrix4(fs["m2"], p)  # (4B, 4B) rows (c, r1)
            w2f = np.ascontiguousarray(w2.T)  # cols (c, r1)
            w1m = _byte_matrix4(fs["m2i"], p)  # rows (c, k0)
            w1mf = np.ascontiguousarray(w1m.T)  # (4B, 4B) cols (c, k0)
            m1i = fs["m1i"]  # inv pass-2, inv_n folded

            # carry-free packing margins (biased e01/e23 must fit u32)
            for mat in (w1d, w2, w1m):
                bias = int(128 * np.abs(mat.astype(np.int64)).sum(axis=1).max())
                assert 2 * bias * 257 + (1 << 16) < 1 << 32, (p, bias)

            tw, twi = fs["tw"], fs["twi"]  # (A, B) object ints
            t16 = (tw * pow(2, 16, p)) % p
            ti16 = (twi * pow(2, 16, p)) % p
            # value-plane bias constant of the biased e01/e23 packing:
            # e = d0 + (d1<<8) + bias*257 represents V_pair + bias*257, so
            # the twiddled result is short by t * bias*257*(1 + 2^16); the
            # fwd pass-1 value side is the TRUE-signed digit split (no
            # value bias), its packing bias is the int32->u32 offset only.
            per_p = dict(
                w1d=w1d, w2f=w2f, w1mf=w1mf,
                w2m=_byte_matrix4(m1i, p),  # (4A, 4A) rows (c, k1)
            )
            bias1 = int(128 * np.abs(w1d.astype(np.int64)).sum(axis=1).max())
            bias2 = int(128 * np.abs(w2.astype(np.int64)).sum(axis=1).max())
            biasi1 = int(128 * np.abs(w1m.astype(np.int64)).sum(axis=1).max())
            biasi2 = int(128 * np.abs(per_p["w2m"].astype(np.int64)).sum(axis=1).max())
            pack_off = lambda b: (b * 257) * (1 + (1 << 16))  # both groups

            # forward twiddle tables: t, t' and t16, t16' Shoup pairs plus
            # the additive table ct = t*(-pack_off(bias1)) mod p (the fwd
            # pass-1 input is signed — no XOR row-sum term)
            ct = np.empty((A, B), dtype=object)
            for r in range(A):
                for k in range(B):
                    ct[r, k] = (-pack_off(bias1)) * int(tw[r, k]) % p
            per_p["t"] = _u32t(tw)
            per_p["tp"] = _precon32(tw, p)
            per_p["t16"] = _u32t(t16)
            per_p["t16p"] = _precon32(t16, p)
            per_p["ct"] = _u32t(ct)

            # fwd finish: corr2 (per r1 lane) + e01 bias const, folded into
            # one wrapping u32 add-table cb2 (1, B); the e23 group rides a
            # Shoup by 2^16 so its bias joins the same table mod p.
            corr2 = _rowsum_corr(w2, B, p)
            cb2 = np.empty((1, B), dtype=object)
            for k in range(B):
                # value after packing = e01 + 2^16*e23 - bias2*257*(1+2^16)
                # + corr2; add (corr2 - pack_off) mod p into the e01 word
                cb2[0, k] = (int(corr2[k]) - pack_off(bias2)) % p
            per_p["cb2"] = _u32t(cb2) + np.uint32(
                (bias2 * 257) & 0xFFFFFFFF
            )  # wrapping: bias const + mod-p additive corr
            per_p["w16"] = np.uint32(pow(2, 16, p))
            per_p["w16p"] = np.uint32((pow(2, 16, p) << 32) // p)

            # inverse twiddle: cti = twi*(corr_i1[k0] - pack_off(biasi1))
            corri1 = _rowsum_corr(w1m, B, p)
            cti = np.empty((A, B), dtype=object)
            for r in range(A):
                for k in range(B):
                    cti[r, k] = (
                        (int(corri1[k]) - pack_off(biasi1)) * int(twi[r, k]) % p
                    )
            per_p["ti"] = _u32t(twi)
            per_p["tip"] = _precon32(twi, p)
            per_p["ti16"] = _u32t(ti16)
            per_p["ti16p"] = _precon32(ti16, p)
            per_p["cti"] = _u32t(cti)

            # inverse finish: corr_i2 per k1 row, (A, B) lane-broadcast
            corri2 = _rowsum_corr(per_p["w2m"], A, p)
            cbi = np.empty((A, B), dtype=object)
            for r in range(A):
                for k in range(B):
                    cbi[r, k] = (int(corri2[r]) - pack_off(biasi2)) % p
            per_p["cbi"] = _u32t(cbi) + np.uint32((biasi2 * 257) & 0xFFFFFFFF)
            per_p["b2_1"] = np.uint32((bias1 * 257) & 0xFFFFFFFF)
            per_p["b2_2"] = np.uint32((bias2 * 257) & 0xFFFFFFFF)
            per_p["b2_i1"] = np.uint32((biasi1 * 257) & 0xFFFFFFFF)
            per_p["b2_i2"] = np.uint32((biasi2 * 257) & 0xFFFFFFFF)
            per_p["prec1"] = np.uint32((1 << 32) // p)
            per.append(per_p)
        self.per_prime = per

    def crt_consts(self, product: int):
        """Static CRT recombination constants for these primes under the
        full product P: ((afix, pmod) per prime, P mod 2^32)."""
        out = []
        for p in self.primes:
            out.append(((1 << 64) // p, (product // p) % (1 << 32)))
        return tuple(out) + (product % (1 << 32),)

    def fold_inverse_scale(self, product: int):
        """Rebuild w2m with ``(P/p_i)^-1 mod p_i`` folded in (call once,
        before first kernel use, when the CRT product is known)."""
        from ..utils.gcd import mod_inv

        for per_p, p in zip(self.per_prime, self.primes):
            if per_p.get("_scaled", False):
                continue
            c = mod_inv((product // p) % p, p)
            fs = four_step_matrices(self.log_n, p, self.log_n - 7, self.log_n - 7)
            m1i = (fs["m1i"] * c) % p
            per_p["w2m"] = _byte_matrix4(m1i, p)
            biasi2 = int(128 * np.abs(per_p["w2m"].astype(np.int64)).sum(axis=1).max())
            assert 2 * biasi2 * 257 + (1 << 16) < 1 << 32
            pack_off = (biasi2 * 257) * (1 + (1 << 16))
            corri2 = _rowsum_corr(per_p["w2m"], self.A, p)
            cbi = np.empty((self.A, self.B), dtype=object)
            for r in range(self.A):
                for k in range(self.B):
                    cbi[r, k] = (int(corri2[r]) - pack_off) % p
            per_p["cbi"] = _u32t(cbi) + np.uint32((biasi2 * 257) & 0xFFFFFFFF)
            per_p["b2_i2"] = np.uint32((biasi2 * 257) & 0xFFFFFFFF)
            per_p["_scaled"] = True


_PLANS: dict = {}


def get_plan(log_n: int, primes: tuple, product: int) -> CmuxMxuPlan:
    key = (log_n, tuple(primes))
    plan = _PLANS.get(key)
    if plan is None:
        plan = CmuxMxuPlan(log_n, tuple(primes))
        plan.fold_inverse_scale(product)
        _PLANS[key] = plan
    return plan


# ---------------------------------------------------------------------------
# In-kernel arithmetic helpers (all single-u32-word)
# ---------------------------------------------------------------------------


def _sl(y, w, wp, p: int):
    """Lazy 32-bit Shoup: ``w*y - p*mulhi(y, w')`` in [0, 2p), any u32 y."""
    return w * y - np.uint32(p) * _mulhi_u32(y, wp)


def _split4(x):
    """Biased byte planes of a u32 word (XOR 0x80 trick, 4 planes)."""
    xl = x ^ np.uint32(0x80808080)
    return [
        (xl if s == 0 else xl >> s).astype(_I8) for s in (0, 8, 16, 24)
    ]


def _split_digit(x):
    """True-signed 2-plane split of a small digit (|d| <= 2^14)."""
    xs = jax.lax.bitcast_convert_type(x, _I32)
    s0 = x.astype(_I8)  # truncating: sign-extended low byte
    s1 = ((xs - s0.astype(_I32)) >> 8).astype(_I8)
    return s0, s1


def _pack_pair(d0, d1, bconst):
    """``d0 + (d1 << 8) + bconst`` wrapping (16-bit-group packing)."""
    return d0.astype(_U32) + (d1.astype(_U32) << 8) + bconst


# ---------------------------------------------------------------------------
# The fused kernel
# ---------------------------------------------------------------------------


def _make_cmux_kernel(
    plan: CmuxMxuPlan, basis, crt, tile_b: int, k1: int, level: int
):
    A, B, log_n = plan.A, plan.B, plan.log_n
    n = plan.n
    kp = len(plan.primes)
    npoly = tile_b * k1  # polys in the tile (forward side)
    R = npoly * A  # value rows in the tile
    shrs = tuple(basis.shr_bits)
    bm1 = np.uint32(basis.basis_minus_one)
    cmask = np.uint32(basis.carry_mask)
    mmb = np.uint32(basis.modulus_minus_basis & 0xFFFFFFFF)
    init_mask = basis.init_carry_mask
    per_prime = plan.per_prime
    per_crt, pmt = crt[:-1], np.uint32(crt[-1])

    def kernel(d_ref, acc_ref, key_ref, keyp_ref, *rest):
        # rest: per prime [w1d, w2f, w1mf, w2m, t, tp, t16, t16p, ct, cb2,
        #                  ti, tip, ti16, ti16p, cti, cbi]  then out_ref
        ntab = 16
        tabs = [rest[pi * ntab : (pi + 1) * ntab] for pi in range(kp)]
        out_ref = rest[kp * ntab]

        row_iota = jax.lax.broadcasted_iota(_I32, (R, 1), 0)
        row_a = row_iota % A  # row index within each poly's A-group
        lane_iota = jax.lax.broadcasted_iota(_I32, (1, B), 1)

        def group_roll(y, m):
            """Within-A-group row roll: row r <- row (r - m) mod A."""
            z1 = pltpu.roll(y, m, 0)
            z2 = pltpu.roll(y, (m - A) % R, 0)
            return jnp.where(row_a >= m, z1, z2)

        # ---- rotate: v * X^d (negacyclic), natural layout -------------
        v0 = acc_ref[:]
        d = d_ref[:]  # (R, 1) int32, constant within each A-group
        v = v0
        for j in range(log_n + 1):
            k = 1 << j
            if k < B:
                r1 = pltpu.roll(v, k, 1)
                up = group_roll(r1, 1)
                wrapped = lane_iota < k
                neg = jnp.logical_and(wrapped, row_a == 0)
                cand = jnp.where(wrapped, up, r1)
                rolled = jnp.where(neg, jnp.zeros_like(cand) - cand, cand)
            elif k < n:
                m = k // B
                z = group_roll(v, m)
                rolled = jnp.where(
                    row_a < m, jnp.zeros_like(z) - z, z
                )
            else:  # k == n: X^n = -1
                rolled = jnp.zeros_like(v) - v
            take = ((d >> j) & 1) == 1
            v = jnp.where(take, rolled, v)
        diff = v - v0

        # ---- signed gadget decompose (L levels, unrolled carries) -----
        if init_mask is not None:
            carry = ((diff & _U32(init_mask)) != 0).astype(_U32)
        else:
            carry = jnp.zeros_like(diff)
        digit_planes = []  # per level: (s0, s1) i8 (R, B)
        for l in range(level):
            temp = ((diff >> shrs[l]) & bm1) + carry
            next_carry = ((temp & cmask) != 0).astype(_U32)
            over = temp > bm1
            signed = jnp.where(over, jnp.zeros_like(temp), temp + mmb)
            digit = jnp.where(next_carry == 1, signed, temp)
            carry = next_carry
            digit_planes.append(_split_digit(digit))

        # ---- forward chains: (prime, level), staged phases ------------
        # phase F1: pass-1 dots (both primes stacked, one dot per level)
        w1d_all = jnp.concatenate([tabs[pi][0][:] for pi in range(kp)], axis=0)
        o1s = []  # [level] -> (kp*4A, npoly*B)
        for l in range(level):
            s0, s1 = digit_planes[l]
            parts = [
                jnp.concatenate(
                    [s0[p * A : (p + 1) * A, :], s1[p * A : (p + 1) * A, :]],
                    axis=0,
                )
                for p in range(npoly)
            ]
            x8 = jnp.concatenate(parts, axis=1)  # (2A, npoly*B)
            o1s.append(_DOT(w1d_all, x8))

        # phase F2: twiddle + re-split per (prime, level)
        a2s = {}
        for pi in range(kp):
            p = plan.primes[pi]
            tb = tabs[pi]
            t, tp, t16, t16p, ct = (tb[4][:], tb[5][:], tb[6][:], tb[7][:], tb[8][:])
            b2_1 = per_prime[pi]["b2_1"]
            for l in range(level):
                o1 = o1s[l][pi * 4 * A : (pi + 1) * 4 * A, :]
                digs = [
                    jax.lax.bitcast_convert_type(
                        o1[c * A : (c + 1) * A, :], _U32
                    )
                    for c in range(4)
                ]
                parts = []
                for pq in range(npoly):
                    lanes = slice(pq * B, (pq + 1) * B)
                    e01 = digs[0][:, lanes] + (digs[1][:, lanes] << 8) + b2_1
                    e23 = digs[2][:, lanes] + (digs[3][:, lanes] << 8) + b2_1
                    m1 = _sl(e01, t, tp, p)
                    m1 = jnp.where(m1 >= np.uint32(p), m1 - np.uint32(p), m1)
                    s2 = m1 + _sl(e23, t16, t16p, p) + ct  # < 4p
                    parts.append(jnp.concatenate(_split4(s2), axis=1))
                a2s[(pi, l)] = jnp.concatenate(parts, axis=0)  # (npoly*A, 4B)

        # phase F3: pass-2 dots
        o2s = {}
        for pi in range(kp):
            for l in range(level):
                o2s[(pi, l)] = _DOT(a2s[(pi, l)], tabs[pi][1][:])

        # phase F4: finish -> NTT-domain digit values (any-u32 word)
        vf = {}
        for pi in range(kp):
            p = plan.primes[pi]
            cb2 = tabs[pi][9][:]  # (1, B) wrapping add table
            b2_2 = per_prime[pi]["b2_2"]
            w16 = per_prime[pi]["w16"]
            w16p = per_prime[pi]["w16p"]
            prec1 = per_prime[pi]["prec1"]
            for l in range(level):
                o2 = o2s[(pi, l)]
                d2 = [
                    jax.lax.bitcast_convert_type(
                        o2[:, c * B : (c + 1) * B], _U32
                    )
                    for c in range(4)
                ]
                e01 = d2[0] + (d2[1] << 8) + cb2  # bias + corr folded
                e23 = d2[2] + (d2[3] << 8) + b2_2
                r = _sl(e01, np.uint32(1), prec1, p) + _sl(e23, w16, w16p, p)
                vf[(pi, l)] = r  # (npoly*A, B), == V mod p, < 4p

        # ---- gadget MAC: out[j] = sum_{r,l} key[r,l,j] * vf[l,r] ------
        mac = {}
        for pi in range(kp):
            p = plan.primes[pi]
            pc = np.uint32(p)
            tpc = np.uint32(2 * p)
            for j in range(k1):
                cols = []
                for bq in range(tile_b):
                    acc_sum = None
                    pending = 0
                    for r in range(k1):
                        rows = slice((bq * k1 + r) * A, (bq * k1 + r + 1) * A)
                        for l in range(level):
                            w = key_ref[pi, r, l, j, :, :]
                            wp = keyp_ref[pi, r, l, j, :, :]
                            tmv = _sl(vf[(pi, l)][rows, :], w, wp, p)
                            tmv = jnp.where(tmv >= pc, tmv - pc, tmv)
                            if acc_sum is None:
                                acc_sum, pending = tmv, 1
                            else:
                                if pending == 4:  # next add would pass 4p
                                    acc_sum = jnp.where(
                                        acc_sum >= tpc, acc_sum - tpc, acc_sum
                                    )
                                    acc_sum = jnp.where(
                                        acc_sum >= pc, acc_sum - pc, acc_sum
                                    )
                                    pending = 1
                                acc_sum = acc_sum + tmv
                                pending += 1
                    cols.append(acc_sum)  # (A, B) in [0, 4p)
                mac[(pi, j)] = jnp.concatenate(cols, axis=0)  # (tile_b*A, B)

        # ---- inverse chains: (prime, j), staged phases ----------------
        i1s = {}
        for pi in range(kp):
            for j in range(k1):
                planes = _split4(mac[(pi, j)])
                parts = [
                    jnp.concatenate(
                        [pl4[pq * A : (pq + 1) * A, :] for pl4 in planes],
                        axis=1,
                    )
                    for pq in range(tile_b)
                ]
                x8 = jnp.concatenate(parts, axis=0)  # (tile_b*A, 4B)
                i1s[(pi, j)] = _DOT(x8, tabs[pi][2][:])

        ia2 = {}
        for pi in range(kp):
            p = plan.primes[pi]
            tb = tabs[pi]
            ti, tip, ti16, ti16p, cti = (
                tb[10][:], tb[11][:], tb[12][:], tb[13][:], tb[14][:],
            )
            b2i = per_prime[pi]["b2_i1"]
            for j in range(k1):
                o1 = i1s[(pi, j)]
                digs = [
                    jax.lax.bitcast_convert_type(
                        o1[:, c * B : (c + 1) * B], _U32
                    )
                    for c in range(4)
                ]
                parts = []
                for pq in range(tile_b):
                    rows = slice(pq * A, (pq + 1) * A)
                    e01 = digs[0][rows, :] + (digs[1][rows, :] << 8) + b2i
                    e23 = digs[2][rows, :] + (digs[3][rows, :] << 8) + b2i
                    m1 = _sl(e01, ti, tip, p)
                    m1 = jnp.where(m1 >= np.uint32(p), m1 - np.uint32(p), m1)
                    s2 = m1 + _sl(e23, ti16, ti16p, p) + cti  # < 4p
                    parts.append(jnp.concatenate(_split4(s2), axis=0))
                ia2[(pi, j)] = jnp.concatenate(parts, axis=1)  # (4A, tile_b*B)

        io2 = {}
        for pi in range(kp):
            for j in range(k1):
                io2[(pi, j)] = _DOT(tabs[pi][3][:], ia2[(pi, j)])

        ys = {}
        for pi in range(kp):
            p = plan.primes[pi]
            pc = np.uint32(p)
            cbi = tabs[pi][15][:]  # (A, B)
            b2_i2 = per_prime[pi]["b2_i2"]
            w16 = per_prime[pi]["w16"]
            w16p = per_prime[pi]["w16p"]
            prec1 = per_prime[pi]["prec1"]
            for j in range(k1):
                o2 = io2[(pi, j)]
                d2 = [
                    jax.lax.bitcast_convert_type(
                        o2[c * A : (c + 1) * A, :], _U32
                    )
                    for c in range(4)
                ]
                parts = []
                for pq in range(tile_b):
                    lanes = slice(pq * B, (pq + 1) * B)
                    e01 = d2[0][:, lanes] + (d2[1][:, lanes] << 8) + cbi
                    e23 = d2[2][:, lanes] + (d2[3][:, lanes] << 8) + b2_i2
                    r = _sl(e01, np.uint32(1), prec1, p) + _sl(e23, w16, w16p, p)
                    r = jnp.where(r >= 2 * pc, r - 2 * pc, r)
                    r = jnp.where(r >= pc, r - pc, r)  # canonical y_i
                    parts.append(r)
                ys[(pi, j)] = jnp.concatenate(parts, axis=0)  # (tile_b*A, B)

        # ---- CRT recombine + accumulate -------------------------------
        for j in range(k1):
            acc_lo = jnp.zeros((tile_b * A, B), _U32)
            acc_hi = jnp.zeros((tile_b * A, B), _U32)
            overflow = jnp.zeros((tile_b * A, B), _U32)
            total = jnp.zeros((tile_b * A, B), _U32)
            for pi in range(kp):
                afix, pmod = per_crt[pi]
                a_lo = np.uint32(afix & 0xFFFFFFFF)
                a_hi = np.uint32(afix >> 32)
                y = ys[(pi, j)]
                y0 = y & 0xFFFF
                y1 = y >> 16
                b0 = a_lo & np.uint32(0xFFFF)
                b1 = a_lo >> 16
                m1 = y1 * b0 + ((y0 * b0) >> 16)
                m2 = y0 * b1 + (m1 & 0xFFFF)
                phi = y1 * b1 + (m1 >> 16) + (m2 >> 16)
                plo = y * a_lo
                phi = phi + y * a_hi  # y*afix exact mod 2^64
                lo = acc_lo + plo
                c1 = (lo < acc_lo).astype(_U32)
                hi = acc_hi + phi
                c2 = (hi < acc_hi).astype(_U32)
                hi2 = hi + c1
                c3 = (hi2 < hi).astype(_U32)
                acc_lo, acc_hi = lo, hi2
                overflow = overflow + c2 + c3
                total = total + y * np.uint32(pmod)
            alpha = overflow + (acc_hi >> 31)
            delta = total - alpha * pmt  # torus u32
            # scatter back into the (b, j, a) row structure
            for bq in range(tile_b):
                rows_out = slice((bq * k1 + j) * A, (bq * k1 + j + 1) * A)
                rows_in = slice(bq * A, (bq + 1) * A)
                out_ref[rows_out, :] = v0[rows_out, :] + delta[rows_in, :]

    return kernel


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


def _fit_tile(total: int, tile: int) -> int:
    tile = max(1, min(tile, total))
    while total % tile:
        tile -= 1
    return tile


# batch-tile default: swept on TPU v5e at the bench config (N=1024, kp=2,
# L=2, batch 64): tile 4 -> 2866 boots/s, 8 -> 3605, 16 -> 3950 (tile 32
# blows up trace/compile time).  16 is the sweet spot.
_DEFAULT_TILE_B = int(os.environ.get("CMUX_MXU_TILE", "16"))


def default_tile_b() -> int:
    return _DEFAULT_TILE_B


@functools.partial(
    jax.jit, static_argnames=("plan", "basis", "crt", "k1", "level", "tile_b")
)
def mxu_cmux_step_nat(
    plan: CmuxMxuPlan, basis, crt, acc_nat, degrees, key_vals, key_precons,
    k1: int, level: int, tile_b: int | None = None,
):
    """One CMux step in natural layout.

    ``acc_nat``: ``(bsz, k1, A, B)`` torus u32; ``degrees``: ``(bsz,)``
    int32 mod 2n; ``key_vals``/``key_precons``: ``(kp, k1, L, k1, A, B)``
    canonical NTT-domain GGSW + Shoup precons (natural four-step order).
    Returns the new accumulator, same shape/layout.
    """
    bsz = acc_nat.shape[0]
    A, B = plan.A, plan.B
    kp = len(plan.primes)
    # Single-poly i8 chunks trip an XLA-CPU LLVM bug in INTERPRET mode
    # only; on real TPU hardware batch 1 runs unpadded (half the work —
    # the single-gate latency a circuit user feels).
    pad1 = bsz == 1 and jax.default_backend() != "tpu"
    if pad1:
        acc_nat = jnp.concatenate([acc_nat, jnp.zeros_like(acc_nat)])
        degrees = jnp.concatenate(
            [jnp.asarray(degrees, jnp.int32).reshape(1), jnp.zeros((1,), jnp.int32)]
        )
        bsz = 2
    tile_b = _fit_tile(bsz, _DEFAULT_TILE_B if tile_b is None else tile_b)
    grid = (bsz // tile_b,)
    R = tile_b * k1 * A

    acc2 = acc_nat.reshape(bsz * k1 * A, B)
    d_rows = jnp.repeat(jnp.asarray(degrees, jnp.int32), k1 * A).reshape(-1, 1)

    kernel = _make_cmux_kernel(plan, basis, crt, tile_b, k1, level)

    tabs = []
    tab_names = [
        "w1d", "w2f", "w1mf", "w2m", "t", "tp", "t16", "t16p", "ct", "cb2",
        "ti", "tip", "ti16", "ti16p", "cti", "cbi",
    ]
    for per_p in plan.per_prime:
        for nm in tab_names:
            tabs.append(per_p[nm])

    d_spec = pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((R, B), lambda i: (i, 0), memory_space=pltpu.VMEM)
    key_spec = pl.BlockSpec(
        key_vals.shape, lambda i: (0,) * key_vals.ndim, memory_space=pltpu.VMEM
    )
    t_specs = [
        pl.BlockSpec(t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for t in tabs
    ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[d_spec, v_spec, key_spec, key_spec] + t_specs,
        out_specs=v_spec,
        out_shape=jax.ShapeDtypeStruct((bsz * k1 * A, B), jnp.uint32),
        interpret=jax.default_backend() != "tpu",
    )(d_rows, acc2, key_vals, key_precons, *tabs)
    out = out.reshape(bsz, k1, A, B)
    return out[:1] if pad1 else out


# ---------------------------------------------------------------------------
# Key preparation (one-time, device-side)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1,))
def _exact_precon32(w, p: int):
    """Exact ``floor(w * 2^32 / p)`` for canonical u32 ``w`` (device)."""
    r64 = (1 << 64) // p
    r0 = np.uint32(r64 & 0xFFFFFFFF)
    r1 = np.uint32(r64 >> 32)
    from ..numeric.limb import mul_wide_u32, mulhi_u32

    chat = w * r1 + mulhi_u32(w, r0)  # <= floor, short by <= 2
    for _ in range(2):
        cand = chat + 1
        lo, hi = mul_wide_u32(cand, jnp.full_like(cand, np.uint32(p)))
        ok = (hi < w) | ((hi == w) & (lo == 0))  # cand*p <= w*2^32
        chat = jnp.where(ok, cand, chat)
    return chat


def prepare_mxu_bsk(conv, ggsw_coeff):
    """Coefficient-domain stacked GGSW ``(n_lwe, k1, L, k1, n)`` (torus
    u32) -> MXU-order NTT key ``(n_lwe, kp, k1, L, k1, A, B)`` values +
    precons, via the byte-radix forward on each prime (natural layout =
    the kernel's NTT-domain order)."""
    from ..numeric.limb import U64
    from .ntt_mxu8 import Mxu8NttPlan64, mxu8_fused_forward64

    log_n = conv.log_n
    n = conv.n
    A = 1 << (log_n - 7)
    B = 128
    res = conv.lift(ggsw_coeff)  # (kp, n_lwe, k1, L, k1, n) canonical
    vals = []
    pres = []
    for i, p in enumerate(conv.primes):
        mplan = Mxu8NttPlan64(log_n, p, h1=log_n - 7)
        f = mxu8_fused_forward64(
            mplan, U64(res[i], jnp.zeros_like(res[i])), 1
        ).lo  # canonical [0, p), natural order (..., n)
        vals.append(f)
        pres.append(_exact_precon32(f, p))
    kv = jnp.stack(vals)  # (kp, n_lwe, k1, L, k1, n)
    kv = jnp.moveaxis(kv, 0, 1)  # (n_lwe, kp, ...)
    kpre = jnp.moveaxis(jnp.stack(pres), 0, 1)
    shape = kv.shape[:-1] + (A, B)
    return kv.reshape(shape), kpre.reshape(shape)
