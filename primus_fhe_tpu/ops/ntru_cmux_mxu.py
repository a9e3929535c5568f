"""Single-kernel MXU NTRU CMux step (NGS / FINAL blind rotation).

The NTRU analogue of :mod:`.cmux_mxu`: one Pallas kernel per
blind-rotation step, everything mod ONE prime ``q < 2^30`` (no CRT —
the NTRU accumulator is a single polynomial, the headline storage win of
NTRU bootstrapping).  Per step, in four-step natural layout:

    decompose(acc) -> signed 2-plane digit matmuls (fwd NTT, L levels)
    -> Shoup-key MAC against the NGS EVK row -> MXU INTT -> delta
    -> acc + rot(delta, a_i) - delta        (the (X^a - 1) factor)

Differences from the torus kernel: the gadget basis runs mod q
(wrap-threshold preadjust, ``q - B`` signed offset — digits are
recovered to true signed form with one conditional ``-q`` before the
i8 split), rotation negates mod q, and the single-prime MAC/INTT needs
no CRT recombination.

Semantics identical to ``boot.ntru_blind_rotate``'s composed step —
differential-tested bit-exactly (``tests/test_ntru_cmux_mxu.py``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cmux_mxu import CmuxMxuPlan, _exact_precon32, _fit_tile, _sl, _split4, _split_digit
from .mxu_common import _DOT

_U32 = jnp.uint32
_I32 = jnp.int32

_PLANS: dict = {}


def get_ntru_plan(log_n: int, q: int) -> CmuxMxuPlan:
    key = (log_n, q)
    plan = _PLANS.get(key)
    if plan is None:
        plan = CmuxMxuPlan(log_n, (q,))
        plan.fold_inverse_scale(q)  # (P/p)^-1 = 1: rebuild is a no-op scale
        _PLANS[key] = plan
    return plan


def _make_ntru_kernel(plan: CmuxMxuPlan, basis, tile_b: int, level: int):
    A, B, log_n = plan.A, plan.B, plan.log_n
    n = plan.n
    q = plan.primes[0]
    qc = np.uint32(q)
    tqc = np.uint32(2 * q)
    R = tile_b * A
    shrs = tuple(basis.shr_bits)
    bm1 = np.uint32(basis.basis_minus_one)
    cmask = np.uint32(basis.carry_mask)
    mmb = np.uint32(basis.modulus_minus_basis & 0xFFFFFFFF)
    init_mask = basis.init_carry_mask
    wrap_thr = basis.wrap_threshold
    adj_add = np.uint32(basis.adjust_add & 0xFFFFFFFF)
    per = plan.per_prime[0]

    def kernel(d_ref, acc_ref, kv_ref, kp_ref, *rest):
        # rest: [w1d, w2f, w1mf, w2m, t, tp, t16, t16p, ct, cb2,
        #        ti, tip, ti16, ti16p, cti, cbi], out_ref
        tb = rest[:16]
        out_ref = rest[16]

        row_iota = jax.lax.broadcasted_iota(_I32, (R, 1), 0)
        row_a = row_iota % A
        lane_iota = jax.lax.broadcasted_iota(_I32, (1, B), 1)

        def group_roll(y, m):
            z1 = pltpu.roll(y, m, 0)
            z2 = pltpu.roll(y, (m - A) % R, 0)
            return jnp.where(row_a >= m, z1, z2)

        def negq(v):
            return jnp.where(v == 0, v, qc - v)

        def rotate(v, d):
            """v * X^d mod (X^N + 1, q), natural layout, canonical."""
            for j in range(log_n + 1):
                k = 1 << j
                if k < B:
                    r1 = pltpu.roll(v, k, 1)
                    up = group_roll(r1, 1)
                    wrapped = lane_iota < k
                    neg = jnp.logical_and(wrapped, row_a == 0)
                    cand = jnp.where(wrapped, up, r1)
                    rolled = jnp.where(neg, negq(cand), cand)
                elif k < n:
                    m = k // B
                    z = group_roll(v, m)
                    rolled = jnp.where(row_a < m, negq(z), z)
                else:
                    rolled = negq(v)
                take = ((d >> j) & 1) == 1
                v = jnp.where(take, rolled, v)
            return v

        acc0 = acc_ref[:]
        d = d_ref[:]

        # ---- signed gadget decompose mod q --------------------------------
        v = acc0
        if wrap_thr is not None:
            v = jnp.where(v >= np.uint32(wrap_thr), v + adj_add, v)
        if init_mask is not None:
            carry = ((v & _U32(init_mask)) != 0).astype(_U32)
        else:
            carry = jnp.zeros_like(v)
        digit_planes = []
        for l in range(level):
            temp = ((v >> shrs[l]) & bm1) + carry
            next_carry = ((temp & cmask) != 0).astype(_U32)
            over = temp > bm1
            signed = jnp.where(over, jnp.zeros_like(temp), temp + mmb)
            digit = jnp.where(next_carry == 1, signed, temp)
            carry = next_carry
            # true signed form: mod-q negatives sit near q — one
            # conditional wrap puts them in [-B/2, B/2] for the i8 split
            digit = jnp.where(digit > bm1, digit - qc, digit)
            digit_planes.append(_split_digit(digit))

        # ---- forward chains (one per level), staged -----------------------
        o1s = []
        for l in range(level):
            s0, s1 = digit_planes[l]
            parts = [
                jnp.concatenate(
                    [s0[p * A : (p + 1) * A, :], s1[p * A : (p + 1) * A, :]],
                    axis=0,
                )
                for p in range(tile_b)
            ]
            o1s.append(_DOT(tb[0][:], jnp.concatenate(parts, axis=1)))

        a2s = []
        t, tp, t16, t16p, ct = tb[4][:], tb[5][:], tb[6][:], tb[7][:], tb[8][:]
        b2_1 = per["b2_1"]
        for l in range(level):
            o1 = o1s[l]
            digs = [
                jax.lax.bitcast_convert_type(o1[c * A : (c + 1) * A, :], _U32)
                for c in range(4)
            ]
            parts = []
            for pq in range(tile_b):
                lanes = slice(pq * B, (pq + 1) * B)
                e01 = digs[0][:, lanes] + (digs[1][:, lanes] << 8) + b2_1
                e23 = digs[2][:, lanes] + (digs[3][:, lanes] << 8) + b2_1
                m1 = _sl(e01, t, tp, q)
                m1 = jnp.where(m1 >= qc, m1 - qc, m1)
                s2 = m1 + _sl(e23, t16, t16p, q) + ct
                parts.append(jnp.concatenate(_split4(s2), axis=1))
            a2s.append(jnp.concatenate(parts, axis=0))

        o2s = [_DOT(a2, tb[1][:]) for a2 in a2s]

        vf = []
        cb2 = tb[9][:]
        b2_2 = per["b2_2"]
        w16, w16p, prec1 = per["w16"], per["w16p"], per["prec1"]
        for l in range(level):
            o2 = o2s[l]
            d2 = [
                jax.lax.bitcast_convert_type(o2[:, c * B : (c + 1) * B], _U32)
                for c in range(4)
            ]
            e01 = d2[0] + (d2[1] << 8) + cb2
            e23 = d2[2] + (d2[3] << 8) + b2_2
            vf.append(_sl(e01, np.uint32(1), prec1, q) + _sl(e23, w16, w16p, q))

        # ---- MAC against the EVK row (single prime), per poly block -------
        cols = []
        for pq in range(tile_b):
            rows = slice(pq * A, (pq + 1) * A)
            acc_sum = None
            pending = 0
            for l in range(level):
                tmv = _sl(vf[l][rows, :], kv_ref[l, :, :], kp_ref[l, :, :], q)
                tmv = jnp.where(tmv >= qc, tmv - qc, tmv)
                if acc_sum is None:
                    acc_sum, pending = tmv, 1
                else:
                    if pending == 4:
                        acc_sum = jnp.where(
                            acc_sum >= tqc, acc_sum - tqc, acc_sum
                        )
                        acc_sum = jnp.where(acc_sum >= qc, acc_sum - qc, acc_sum)
                        pending = 1
                    acc_sum = acc_sum + tmv
                    pending += 1
            cols.append(acc_sum)
        acc_sum = jnp.concatenate(cols, axis=0)  # (R, B) in [0, 4q)

        # ---- inverse chain -----------------------------------------------
        planes = _split4(acc_sum)
        parts = [
            jnp.concatenate([pl4[pq * A : (pq + 1) * A, :] for pl4 in planes], axis=1)
            for pq in range(tile_b)
        ]
        i1 = _DOT(jnp.concatenate(parts, axis=0), tb[2][:])
        ti, tip, ti16, ti16p, cti = (
            tb[10][:], tb[11][:], tb[12][:], tb[13][:], tb[14][:],
        )
        b2i = per["b2_i1"]
        digs = [
            jax.lax.bitcast_convert_type(i1[:, c * B : (c + 1) * B], _U32)
            for c in range(4)
        ]
        parts = []
        for pq in range(tile_b):
            rows = slice(pq * A, (pq + 1) * A)
            e01 = digs[0][rows, :] + (digs[1][rows, :] << 8) + b2i
            e23 = digs[2][rows, :] + (digs[3][rows, :] << 8) + b2i
            m1 = _sl(e01, ti, tip, q)
            m1 = jnp.where(m1 >= qc, m1 - qc, m1)
            s2 = m1 + _sl(e23, ti16, ti16p, q) + cti
            parts.append(jnp.concatenate(_split4(s2), axis=0))
        i2 = _DOT(tb[3][:], jnp.concatenate(parts, axis=1))
        cbi = tb[15][:]
        b2_i2 = per["b2_i2"]
        d2 = [
            jax.lax.bitcast_convert_type(i2[c * A : (c + 1) * A, :], _U32)
            for c in range(4)
        ]
        parts = []
        for pq in range(tile_b):
            lanes = slice(pq * B, (pq + 1) * B)
            e01 = d2[0][:, lanes] + (d2[1][:, lanes] << 8) + cbi
            e23 = d2[2][:, lanes] + (d2[3][:, lanes] << 8) + b2_i2
            r = _sl(e01, np.uint32(1), prec1, q) + _sl(e23, w16, w16p, q)
            r = jnp.where(r >= tqc, r - tqc, r)
            r = jnp.where(r >= qc, r - qc, r)  # canonical delta
            parts.append(r)
        delta = jnp.concatenate(parts, axis=0)  # (R, B) canonical

        # ---- acc + rot(delta, a) - delta, mod q ---------------------------
        rot = rotate(delta, d)
        s = acc0 + rot
        s = jnp.where(s >= qc, s - qc, s)
        s = s + (qc - delta)
        s = jnp.where(s >= qc, s - qc, s)
        out_ref[:] = s

    return kernel


@functools.partial(
    jax.jit, static_argnames=("plan", "basis", "level", "tile_b")
)
def ntru_cmux_step_nat(
    plan: CmuxMxuPlan, basis, acc_nat, degrees, kv, kpre,
    level: int, tile_b: int | None = None,
):
    """One NTRU CMux step in natural layout.

    ``acc_nat``: ``(bsz, A, B)`` canonical mod q; ``degrees``: ``(bsz,)``
    int32 mod 2n; ``kv``/``kpre``: ``(L, A, B)`` canonical NTT-domain EVK
    row + Shoup precons (natural four-step order).
    """
    bsz = acc_nat.shape[0]
    A, B = plan.A, plan.B
    # interpret-mode-only XLA-CPU LLVM bug; real TPU runs batch 1 unpadded
    pad1 = bsz == 1 and jax.default_backend() != "tpu"
    if pad1:
        acc_nat = jnp.concatenate([acc_nat, jnp.zeros_like(acc_nat)])
        degrees = jnp.concatenate(
            [jnp.asarray(degrees, jnp.int32).reshape(1), jnp.zeros((1,), jnp.int32)]
        )
        bsz = 2
    if tile_b is None:
        tile_b = int(os.environ.get("NTRU_MXU_TILE", "16"))
    tile_b = _fit_tile(bsz, tile_b)
    R = tile_b * A
    acc2 = acc_nat.reshape(bsz * A, B)
    d_rows = jnp.repeat(jnp.asarray(degrees, jnp.int32), A).reshape(-1, 1)

    kernel = _make_ntru_kernel(plan, basis, tile_b, level)
    tab_names = [
        "w1d", "w2f", "w1mf", "w2m", "t", "tp", "t16", "t16p", "ct", "cb2",
        "ti", "tip", "ti16", "ti16p", "cti", "cbi",
    ]
    tabs = [plan.per_prime[0][nm] for nm in tab_names]

    d_spec = pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((R, B), lambda i: (i, 0), memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec(kv.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    t_specs = [
        pl.BlockSpec(t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for t in tabs
    ]
    out = pl.pallas_call(
        kernel,
        grid=(bsz // tile_b,),
        in_specs=[d_spec, v_spec, k_spec, k_spec] + t_specs,
        out_specs=v_spec,
        out_shape=jax.ShapeDtypeStruct((bsz * A, B), jnp.uint32),
        interpret=jax.default_backend() != "tpu",
    )(d_rows, acc2, kv, kpre, *tabs)
    out = out.reshape(bsz, A, B)
    return out[:1] if pad1 else out


def prepare_mxu_evk(ctx, evk_coeff):
    """Coefficient-domain EVK ``(n_lwe, L, N)`` mod q -> MXU-order NTT
    values + precons ``(n_lwe, L, A, B)`` each."""
    from ..numeric.limb import U64
    from .ntt_mxu8 import Mxu8NttPlan64, mxu8_fused_forward64

    log_n = ctx.plan.log_n
    q = ctx.q_int
    A = 1 << (log_n - 7)
    B = 128
    mplan = Mxu8NttPlan64(log_n, q, h1=log_n - 7)
    f = mxu8_fused_forward64(
        mplan, U64(evk_coeff, jnp.zeros_like(evk_coeff)), 1
    ).lo  # canonical [0, q), natural order
    pre = _exact_precon32(f, q)
    shape = f.shape[:-1] + (A, B)
    return f.reshape(shape), pre.reshape(shape)
