"""Fused CMux front-end kernel: rotate-diff + gadget decompose + CRT lift.

The blind-rotation inner loop spends its non-NTT time in a chain of
HBM-bound elementwise passes:

    acc*X^d - acc  ->  signed digits (L levels)  ->  residues mod each p_i

This kernel runs the whole chain VMEM-resident: accumulator rows are read
once and the per-prime digit residues written once, ready for the NTT
kernels.

Layout lesson (measured): per-ciphertext grid blocks of ``(k+1, N)`` use
2 of 8 sublanes and lose to XLA.  The kernel therefore flattens all
ciphertext components into rows ``(B*(k+1), N)``, tiles ROWS (full
sublane occupancy), and carries the rotation degree as a per-row column
vector — the conditional rolls select per row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_U32 = jnp.uint32


def _mulhi_u32(a, b):
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    m1 = a1 * b0 + ((a0 * b0) >> 16)
    m2 = a0 * b1 + (m1 & 0xFFFF)
    return a1 * b1 + (m1 >> 16) + (m2 >> 16)


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


def _lift_mod_p(x, p: int):
    """Centered lift of a torus-u32 word to ``[0, p)`` (p < 2^30)."""
    ratio = (1 << 64) // p
    r0 = np.uint32(ratio & 0xFFFFFFFF)
    r1 = np.uint32(ratio >> 32)
    c = np.uint32((1 << 32) % p)
    pq = np.uint32(p)
    tmp = _mulhi_u32(x, r0)
    lo, hi = _mul_wide_u32(x, r1)
    s = lo + tmp
    q_hat = hi + (s < lo).astype(_U32)
    r = x - q_hat * pq
    r = jnp.where(r >= pq, r - pq, r)
    neg = (x >> 31) != 0
    r_adj = r - c
    r_adj = jnp.where(r < c, r_adj + pq, r_adj)
    return jnp.where(neg, r_adj, r)


@functools.partial(jax.jit, static_argnames=("basis", "primes", "n", "tile"))
def pallas_cmux_front(acc, degrees, basis, primes: tuple, n: int, tile: int = 32):
    """``(B, k1, n)`` accumulator + ``(B,)`` degrees ->
    ``(kp, B, k1, L, n)`` NTT-ready digit residues of ``acc*X^d - acc``.

    ``basis`` is an ``ApproxSignedBasis32`` over the 2^32 torus (static).
    """
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
    tile = min(tile, rows)
    if rows % tile != 0:
        tile = k1
    grid = (rows // tile,)

    def kernel(d_ref, v_ref, out_ref):
        v0 = v_ref[:]  # (tile, n)
        d = d_ref[:]  # (tile, 1) int32
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        v = v0
        for b in range(n.bit_length()):
            k = 1 << b
            if k == n:
                rolled = jnp.zeros_like(v) - v
            else:
                r = pltpu.roll(v, k, 1)
                wrapped = iota < k
                rolled = jnp.where(wrapped, jnp.zeros_like(r) - r, r)
            take = ((d >> b) & 1) == 1  # (tile, 1) per-row select
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
                out_ref[pi, :, l, :] = _lift_mod_p(digit, p)

    d_spec = pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec(
        (kp, tile, level, n), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[d_spec, v_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((kp, rows, level, n), jnp.uint32),
        interpret=jax.default_backend() != "tpu",
    )(d_rows, acc2)
    return out.reshape(kp, bsz, k1, level, n)
