"""Coefficient-sharded NTT: butterfly exchange over the device mesh.

SURVEY.md §5 scaling axis (b): for polynomials too large for one chip (or
to pipeline many chips over one transform), the coefficient axis shards
over D devices.  The first ``log2 D`` butterfly stages pair elements on
*different* devices — but because the stride ``t`` is then a multiple of
the shard size, each pair sits at the *same local offset* on two devices,
so the exchange is a pure ``ppermute`` by ``t / shard`` device steps over
ICI — no data reshuffling within shards.  All remaining stages are
shard-local and reuse the per-lane expanded root tables, which shard along
the coefficient axis with the data.

Built on ``shard_map`` so the collective schedule is explicit; the jnp
butterfly math is identical to the fused kernels (same tables, same lazy
ranges), so outputs are bit-identical to the single-device transform.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..numeric.limb import mulhi_u32

_U32 = jnp.uint32


def _shoup_lazy32(y, w, wp, q):
    return w * y - q * mulhi_u32(y, wp)


def build_expanded_tables32(log_n: int, q: int):
    """Per-lane expanded forward tables ``(log_n, n)`` (u32 path)."""
    from ..golden.model import GoldenNtt

    g = GoldenNtt(log_n, q)
    n = 1 << log_n

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
    return jnp.asarray(fwd_w), jnp.asarray(fwd_p)


def coeff_sharded_forward32(
    mesh: Mesh,
    axis: str,
    log_n: int,
    q: int,
    values,  # (..., n) sharded on the last axis over `axis`
    tables=None,
):
    """Forward NTT with the coefficient axis sharded over ``mesh[axis]``.

    Returns bit-reversed canonical output with the same sharding.  The
    first ``log2 D`` stages each perform one bidirectional ``ppermute``;
    the rest are local.
    """
    n = 1 << log_n
    d = mesh.shape[axis]
    shard = n // d
    assert shard * d == n and shard >= 1
    log_d = d.bit_length() - 1
    if tables is None:
        tables = build_expanded_tables32(log_n, q)
    fwd_w, fwd_p = tables
    qc = np.uint32(q)
    tqc = np.uint32(2 * q)

    def local_fn(v, w_tab, p_tab):
        # v: (..., shard); w_tab/p_tab: (log_n, shard) local table slices
        dev = jax.lax.axis_index(axis)
        iota = jax.lax.broadcasted_iota(_U32, (1, shard), 1)
        for s in range(log_d):
            t = n >> (s + 1)
            delta = t // shard  # device-step of the partner
            # fetch partner values both directions with one ppermute each
            from_up = jax.lax.ppermute(v, axis, [((i + delta) % d, i) for i in range(d)])
            from_dn = jax.lax.ppermute(v, axis, [((i - delta) % d, i) for i in range(d)])
            is_x = (dev & delta) == 0
            x = jnp.where(is_x, v, from_dn)
            y = jnp.where(is_x, from_up, v)
            w = w_tab[s, :][None]
            wp = p_tab[s, :][None]
            tx = jnp.where(x >= tqc, x - tqc, x)
            mm = _shoup_lazy32(y, w, wp, qc)
            v = jnp.where(is_x, tx + mm, tx + tqc - mm)
        # local stages: roll + mask within the shard
        for s in range(log_d, log_n):
            t = n >> (s + 1)
            is_x = (iota & t) == 0
            w = w_tab[s, :][None]
            wp = p_tab[s, :][None]
            r_m = jnp.roll(v, -t, axis=-1)
            r_p = jnp.roll(v, t, axis=-1)
            x = jnp.where(is_x, v, r_p)
            y = jnp.where(is_x, r_m, v)
            tx = jnp.where(x >= tqc, x - tqc, x)
            mm = _shoup_lazy32(y, w, wp, qc)
            v = jnp.where(is_x, tx + mm, tx + tqc - mm)
        v = jnp.where(v >= tqc, v - tqc, v)
        v = jnp.where(v >= qc, v - qc, v)
        return v

    nd = values.ndim
    spec_v = P(*([None] * (nd - 1) + [axis]))
    spec_t = P(None, axis)
    fn = jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(spec_v, spec_t, spec_t),
            out_specs=spec_v,
        )
    )
    return fn(values, fwd_w, fwd_p)


# ---------------------------------------------------------------------------
# U64 (62-bit-prime) variant
# ---------------------------------------------------------------------------


def build_expanded_tables64(log_n: int, q: int):
    """Per-lane expanded forward tables as U64 pairs ``(log_n, n)``."""
    from ..golden.model import GoldenNtt
    from ..numeric.limb import to_u64_pair

    g = GoldenNtt(log_n, q)
    n = 1 << log_n

    def quot64(w):
        return ((w << 64) // q) & 0xFFFFFFFFFFFFFFFF

    p_idx = np.arange(n)
    fwd_w = np.zeros((log_n, n), dtype=np.uint64)
    fwd_p = np.zeros((log_n, n), dtype=np.uint64)
    for s in range(log_n):
        m = 1 << s
        t = n >> (s + 1)
        idx = m + p_idx // (2 * t)
        fwd_w[s] = [g.roots[i] for i in idx]
        fwd_p[s] = [quot64(g.roots[i]) for i in idx]
    return to_u64_pair(fwd_w), to_u64_pair(fwd_p)


def coeff_sharded_forward64(mesh, axis, log_n, q, values, tables=None):
    """U64 forward NTT with the coefficient axis sharded over the mesh.

    ``values``: :class:`U64` with shape ``(..., n)`` sharded on the last
    axis.  Same structure as the u32 variant: ``log2 D`` ppermute stages,
    then shard-local roll stages; bit-identical to the single-device
    transform.
    """
    from ..numeric.limb import U64

    n = 1 << log_n
    d = mesh.shape[axis]
    shard = n // d
    assert shard * d == n and shard >= 1
    log_d = d.bit_length() - 1
    if tables is None:
        tables = build_expanded_tables64(log_n, q)
    fwd_w, fwd_p = tables
    q_lo = np.uint32(q & 0xFFFFFFFF)
    q_hi = np.uint32((q >> 32) & 0xFFFFFFFF)
    tq_lo = np.uint32((2 * q) & 0xFFFFFFFF)
    tq_hi = np.uint32(((2 * q) >> 32) & 0xFFFFFFFF)

    from ..numeric.limb import (
        u64_add,
        u64_mul_hi,
        u64_mul_lo,
        u64_select,
        u64_sub,
    )
    from ..modular.modops import reduce_once64, reduce_twice64

    def u64c(lo, hi, shape):
        return U64(jnp.full(shape, lo, _U32), jnp.full(shape, hi, _U32))

    def shoup(y, w, wp, qq):
        return u64_sub(u64_mul_lo(w, y), u64_mul_lo(qq, u64_mul_hi(y, wp)))

    def local_fn(vlo, vhi, wlo, whi, plo, phi):
        v = U64(vlo, vhi)
        dev = jax.lax.axis_index(axis)
        iota = jax.lax.broadcasted_iota(_U32, (1, shard), 1)
        qq = u64c(q_lo, q_hi, (1, 1))
        tq = u64c(tq_lo, tq_hi, (1, 1))

        def butterfly(x, y, w, wp):
            tx = reduce_once64(x, tq)
            mm = shoup(y, w, wp, qq)
            return u64_add(tx, mm), u64_sub(u64_add(tx, tq), mm)

        for s in range(log_d):
            t = n >> (s + 1)
            delta = t // shard
            perm_up = [((i + delta) % d, i) for i in range(d)]
            perm_dn = [((i - delta) % d, i) for i in range(d)]
            from_up = U64(
                jax.lax.ppermute(v.lo, axis, perm_up),
                jax.lax.ppermute(v.hi, axis, perm_up),
            )
            from_dn = U64(
                jax.lax.ppermute(v.lo, axis, perm_dn),
                jax.lax.ppermute(v.hi, axis, perm_dn),
            )
            is_x = (dev & delta) == 0
            x = u64_select(is_x, v, from_dn)
            y = u64_select(is_x, from_up, v)
            w = U64(wlo[s][None], whi[s][None])
            wp = U64(plo[s][None], phi[s][None])
            nx, ny = butterfly(x, y, w, wp)
            v = u64_select(is_x, nx, ny)
        for s in range(log_d, log_n):
            t = n >> (s + 1)
            is_x = (iota & t) == 0
            r_m = U64(jnp.roll(v.lo, -t, -1), jnp.roll(v.hi, -t, -1))
            r_p = U64(jnp.roll(v.lo, t, -1), jnp.roll(v.hi, t, -1))
            x = u64_select(is_x, v, r_p)
            y = u64_select(is_x, r_m, v)
            w = U64(wlo[s][None], whi[s][None])
            wp = U64(plo[s][None], phi[s][None])
            nx, ny = butterfly(x, y, w, wp)
            v = u64_select(is_x, nx, ny)
        v = reduce_twice64(v, qq, tq)
        return v.lo, v.hi

    nd = values.lo.ndim
    spec_v = P(*([None] * (nd - 1) + [axis]))
    spec_t = P(None, axis)
    fn = jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(spec_v, spec_v, spec_t, spec_t, spec_t, spec_t),
            out_specs=(spec_v, spec_v),
        )
    )
    lo, hi = fn(values.lo, values.hi, fwd_w.lo, fwd_w.hi, fwd_p.lo, fwd_p.hi)
    from ..numeric.limb import U64 as _U64

    return _U64(lo, hi)
