"""Table-driven byte-radix MXU forward NTT — one program, any modulus.

The fused kernels in :mod:`.ntt_mxu8` close over the modulus as a Python
constant (the analogue of the reference's const-modulus derive macro) —
ideal single-chip, but unusable under ``shard_map`` when the RNS residue
axis is sharded: SPMD runs ONE program on every device while each device
holds a DIFFERENT modulus.  This module is the dynamic-q variant: every
q-dependent quantity (byte matrices, twiddle narrow-Shoup tables,
correction tables, bias words, Barrett/finish constants) is an ARRAY
argument, so the same compiled program transforms any residue whose
tables are fed to it — exactly what the residue-sharded gadget product
(:mod:`..parallel.overlap`) needs to run its per-residue NTTs on the MXU
instead of the XLA-staged path.

Serves both wide byte tiers: **7 planes** for ``2^30 <= q < 2^53`` and
**8 planes** for ``q < 2^62`` — the reference's full AVX-512 range
(``crates/primus_ntt/src/ntt/prime64/avx512/internal.rs:8-32``), so the
residue-sharded production path never falls off the MXU for 60-bit
residue sets.  The 8-plane program carries the 61/62-bit guard
reductions unconditionally (compare-subtracts keeping every pair sum
inside u64), so one compiled program is exact for ANY ``q < 2^62`` fed
to it; a stack mixing tiers is built homogeneously at 8 planes.
Restrictions (asserted at table build): the carry-free 16-bit-group
packing margin per pass and the ``< 2^48`` narrow-Shoup bound on the
recombined halves.  Always takes the general-q narrow-Shoup path (no
Solinas specialization — Solinas folds are shift-by-constant, which
cannot be table-driven); the cost over the static kernel is the second
narrow Shoup per twiddle.

Bit-exact vs the static kernels / golden model
(``tests/test_mxu8_dyn.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..numeric.limb import U64
from .mxu_common import _DOT, _make_shoup_lazy64, _make_shoup_narrow64, _shoup_tabs
from .ntt_mxu8 import Mxu8NttPlan64, _split_bytes_list, _u_bounds
from .ntt_pallas import _add64, _min64, _sub64

_U32 = jnp.uint32


_DUMMY_Q = (1 << 57) - 27  # any non-Solinas int: selects the general
# q*h branch, whose qlo/qhi arrive as ARGUMENTS — so one compiled
# program serves every modulus


def _narrow_dyn():
    """General-q narrow Shoup (y < 2^48), fully table-driven."""
    return _make_shoup_narrow64(_DUMMY_Q)


def _lazy_dyn():
    """General-q full lazy Shoup (any u64 y), fully table-driven."""
    return _make_shoup_lazy64(_DUMMY_Q, exact=False)


def _reduce_once_pair(xlo, xhi, mlo, mhi):
    slo, shi = _sub64(xlo, xhi, mlo, mhi)
    return _min64(xlo, xhi, slo, shi)


class DynMxuTables64:
    """Flat table pack for one modulus: pass to the dyn kernel in order.

    ``tables`` is a tuple of numpy arrays, all shaped ``(A or 1, B)`` or
    matrix-shaped, suitable for stacking over a leading residue axis and
    slicing per device inside ``shard_map``.  ``planes`` (7 or 8) may be
    forced upward so a mixed-tier residue set shares one program."""

    N_TABS = 48

    def __init__(self, log_n: int, q: int, h1: int | None = None,
                 planes: int | None = None):
        base = Mxu8NttPlan64(log_n, q, h1=h1, planes=planes)
        if base.planes not in (7, 8):
            raise ValueError(
                "dyn kernel serves the wide byte tiers (7 planes for "
                "2^30 <= q < 2^53, 8 for q < 2^62); pass planes=7 to "
                "force a smaller modulus in"
            )
        self.log_n, self.q = log_n, q
        self.A, self.B = A, B = base.A, base.B
        self.planes = P = base.planes
        b1 = _u_bounds(base.bias_f1, P)
        b2 = _u_bounds(base.bias_f2, P)
        if P == 7:  # P=8 uses the carrying ladder + full lazy Shoups
            for b in (b1, b2):
                assert b[2] * 257 + (1 << 16) < 1 << 32, "packing margin"
                # recombined halves feed the narrow Shoup (y < 2^48)
                assert b[0] < 1 << 48 and b[1] < 1 << 48, "narrow bound"
        self.bias_f1, self.bias_f2 = base.bias_f1, base.bias_f2
        one = np.ones((1, 1), dtype=np.uint32)

        def pair_c(v: int):
            return (one * np.uint32(v & 0xFFFFFFFF),
                    one * np.uint32((v >> 32) & 0xFFFFFFFF))

        # finish constants as 8-tuple Shoup tables of shape (1, 1)
        s32 = _shoup_tabs(np.array([[(1 << 32) % q]], dtype=object), q)
        s1 = _shoup_tabs(np.array([[1]], dtype=object), q)
        if base.t32_tabs is None:
            # base plan took the Solinas shortcut: build the general-q
            # tables the dyn kernel needs (scaled twiddles + corr*T)
            from .mxu_common import four_step_matrices as _fsm
            from .ntt_mxu8 import _corr_vec as _cv

            h1e = A.bit_length() - 1
            fs = _fsm(log_n, q, h1e, h1e)
            tw = fs["tw"]
            base.t32_tabs = _shoup_tabs((tw * ((1 << 32) % q)) % q, q)
            corr1 = _cv(base.w1f, P, A, base.bias_f1, q)
            cf = np.empty((A, B), dtype=object)
            for r in range(A):
                for k in range(B):
                    cf[r, k] = corr1[r] * tw[r, k] % q
            base.corrt_f = base._pair_tab(cf)
        tabs = (
            (base.w1f, base.w2f)
            + base.t_tabs + base.t32_tabs + base.corrt_f
            + base.corr_f1 + base.corr_f2
            + s32 + s1
            + (one * np.uint32(base.bias_f1), one * np.uint32(base.bias_f2))
            + pair_c(2 * q) + pair_c(4 * q) + pair_c(q)
        )
        self.tables = tuple(np.asarray(t) for t in tabs)
        assert all(isinstance(t, np.ndarray) for t in self.tables)



def _pack_halves(ds, P):
    """Biased digit planes -> (v_lo, v_hi) u64 pairs.

    P=7 uses the carry-free 16-bit-group packing (margins asserted at
    table build).  P=8 serves the whole ``q < 2^62`` tier, whose
    B-contraction digit sums can exceed the carry-free margin for SOME
    moduli — and the program must be sound for every modulus fed to it —
    so it takes the exact carrying ladder unconditionally."""
    if P == 7:
        e01 = ds[0] + (ds[1] << 8)
        e23 = ds[2] + (ds[3] << 8)
        v_lo = _add64(e01, jnp.zeros_like(e01), e23 << 16, e23 >> 16)
        e45 = ds[4] + (ds[5] << 8)
        v_hi = _add64(e45, jnp.zeros_like(e45), ds[6] << 16, ds[6] >> 16)
        return v_lo, v_hi

    def ladder(part):
        r = (part[0], jnp.zeros_like(part[0]))
        for i in range(1, 4):
            sh = 8 * i
            r = _add64(*r, part[i] << sh, part[i] >> (32 - sh))
        return r

    return ladder(ds[:4]), ladder(ds[4:])

def _dyn_fwd_kernel(A: int, B: int, P: int, tile: int, out_factor: int):
    narrow = _narrow_dyn()
    lazy = _lazy_dyn()

    def kernel(*refs):
        (w1_ref, w2_ref) = refs[:2]
        t8 = refs[2:10]
        t32 = refs[10:18]
        ct = refs[18:20]
        c1 = refs[20:22]
        c2 = refs[22:24]
        s32 = refs[24:32]
        s1 = refs[32:40]
        bias1_r, bias2_r = refs[40:42]
        q2 = refs[42:44]
        q4 = refs[44:46]
        q1 = refs[46:48]
        vlo_ref, vhi_ref, olo_ref, ohi_ref = refs[48:]

        bias1 = bias1_r[0, 0]
        bias2 = bias2_r[0, 0]
        q2c = (q2[0][0, 0], q2[1][0, 0])
        q4c = (q4[0][0, 0], q4[1][0, 0])
        q1c = (q1[0][0, 0], q1[1][0, 0])
        # narrow-shoup table args: qlo/qhi as (1,1) broadcasting arrays
        qcl = q1[0][:]
        qch = q1[1][:]

        for p in range(tile):
            sl = vlo_ref[p * A : (p + 1) * A, :]
            sh = vhi_ref[p * A : (p + 1) * A, :]
            x8 = jnp.concatenate(_split_bytes_list(sl, sh, P), axis=0)
            o1 = _DOT(w1_ref[:], x8)  # (PA, B) rows (c, r0)
            digs = [o1[c * A : (c + 1) * A, :] for c in range(P)]
            ds = [d.astype(_U32) + bias1 for d in digs]
            v_lo, v_hi = _pack_halves(ds, P)
            # twiddle: two Shoups + corr*T table.  P=8 must use the full
            # lazy Shoup: the 8-plane B-contraction halves can prove past
            # narrow's y < 2^48 contract for some moduli in the tier.
            tmul = narrow if P == 7 else lazy
            m1 = tmul(v_lo[0], v_lo[1], t8[0][:], t8[1][:], t8[2][:],
                      t8[3][:], t8[4][:], t8[5][:], t8[6][:], t8[7][:],
                      qcl, qch)
            m2 = tmul(v_hi[0], v_hi[1], t32[0][:], t32[1][:], t32[2][:],
                      t32[3][:], t32[4][:], t32[5][:], t32[6][:],
                      t32[7][:], qcl, qch)
            if P == 8:  # 61/62-bit guards: keep every pair sum inside u64
                m1 = _reduce_once_pair(*m1, *q2c)
                m2 = _reduce_once_pair(*m2, *q2c)
                s = _reduce_once_pair(*_add64(*m1, *m2), *q2c)
            else:
                s = _reduce_once_pair(*_add64(*m1, *m2), *q4c)
            s2lo, s2hi = _add64(*s, ct[0][:], ct[1][:])  # < 5q (P=7: < 2^56)
            a2 = jnp.concatenate(_split_bytes_list(s2lo, s2hi, P), axis=1)
            o2 = _DOT(a2, w2_ref[:])  # (A, PB) cols (c, r1)
            d2 = [o2[:, c * B : (c + 1) * B] for c in range(P)]
            ds2 = [d.astype(_U32) + bias2 for d in d2]
            v2l, v2h = _pack_halves(ds2, P)
            fmul = narrow if P == 7 else lazy
            mh = fmul(v2h[0], v2h[1], s32[0][:], s32[1][:], s32[2][:],
                      s32[3][:], s32[4][:], s32[5][:], s32[6][:],
                      s32[7][:], qcl, qch)
            if P == 8:  # guard: t = v2l + mh + c2 must stay inside u64
                mh = _reduce_once_pair(*mh, *q2c)
            t = _add64(*_add64(*v2l, *mh), c2[0][:], c2[1][:])
            # t < 2^48 + 4q + q can exceed the narrow bound: full lazy
            rlo, rhi = lazy(t[0], t[1], s1[0][:], s1[1][:], s1[2][:],
                            s1[3][:], s1[4][:], s1[5][:], s1[6][:],
                            s1[7][:], qcl, qch)  # Barrett, [0,4q)
            if out_factor <= 2:
                rlo, rhi = _reduce_once_pair(rlo, rhi, *q2c)
            if out_factor == 1:
                rlo, rhi = _reduce_once_pair(rlo, rhi, *q1c)
            rows = slice(p * A, (p + 1) * A)
            olo_ref[rows, :] = rlo
            ohi_ref[rows, :] = rhi

    return kernel


# number of table args before the two value arrays
_N_TABLE_ARGS = 2 + 8 + 8 + 2 + 2 + 2 + 8 + 8 + 2 + 6


def mxu8_dyn_forward64(
    tables, shapes, values: U64, out_factor: int = 1, tile: int = 8
) -> U64:
    """Forward NTT with runtime tables.

    ``tables``: the ``DynMxuTables64.tables`` tuple (jnp or numpy arrays
    — under ``shard_map`` these are the per-device slices of stacked
    residue tables); ``shapes``: ``(log_n, A, B[, planes])`` static ints
    (planes defaults to 7 for older callers).  Output order/contract
    identical to :func:`..ntt_mxu8.mxu8_fused_forward64`.
    """
    log_n, A, B = shapes[:3]
    n = 1 << log_n
    P = shapes[3] if len(shapes) > 3 else 7
    vlo, vhi = values.lo, values.hi
    batch_shape = vlo.shape[:-1]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    vlo = vlo.reshape(b, n)
    vhi = vhi.reshape(b, n)
    tile = max(1, min(tile, b))
    pad = (-b) % tile
    if pad:
        vlo = jnp.concatenate([vlo, jnp.zeros((pad, n), _U32)])
        vhi = jnp.concatenate([vhi, jnp.zeros((pad, n), _U32)])
    bp = b + pad

    kernel = _dyn_fwd_kernel(A, B, P, tile, out_factor)
    w_spec = lambda s: pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((tile * A, B), lambda i: (i, 0), memory_space=pltpu.VMEM)
    olo, ohi = pl.pallas_call(
        kernel,
        grid=(bp // tile,),
        in_specs=[w_spec(np.shape(t)) for t in tables] + [v_spec] * 2,
        out_specs=[v_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((bp * A, B), jnp.uint32)] * 2,
        interpret=jax.default_backend() != "tpu",
    )(*tables, vlo.reshape(bp * A, B), vhi.reshape(bp * A, B))
    olo = olo.reshape(bp, n)[:b].reshape(*batch_shape, n)
    ohi = ohi.reshape(bp, n)[:b].reshape(*batch_shape, n)
    return U64(olo, ohi)


def _stack_planes(moduli) -> int:
    """Homogeneous plane count for a residue set: every table in a stack
    must feed the SAME compiled program, so a set mixing the 7- and
    8-plane tiers builds everything at 8 planes."""
    from .ntt_mxu8 import _planes_for

    return max(max(_planes_for(int(q)), 7) for q in moduli)


def stack_dyn_tables(log_n: int, moduli) -> tuple:
    """Stacked per-residue tables ``(m, ...)`` ready for sharding over
    the residue axis (each table gains a leading residue dim)."""
    planes = _stack_planes(moduli)
    packs = [DynMxuTables64(log_n, int(q), planes=planes) for q in moduli]
    n_t = len(packs[0].tables)
    out = []
    for i in range(n_t):
        out.append(np.stack([p.tables[i] for p in packs]))
    shapes = (log_n, packs[0].A, packs[0].B, planes)
    return tuple(out), shapes


# ---------------------------------------------------------------------------
# Dynamic-q inverse (mirror of the forward; optional fused pointwise mul)
# ---------------------------------------------------------------------------


class DynMxuInvTables64:
    """Inverse-direction table pack (same philosophy as
    :class:`DynMxuTables64`): mirrored matrices, inverse twiddle group,
    corrections, finish constants — all array arguments."""

    def __init__(self, log_n: int, q: int, h1: int | None = None,
                 planes: int | None = None):
        base = Mxu8NttPlan64(log_n, q, h1=h1, planes=planes)
        if base.planes not in (7, 8):
            raise ValueError("dyn kernel serves the 7/8-plane wide tiers")
        self.log_n, self.q = log_n, q
        self.A, self.B = A, B = base.Ai, base.Bi
        self.planes = P = base.planes
        b1 = _u_bounds(base.bias_i1, P)
        b2 = _u_bounds(base.bias_i2, P)
        if P == 7:  # P=8 uses the carrying ladder + full lazy Shoups
            for b in (b1, b2):
                assert b[2] * 257 + (1 << 16) < 1 << 32, "packing margin"
                assert b[0] < 1 << 48 and b[1] < 1 << 48, "narrow bound"
        self.bias_i1, self.bias_i2 = base.bias_i1, base.bias_i2
        one = np.ones((1, 1), dtype=np.uint32)

        def pair_c(v: int):
            return (one * np.uint32(v & 0xFFFFFFFF),
                    one * np.uint32((v >> 32) & 0xFFFFFFFF))

        s32 = _shoup_tabs(np.array([[(1 << 32) % q]], dtype=object), q)
        s1 = _shoup_tabs(np.array([[1]], dtype=object), q)
        if base.tim32_tabs is None:
            from .mxu_common import four_step_matrices as _fsm
            from .ntt_mxu8 import _corr_vec as _cv, _byte_matrix as _bm

            h1e = A.bit_length() - 1
            fs = _fsm(log_n, q, h1e, h1e)
            twi = fs["twi"]
            base.tim32_tabs = _shoup_tabs((twi * ((1 << 32) % q)) % q, q)
            w1m = _bm(fs["m2i"], q, P)
            corr1i = _cv(w1m, P, B, base.bias_i1, q)
            ci = np.empty((A, B), dtype=object)
            for r in range(A):
                for k in range(B):
                    ci[r, k] = corr1i[k] * twi[r, k] % q
            base.corrt_i = base._pair_tab(ci)
        tabs = (
            (base.w1mf, base.w2mf)
            + base.tim_tabs + base.tim32_tabs + base.corrt_i
            + base.corr_i1 + base.corr_i2
            + s32 + s1
            + (one * np.uint32(base.bias_i1), one * np.uint32(base.bias_i2))
            + pair_c(2 * q) + pair_c(4 * q) + pair_c(q)
        )
        self.tables = tuple(np.asarray(t) for t in tabs)


def _dyn_inv_kernel(A: int, B: int, P: int, tile: int, out_factor: int,
                    n_mul: int):
    narrow = _narrow_dyn()
    lazy = _lazy_dyn()

    def kernel(*refs):
        (w1m_ref, w2m_ref) = refs[:2]
        t8 = refs[2:10]
        t32 = refs[10:18]
        ct = refs[18:20]
        c1 = refs[20:22]
        c2 = refs[22:24]
        s32 = refs[24:32]
        s1 = refs[32:40]
        bias1_r, bias2_r = refs[40:42]
        q2 = refs[42:44]
        q4 = refs[44:46]
        q1 = refs[46:48]
        mul = refs[48 : 48 + n_mul]
        vlo_ref, vhi_ref, olo_ref, ohi_ref = refs[48 + n_mul :]

        bias1 = bias1_r[0, 0]
        bias2 = bias2_r[0, 0]
        q2c = (q2[0][0, 0], q2[1][0, 0])
        q4c = (q4[0][0, 0], q4[1][0, 0])
        q1c = (q1[0][0, 0], q1[1][0, 0])
        qcl = q1[0][:]
        qch = q1[1][:]

        for p in range(tile):
            vl = vlo_ref[p * A : (p + 1) * A, :]
            vh = vhi_ref[p * A : (p + 1) * A, :]
            if n_mul:
                vl, vh = lazy(vl, vh, mul[0][:], mul[1][:], mul[2][:],
                              mul[3][:], mul[4][:], mul[5][:], mul[6][:],
                              mul[7][:], qcl, qch)
            x8 = jnp.concatenate(_split_bytes_list(vl, vh, P), axis=1)
            o1 = _DOT(x8, w1m_ref[:])  # (A, PB) cols (c, k0)
            digs = [o1[:, c * B : (c + 1) * B] for c in range(P)]
            ds = [d.astype(_U32) + bias1 for d in digs]
            v_lo, v_hi = _pack_halves(ds, P)
            tmul = narrow if P == 7 else lazy  # see forward kernel note
            m1 = tmul(v_lo[0], v_lo[1], t8[0][:], t8[1][:], t8[2][:],
                      t8[3][:], t8[4][:], t8[5][:], t8[6][:], t8[7][:],
                      qcl, qch)
            m2 = tmul(v_hi[0], v_hi[1], t32[0][:], t32[1][:], t32[2][:],
                      t32[3][:], t32[4][:], t32[5][:], t32[6][:],
                      t32[7][:], qcl, qch)
            if P == 8:  # 61/62-bit guards: keep every pair sum inside u64
                m1 = _reduce_once_pair(*m1, *q2c)
                m2 = _reduce_once_pair(*m2, *q2c)
                s = _reduce_once_pair(*_add64(*m1, *m2), *q2c)
            else:
                s = _reduce_once_pair(*_add64(*m1, *m2), *q4c)
            s2lo, s2hi = _add64(*s, ct[0][:], ct[1][:])  # < 5q (P=7: < 2^56)
            a2 = jnp.concatenate(_split_bytes_list(s2lo, s2hi, P), axis=0)
            o2 = _DOT(w2m_ref[:], a2)  # (PA, B) rows (c, k1)
            d2 = [o2[c * A : (c + 1) * A, :] for c in range(P)]
            ds2 = [d.astype(_U32) + bias2 for d in d2]
            v2l, v2h = _pack_halves(ds2, P)
            fmul = narrow if P == 7 else lazy
            mh = fmul(v2h[0], v2h[1], s32[0][:], s32[1][:], s32[2][:],
                      s32[3][:], s32[4][:], s32[5][:], s32[6][:],
                      s32[7][:], qcl, qch)
            if P == 8:  # guard: t = v2l + mh + c2 must stay inside u64
                mh = _reduce_once_pair(*mh, *q2c)
            t = _add64(*_add64(*v2l, *mh), c2[0][:], c2[1][:])
            rlo, rhi = lazy(t[0], t[1], s1[0][:], s1[1][:], s1[2][:],
                            s1[3][:], s1[4][:], s1[5][:], s1[6][:],
                            s1[7][:], qcl, qch)  # Barrett, [0,4q)
            if out_factor <= 2:
                rlo, rhi = _reduce_once_pair(rlo, rhi, *q2c)
            if out_factor == 1:
                rlo, rhi = _reduce_once_pair(rlo, rhi, *q1c)
            rows = slice(p * A, (p + 1) * A)
            olo_ref[rows, :] = rlo
            ohi_ref[rows, :] = rhi

    return kernel


def mxu8_dyn_inverse64(
    tables, shapes, values: U64, out_factor: int = 1, mul_tabs=(),
    tile: int = 8,
) -> U64:
    """Inverse NTT with runtime tables (``DynMxuInvTables64.tables``);
    ``mul_tabs`` (8 Shoup tables, ``(A, B)``) fuses ``INTT(values * key)``
    — also table-driven, so the key can differ per device/residue.
    Contract of :func:`..ntt_mxu8.mxu8_fused_inverse64[_mul]`."""
    log_n, A, B = shapes[:3]
    n = 1 << log_n
    P = shapes[3] if len(shapes) > 3 else 7
    vlo, vhi = values.lo, values.hi
    batch_shape = vlo.shape[:-1]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    vlo = vlo.reshape(b, n)
    vhi = vhi.reshape(b, n)
    tile = max(1, min(tile, b))
    pad = (-b) % tile
    if pad:
        vlo = jnp.concatenate([vlo, jnp.zeros((pad, n), _U32)])
        vhi = jnp.concatenate([vhi, jnp.zeros((pad, n), _U32)])
    bp = b + pad

    kernel = _dyn_inv_kernel(A, B, P, tile, out_factor, len(mul_tabs))
    w_spec = lambda s: pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((tile * A, B), lambda i: (i, 0), memory_space=pltpu.VMEM)
    all_tabs = tuple(tables) + tuple(mul_tabs)
    olo, ohi = pl.pallas_call(
        kernel,
        grid=(bp // tile,),
        in_specs=[w_spec(np.shape(t)) for t in all_tabs] + [v_spec] * 2,
        out_specs=[v_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((bp * A, B), jnp.uint32)] * 2,
        interpret=jax.default_backend() != "tpu",
    )(*all_tabs, vlo.reshape(bp * A, B), vhi.reshape(bp * A, B))
    olo = olo.reshape(bp, n)[:b].reshape(*batch_shape, n)
    ohi = ohi.reshape(bp, n)[:b].reshape(*batch_shape, n)
    return U64(olo, ohi)


def stack_dyn_inv_tables(log_n: int, moduli) -> tuple:
    """Stacked per-residue inverse tables ``(m, ...)``."""
    planes = _stack_planes(moduli)
    packs = [DynMxuInvTables64(log_n, int(q), planes=planes) for q in moduli]
    out = []
    for i in range(len(packs[0].tables)):
        out.append(np.stack([p.tables[i] for p in packs]))
    shapes = (log_n, packs[0].A, packs[0].B, planes)
    return tuple(out), shapes
