"""Probe: pass-2 restack strategies for the fused MXU four-step NTT.

Run ON TPU (no other TPU process).  Compares modes:
  loop     — current per-poly dot (baseline)
  concat   — restack via sublane concat into one (tile*A, 8B) dot
  scratch  — restack via VMEM scratch stores into one dot
  p1only   — pass 1 + twiddle only (stage-split diagnostics)
Each at tile in {4, 8, 16} and (A,B) splits {default, 32x128}.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from primus_fhe_tpu.numeric import to_u64_pair
from primus_fhe_tpu.numeric.limb import U64
from primus_fhe_tpu.ops.ntt_mxu import (
    MxuNttPlan64,
    _LIMBS,
    _pad_batch,
    _recombine_half,
    _split7_list,
)
from primus_fhe_tpu.ops.ntt_pallas import (
    _add64,
    _const64,
    _make_shoup_lazy64,
    _reduce_once64,
)

_U32 = jnp.uint32


def make_kernel(q, A, B, out_factor, tile, mode):
    import jax.lax as lax

    shoup = _make_shoup_lazy64(q, exact=False)
    dot = functools.partial(
        lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    def kernel(w1_ref, w2_ref, *rest):
        t_refs = rest[:8]
        t28_refs = rest[8:16]
        vlo_ref, vhi_ref, olo_ref, ohi_ref = rest[16:20]
        scratch = rest[20] if len(rest) > 20 else None
        qc = _const64(q)

        vlo = vlo_ref[:]
        vhi = vhi_ref[:]
        x8 = jnp.concatenate(_split7_list(vlo, vhi), axis=0)
        o1 = dot(w1_ref[:], x8)
        digs = [o1[c * A : (c + 1) * A, :].astype(_U32) for c in range(_LIMBS)]
        v_lo = _recombine_half(digs[:4])
        v_hi = _recombine_half(digs[4:])

        t_t = [r[:] for r in t_refs]
        t28_t = [r[:] for r in t28_refs]
        m1 = shoup(*v_lo, *t_t, *qc)
        m2 = shoup(*v_hi, *t28_t, *qc)
        s2lo, s2hi = _add64(*m1, *m2)

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

        if mode == "p1only":
            olo_ref[:] = jnp.tile(s2lo, (tile, 1))[:, :B]
            ohi_ref[:] = jnp.tile(s2hi, (tile, 1))[:, :B]
            return

        def finish(o2, rows):
            # o2: (rows, 8B) digit cols (c, r1)
            d2 = [o2[:, c * B : (c + 1) * B].astype(_U32) for c in range(_LIMBS)]
            v2l = _recombine_half(d2[:4])
            v2h = _recombine_half(d2[4:])
            mh = shoup(*v2h, *k28_tabs, *qc)
            tlo, thi = _add64(*v2l, *mh)
            rlo, rhi = shoup(tlo, thi, *one_tabs, *qc)
            if out_factor <= 2:
                rlo, rhi = _reduce_once64(rlo, rhi, *_const64(2 * q))
            if out_factor == 1:
                rlo, rhi = _reduce_once64(rlo, rhi, *qc)
            return rlo, rhi

        if mode == "loop":
            for p in range(tile):
                sl = s2lo[:, p * B : (p + 1) * B]
                sh = s2hi[:, p * B : (p + 1) * B]
                a2 = jnp.concatenate(_split7_list(sl, sh), axis=1)
                o2 = dot(a2, w2_ref[:])
                rlo, rhi = finish(o2, A)
                olo_ref[p * A : (p + 1) * A, :] = rlo
                ohi_ref[p * A : (p + 1) * A, :] = rhi
        elif mode == "concat":
            parts = []
            for p in range(tile):
                sl = s2lo[:, p * B : (p + 1) * B]
                sh = s2hi[:, p * B : (p + 1) * B]
                parts.append(jnp.concatenate(_split7_list(sl, sh), axis=1))
            a2 = jnp.concatenate(parts, axis=0)  # (tile*A, 8B)
            o2 = dot(a2, w2_ref[:])
            rlo, rhi = finish(o2, tile * A)
            olo_ref[:] = rlo
            ohi_ref[:] = rhi
        elif mode == "scratch":
            for p in range(tile):
                sl = s2lo[:, p * B : (p + 1) * B]
                sh = s2hi[:, p * B : (p + 1) * B]
                limbs = _split7_list(sl, sh)
                for l in range(_LIMBS):
                    scratch[p * A : (p + 1) * A, l * B : (l + 1) * B] = limbs[l]
            o2 = dot(scratch[:], w2_ref[:])
            rlo, rhi = finish(o2, tile * A)
            olo_ref[:] = rlo
            ohi_ref[:] = rhi
        else:
            raise ValueError(mode)

    return kernel


def fused_fwd(plan, values, out_factor, tile, mode):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q = plan.q
    n, A, B = plan.n, plan.A, plan.B
    vlo, vhi, batch_shape, b, bp, tile = _pad_batch(values, n, tile)

    def to_kernel_layout(x):
        return x.reshape(bp, A, B).transpose(1, 0, 2).reshape(A, bp * B)

    kernel = make_kernel(q, A, B, out_factor, tile, mode)
    grid = (bp // tile,)
    w_spec = lambda s: pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
    val_spec = pl.BlockSpec((A, tile * B), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile * A, B), lambda i: (i, 0), memory_space=pltpu.VMEM)
    scratch = []
    if mode == "scratch":
        scratch = [pltpu.VMEM((tile * A, _LIMBS * B), jnp.int8)]
    olo, ohi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            w_spec((A * _LIMBS, A * _LIMBS)),
            w_spec((B * _LIMBS, B * _LIMBS)),
        ]
        + [w_spec((A, tile * B))] * 16
        + [val_spec] * 2,
        out_specs=[out_spec] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((bp * A, B), jnp.uint32),
            jax.ShapeDtypeStruct((bp * A, B), jnp.uint32),
        ],
        scratch_shapes=scratch,
    )(plan.w1f, plan.w2f, *plan.tiled_tabs(tile), to_kernel_layout(vlo), to_kernel_layout(vhi))
    olo = olo.reshape(bp, n)[:b].reshape(*batch_shape, n)
    ohi = ohi.reshape(bp, n)[:b].reshape(*batch_shape, n)
    return U64(olo, ohi)


def timeit(fn, data, r1=64, r2=512):
    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained(v, reps):
        def body(_, v):
            return fn(v)

        v = jax.lax.fori_loop(0, reps, body, v)
        return jnp.sum(v.lo ^ v.hi, dtype=jnp.uint32)

    _ = float(chained(data, r1))
    _ = float(chained(data, r2))
    t0 = time.perf_counter()
    _ = float(chained(data, r1))
    t1 = time.perf_counter()
    _ = float(chained(data, r2))
    t2 = time.perf_counter()
    return max((t2 - t1) - (t1 - t0), 1e-9) / (r2 - r1)


def main():
    log_n = 12
    n = 1 << log_n
    q = 1125899906826241
    batch = 64
    rng = np.random.default_rng(7)
    raw = rng.integers(0, q, size=(batch, n), dtype=np.uint64)
    data = to_u64_pair(raw)

    from primus_fhe_tpu.golden.model import GoldenNtt

    g = GoldenNtt(log_n, q)
    want = np.stack([g.forward(raw[i]) for i in range(4)])

    plans = {
        "h1=6(64x64)": MxuNttPlan64(log_n, q),
        "h1=5(32x128)": MxuNttPlan64(log_n, q, h1=5),
    }
    modmul = batch * (n // 2) * log_n

    for pname, plan in plans.items():
        for mode in ("loop", "concat", "scratch", "p1only"):
            for tile in (4, 8, 16):
                if tile * plan.A > 1024:
                    continue
                try:
                    fn = lambda v: fused_fwd(plan, v, 4, tile, mode)
                    out = fn(data)
                    if mode != "p1only":
                        got = np.asarray(out.lo[:4], dtype=np.uint64) | (
                            np.asarray(out.hi[:4], dtype=np.uint64) << np.uint64(32)
                        )
                        ok = bool(np.all(got % q == want % q))
                    else:
                        ok = True
                    dt = timeit(fn, data)
                    print(
                        f"{pname:14s} {mode:8s} tile={tile:2d}  "
                        f"{modmul/dt/1e9:7.2f}e9 modmul/s  ok={ok}",
                        flush=True,
                    )
                except Exception as e:
                    msg = str(e).split("\n")[0][:110]
                    print(f"{pname:14s} {mode:8s} tile={tile:2d}  FAIL: {msg}", flush=True)


if __name__ == "__main__":
    main()
