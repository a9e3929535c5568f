"""Round-3 probe: where does the fused round-trip kernel's time go?

Three experiments on the real TPU:
  E1  tile/batch sweep of the production rt kernel (harness headroom).
  E2  stage-knockout variants of a copied rt kernel: replace ONE stage
      (twiddle / key-mul / splits / finish) with a near-free placeholder,
      keeping shapes+dtypes; delta vs full ~= that stage's cost.
  E3  VPU op-rate microbench: u32 mul vs add vs shift chains.

Run: python scratch/probe_r3.py [e1|e2|e3|all]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from primus_fhe_tpu.numeric import to_u64_pair
from primus_fhe_tpu.ops.ntt_mxu import (
    MxuNttPlan64,
    _DOT,
    _LIMBS,
    _U32,
    _add64,
    _const64,
    _finish,
    _make_shoup_lazy64,
    _make_shoup_narrow64,
    _mxu_solinas,
    _recombine_half,
    _reduce_once64,
    _split7_list,
    _twiddle,
    mxu_fused_roundtrip64_mul,
)

Q = 1125899906826241
LOG_N = 12
N = 1 << LOG_N


def timeit(fn, *args, r1=64, r2=256, tries=3):
    """difference-of-workloads: seconds for (r2-r1) reps."""
    _ = float(fn(*args, r1))
    _ = float(fn(*args, r2))
    best = None
    for _i in range(tries):
        t0 = time.perf_counter()
        _ = float(fn(*args, r1))
        t1 = time.perf_counter()
        _ = float(fn(*args, r2))
        t2 = time.perf_counter()
        dt = max((t2 - t1) - (t1 - t0), 1e-9)
        best = dt if best is None else min(best, dt)
    return best


def e1(configs=((128, 4), (128, 8), (128, 16), (128, 32),
                (256, 4), (256, 8), (256, 16), (256, 32))):
    rng = np.random.default_rng(7)
    key = rng.integers(0, Q, size=(N,), dtype=np.uint64)
    for batch, tile in configs:
        data = to_u64_pair(rng.integers(0, Q, size=(batch, N), dtype=np.uint64))
        if True:
            try:
                plan = MxuNttPlan64(LOG_N, Q)
                tabs = plan.inverse_mul_tabs(key, tile)

                @jax.jit
                def chained(v, reps, plan=plan, tabs=tabs, tile=tile):
                    def body(_, v):
                        return mxu_fused_roundtrip64_mul(plan, v, tabs, 1, tile)

                    v = jax.lax.fori_loop(0, reps, body, v)
                    return jnp.sum(v.lo ^ v.hi, dtype=jnp.uint32)

                dt = timeit(chained, data)
                rts = (256 - 64) * batch
                print(
                    f"[e1] batch={batch:4d} tile={tile:3d} "
                    f"rt/s={rts/dt/1e6:7.3f}M  modmul/s={rts*(N*LOG_N+N)/dt/1e9:6.1f}e9"
                )
            except Exception as ex:
                print(f"[e1] batch={batch} tile={tile} FAILED {ex!r}")


# ---- E2: knockout rt kernel (copy of _make_rt_kernel with flags) ----------


def _make_rt_kernel_ko(q, A, B, out_factor, tile, ko=()):
    from primus_fhe_tpu.ops.ntt_mxu import _fold28, _sconst

    sol = _mxu_solinas(q)
    shoup = _make_shoup_lazy64(q, exact=False)
    narrow = _make_shoup_narrow64(q)
    n_twid = 8 if sol else 16
    half_bound = (1 << 21) * 8 * max(A, B) * 127 * 127

    cs = tile
    for c in (4, 2, 1):
        if tile % c == 0 and c * A >= 128 and c < tile:
            cs = c
            break
    chunks = tile // cs

    def split(sl, sh):
        if "split" in ko:
            d = sl.astype(jnp.int8)
            return [d] * _LIMBS
        return _split7_list(sl, sh)

    def twiddle(v_lo, v_hi, t_t, t28_t, qc):
        if "twiddle" in ko:
            return _add64(*v_lo, *v_hi)
        if "tscalar" in ko:
            # same arithmetic, scalar-broadcast tables: isolates the cost
            # of the 8 per-element table reads (results wrong)
            sc = _sconst(12345678901234, q)
            return shoup(*_fold28(v_lo, v_hi, sol), *sc, *qc)
        if "tnarrow" in ko:
            # cheaper narrow shoup on the folded value (drops the y3
            # limb paths; results wrong — cost model only)
            return narrow(*_fold28(v_lo, v_hi, sol), *t_t, *qc)
        if "tfold" in ko:
            # fold only, no multiply: isolates the shoup itself
            return _fold28(v_lo, v_hi, sol)
        return _twiddle(sol, shoup, narrow, v_lo, v_hi, t_t, t28_t, qc)

    def finish(v2l, v2h, ofac, qc):
        if "finish" in ko:
            return _add64(*v2l, *v2h)
        return _finish(q, sol, shoup, narrow, v2l, v2h, half_bound, ofac, qc)

    def kernel(w1_ref, w2_ref, w1m_ref, w2m_ref, *rest):
        ft_refs = rest[:8]
        ft28_refs = rest[8:n_twid] if not sol else ()
        it_refs = rest[n_twid : n_twid + 8]
        it28_refs = rest[n_twid + 8 : 2 * n_twid] if not sol else ()
        mul_refs = rest[2 * n_twid : 2 * n_twid + 8]
        vlo_ref, vhi_ref, olo_ref, ohi_ref = rest[2 * n_twid + 8 : 2 * n_twid + 12]
        qc = _const64(q)

        def fwd_chunk(g):
            parts = []
            for p in range(g * cs, (g + 1) * cs):
                sl = vlo_ref[p * A : (p + 1) * A, :]
                sh = vhi_ref[p * A : (p + 1) * A, :]
                parts.append(jnp.concatenate(split(sl, sh), axis=0))
            x8 = jnp.concatenate(parts, axis=1)
            o1 = _DOT(w1_ref[:], x8)
            digs = [o1[c * A : (c + 1) * A, :].astype(_U32) for c in range(_LIMBS)]
            v_lo = _recombine_half(digs[:4])
            v_hi = _recombine_half(digs[4:])
            lanes = slice(g * cs * B, (g + 1) * cs * B)
            t_t = [r[:, lanes] for r in ft_refs]
            t28_t = [r[:, lanes] for r in ft28_refs]
            s2lo, s2hi = twiddle(v_lo, v_hi, t_t, t28_t, qc)
            parts = []
            for p in range(cs):
                sl = s2lo[:, p * B : (p + 1) * B]
                sh = s2hi[:, p * B : (p + 1) * B]
                parts.append(jnp.concatenate(split(sl, sh), axis=1))
            a2 = jnp.concatenate(parts, axis=0)
            o2 = _DOT(a2, w2_ref[:])
            d2 = [o2[:, c * B : (c + 1) * B].astype(_U32) for c in range(_LIMBS)]
            v2l = _recombine_half(d2[:4])
            v2h = _recombine_half(d2[4:])
            return finish(v2l, v2h, 4, qc)

        def inv_chunk(g, flo, fhi):
            rows = slice(g * cs * A, (g + 1) * cs * A)
            if "mul" in ko:
                vlo, vhi = flo, fhi
            else:
                m_t = [r[rows, :] for r in mul_refs]
                vlo, vhi = shoup(flo, fhi, *m_t, *qc)
            parts = []
            for p in range(cs):
                sl = vlo[p * A : (p + 1) * A, :]
                sh = vhi[p * A : (p + 1) * A, :]
                parts.append(jnp.concatenate(split(sl, sh), axis=1))
            x8 = jnp.concatenate(parts, axis=0)
            o1 = _DOT(x8, w1m_ref[:])
            digs = [o1[:, c * B : (c + 1) * B].astype(_U32) for c in range(_LIMBS)]
            v_lo = _recombine_half(digs[:4])
            v_hi = _recombine_half(digs[4:])
            t_t = [r[rows, :] for r in it_refs]
            t28_t = [r[rows, :] for r in it28_refs]
            s2lo, s2hi = twiddle(v_lo, v_hi, t_t, t28_t, qc)
            parts = []
            for p in range(cs):
                sl = s2lo[p * A : (p + 1) * A, :]
                sh = s2hi[p * A : (p + 1) * A, :]
                parts.append(jnp.concatenate(split(sl, sh), axis=0))
            a2 = jnp.concatenate(parts, axis=1)
            o2 = _DOT(w2m_ref[:], a2)
            d2 = [o2[c * A : (c + 1) * A, :].astype(_U32) for c in range(_LIMBS)]
            v2l = _recombine_half(d2[:4])
            v2h = _recombine_half(d2[4:])
            rlo, rhi = finish(v2l, v2h, out_factor, qc)
            olo_ref[rows, :] = jnp.concatenate(
                [rlo[:, p * B : (p + 1) * B] for p in range(cs)], axis=0
            )
            ohi_ref[rows, :] = jnp.concatenate(
                [rhi[:, p * B : (p + 1) * B] for p in range(cs)], axis=0
            )

        for g in range(chunks):
            flo, fhi = fwd_chunk(g)
            inv_chunk(g, flo, fhi)

    return kernel


def run_ko(plan, data_lo, data_hi, key, tile, ko, batch):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    A, B = plan.A, plan.B
    tabs = plan.tiled_tabs(tile) + plan.tiled_tabs_inv(tile) + tuple(
        plan.inverse_mul_tabs(key, tile)
    )
    kernel = _make_rt_kernel_ko(plan.q, A, B, 1, tile, ko)
    bp = batch
    w_spec = lambda s: pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
    val_spec = pl.BlockSpec((tile * A, B), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def call(vlo, vhi):
        return pl.pallas_call(
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
        )(plan.w1f, plan.w2f, plan.w1mf, plan.w2mf, *tabs, vlo, vhi)

    @jax.jit
    def chained(vlo, vhi, reps):
        def body(_, c):
            lo, hi = call(c[0], c[1])
            return (lo, hi)

        lo, hi = jax.lax.fori_loop(0, reps, body, (vlo, vhi))
        return jnp.sum(lo ^ hi, dtype=jnp.uint32)

    dt = timeit(chained, data_lo, data_hi)
    return (256 - 64) * batch / dt


def e2():
    rng = np.random.default_rng(7)
    batch, tile = 128, 8
    plan = MxuNttPlan64(LOG_N, Q)
    A, B = plan.A, plan.B
    d = to_u64_pair(rng.integers(0, Q, size=(batch, N), dtype=np.uint64))
    dlo = jnp.asarray(np.asarray(d.lo).reshape(batch * A, B))
    dhi = jnp.asarray(np.asarray(d.hi).reshape(batch * A, B))
    key = rng.integers(0, Q, size=(N,), dtype=np.uint64)
    base = None
    kos = (
        (),
        ("twiddle",),
        ("mul",),
        ("split",),
        ("finish",),
        ("twiddle", "mul", "split", "finish"),
    )
    if "--twiddle" in sys.argv:
        kos = ((), ("tscalar",), ("tnarrow",), ("tfold",), ("twiddle",), ())
    for ko in kos:
        try:
            rate = run_ko(plan, dlo, dhi, key, tile, ko, batch)
            if not ko:
                base = rate
            msg = f"[e2] ko={','.join(ko) or 'none':28s} rt/s={rate/1e6:7.3f}M"
            if base and ko:
                msg += f"  time_saved={1e9*(1/base - 1/rate):+8.1f} ns/poly"
            print(msg)
        except Exception as ex:
            print(f"[e2] ko={ko} FAILED {ex!r}")


def e3():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C = 256, 1024
    NOPS = 64

    def mk(op):
        def kernel(x_ref, y_ref, o_ref):
            x = x_ref[:]
            y = y_ref[:]
            for _ in range(NOPS):
                # every variant ends in `x = f(x, y)` with f not foldable
                # across iterations (x enters nonlinearly for the muls)
                if op == "mul":
                    x = x * x + y
                elif op == "add":
                    x = (x ^ y) + y
                elif op == "shift":
                    x = ((x >> 1) | (x << 31)) + y
                elif op == "mul16":  # operands held < 2^16
                    x = (x & 0xFFFF) * ((x >> 16) | 1) + y
                elif op == "i8cast":
                    x = (x + y).astype(jnp.int8).astype(jnp.uint32)
            o_ref[:] = x

        def call(x, y):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((R, C), jnp.uint32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, y)

        @jax.jit
        def chained(x, y, reps):
            x = jax.lax.fori_loop(0, reps, lambda _, x: call(x, y), x)
            return jnp.sum(x, dtype=jnp.uint32)

        return chained

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 1 << 32, size=(R, C), dtype=np.uint64).astype(np.uint32))
    y = jnp.asarray(rng.integers(1, 1 << 32, size=(R, C), dtype=np.uint64).astype(np.uint32))
    for op in ("add", "mul", "mul16", "shift", "i8cast"):
        fn = mk(op)
        dt = timeit(fn, x, y, r1=256, r2=1024)
        ops = (1024 - 256) * NOPS * R * C
        print(f"[e3] {op:7s} {ops/dt/1e12:7.3f} Tops/s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"[probe] backend={jax.default_backend()}")
    if which in ("e3", "all"):
        e3()
    if which in ("e2", "all"):
        e2()
    if which in ("e1", "all"):
        e1()
    if which == "e1b":
        e1(
            configs=(
                (256, 16),
                (256, 16),
                (384, 16),
                (512, 16),
                (256, 16),
                (512, 32),
            )
        )
