#!/usr/bin/env python
"""Timing-only breakdown of the fused fwd kernel: disable stages one at a
time (results are WRONG; only the timing matters).  Also probe u8xs8 dot."""
import sys, time, functools
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from primus_fhe_tpu.numeric import to_u64_pair
from primus_fhe_tpu.ops import ntt_mxu as M

log_n, q = 12, 1125899906826241
n = 1 << log_n
A, B = 32, 128
tile = 16
batch = 128
rng = np.random.default_rng(7)
data = to_u64_pair(rng.integers(0, q, size=(batch, n), dtype=np.uint64))
plan = M.MxuNttPlan64(log_n, q)

_DOT = M._DOT
_LIMBS = 8
_U32 = jnp.uint32


def make_kernel(mode):
    sol = M._mxu_solinas(q)
    shoup = M._make_shoup_lazy64(q, exact=False)
    narrow = M._make_shoup_narrow64(q)
    half_bound = (1 << 21) * 8 * max(A, B) * 127 * 127
    cs = 4
    chunks = tile // cs

    def kernel(w1_ref, w2_ref, *rest):
        t_refs = rest[:8]
        vlo_ref, vhi_ref, olo_ref, ohi_ref = rest[8:12]
        qc = M._const64(q)

        def stage1(g):
            if mode == "nosplit1":
                # cheap dummy: broadcast one int8 plane (timing only)
                sl = vlo_ref[g * cs * A : (g + 1) * cs * A, :]
                x8 = jnp.tile((sl & 127).astype(jnp.int8).reshape(cs * A, B)[:A*8//8].repeat(8, 0)[:8*A], (1, cs))
                x8 = x8[:8*A, :cs*B]
                return _DOT(w1_ref[:], x8)
            parts = []
            for p in range(g * cs, (g + 1) * cs):
                sl = vlo_ref[p * A : (p + 1) * A, :]
                sh = vhi_ref[p * A : (p + 1) * A, :]
                parts.append(jnp.concatenate(M._split7_list(sl, sh), axis=0))
            x8 = jnp.concatenate(parts, axis=1)
            return _DOT(w1_ref[:], x8)

        def stage2(g, o1):
            digs = [o1[c * A : (c + 1) * A, :].astype(_U32) for c in range(_LIMBS)]
            v_lo = M._recombine_half(digs[:4])
            v_hi = M._recombine_half(digs[4:])
            lanes = slice(g * cs * B, (g + 1) * cs * B)
            t_t = [r[:, lanes] for r in t_refs]
            if mode == "notwiddle":
                s2lo, s2hi = v_lo  # skip the shoup twiddle entirely
            else:
                s2lo, s2hi = M._twiddle(sol, shoup, narrow, v_lo, v_hi, t_t, (), qc)
            parts = []
            for p in range(cs):
                sl = s2lo[:, p * B : (p + 1) * B]
                sh = s2hi[:, p * B : (p + 1) * B]
                if mode == "nosplit2":
                    parts.append(jnp.tile((sl & 127).astype(jnp.int8), (1, 8))[:, :8*B])
                else:
                    parts.append(jnp.concatenate(M._split7_list(sl, sh), axis=1))
            a2 = jnp.concatenate(parts, axis=0)
            return _DOT(a2, w2_ref[:])

        def stage3(g, o2):
            d2 = [o2[:, c * B : (c + 1) * B].astype(_U32) for c in range(_LIMBS)]
            v2l = M._recombine_half(d2[:4])
            v2h = M._recombine_half(d2[4:])
            if mode == "nofinish":
                rlo, rhi = v2l
            else:
                rlo, rhi = M._finish(q, sol, shoup, narrow, v2l, v2h, half_bound, 4, qc)
            rows = slice(g * cs * A, (g + 1) * cs * A)
            olo_ref[rows, :] = rlo
            ohi_ref[rows, :] = rhi

        if mode == "nodot":
            # skip both matmuls: feed recombine from a fake o1
            for g in range(chunks):
                fake = jnp.zeros((8 * A, cs * B), jnp.int32)
                o2 = stage2(g, fake)
                stage3(g, o2)
            return
        o1s = [stage1(g) for g in range(chunks)]
        o2s = [stage2(g, o1) for g, o1 in enumerate(o1s)]
        for g, o2 in enumerate(o2s):
            stage3(g, o2)

    return kernel


def run_mode(mode):
    kern = make_kernel(mode)
    tabs = plan.tiled_tabs(tile)

    @jax.jit
    def step(v):
        vlo, vhi, bs, b, bp, t = M._pad_batch(v, n, tile)
        olo, ohi = M._natural_call(
            kern, len(tabs), A, B, plan.w1f, plan.w2f, tabs,
            vlo.reshape(bp * A, B), vhi.reshape(bp * A, B), bp, t)
        from primus_fhe_tpu.numeric.limb import U64
        return U64(olo.reshape(bp, n)[:b], ohi.reshape(bp, n)[:b])

    @jax.jit
    def chained(v, reps):
        v = jax.lax.fori_loop(0, reps, lambda _, v: step(v), v)
        return jnp.sum(v.lo ^ v.hi, dtype=jnp.uint32)

    r1, r2 = 64, 512
    _ = float(chained(data, r1)); print("  compiled+warm", flush=True); _ = float(chained(data, r2))
    best = None
    for _i in range(3):
        t0 = time.perf_counter(); _ = float(chained(data, r1))
        t1 = time.perf_counter(); _ = float(chained(data, r2))
        t2 = time.perf_counter()
        dt = max((t2 - t1) - (t1 - t0), 1e-9)
        best = dt if best is None else min(best, dt)
    rate = (r2 - r1) * batch / best
    print(f"mode={mode:10s}: {rate/1e6:.3f}M polys/s", flush=True)


import os
modes = sys.argv[1:] or ["full"]
for mode in modes:
    print(f"compiling {mode}...", flush=True)
    run_mode(mode)

if "u8" not in (sys.argv[1:] or []):
    sys.exit(0)
# ---- u8 x s8 dot support probe ----
def u8dot_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

try:
    a = jnp.asarray(rng.integers(0, 256, (256, 256)), jnp.uint8)
    bmat = jnp.asarray(rng.integers(-128, 128, (256, 256)), jnp.int8)
    out = pl.pallas_call(
        u8dot_kernel,
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(a, bmat)
    ref = np.asarray(a, np.int64) @ np.asarray(bmat, np.int64)
    print("u8xs8 dot:", "EXACT" if (np.asarray(out) == ref).all() else "WRONG", flush=True)
except Exception as e:
    print(f"u8xs8 dot: unsupported ({type(e).__name__}: {str(e)[:200]})", flush=True)
