#!/usr/bin/env python
"""Round-5 headline probe: is the key-folded middle matrix viable?

Measures, on the real chip, the four quantities that decide whether the
per-r0 folded middle matrix (P1i*diag(K)*P2 — halves fwd-pass2+inv-pass1
MXU volume and kills the fwd finish + key Shoup + one byte split) can
beat the current fused round-trip kernel at n=4096, q=2^50-2^14+1:

  A. current rt kernel trips/s (tile sweep, incl. 256);
  B. matmul-only skeleton of the rt kernel (4 dots + i8 glue) — the
     MXU-bound ceiling;
  C. weight-reload amplification: 32 per-r0 (tile x 896)@(896 x 896)
     int8 dots with DISTINCT weights vs ONE (32*tile x 896)@(896 x 896)
     dot — the MXU cost of the folded middle vs the two big dots it
     replaces;
  D. HBM copy bandwidth — prices the streamed-weights variant
     (25.7 MB of per-r0 tables cannot be VMEM-resident: > 16 MB).

All timings: in-jit fori_loop chaining, min-per-size difference
(CLAUDE.md protocol).
"""
import sys, time, functools
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from primus_fhe_tpu.numeric import to_u64_pair
from primus_fhe_tpu.ops.mxu_common import _DOT
from primus_fhe_tpu.ops.ntt_mxu8 import Mxu8NttPlan64, mxu8_fused_roundtrip64_mul

log_n, q = 12, 1125899906826241
n = 1 << log_n
batch = 512
rng = np.random.default_rng(7)
data = to_u64_pair(rng.integers(0, q, size=(batch, n), dtype=np.uint64))
key = rng.integers(0, q, size=(n,), dtype=np.uint64)


def timeit_chain_t(make_step, init, label, r1=8, r2=40, tries=3):
    """Chained timing with an explicit tuple carry."""
    @jax.jit
    def cal(v, reps):
        v = jax.lax.fori_loop(0, reps, lambda _, x: make_step(x), v)
        return jnp.sum(v[0] ^ v[1], dtype=jnp.uint32)

    _ = float(cal(init, r1)); _ = float(cal(init, r2))
    t1s, t2s = [], []
    for _ in range(tries):
        t0 = time.perf_counter(); _ = float(cal(init, r1)); t1 = time.perf_counter()
        _ = float(cal(init, r2)); t2 = time.perf_counter()
        t1s.append(t1 - t0); t2s.append(t2 - t1)
    dt = (min(t2s) - min(t1s)) / (r2 - r1)
    print(f"[probe] {label}: {dt*1e6:.1f} us/rep", file=sys.stderr, flush=True)
    return dt


def timeit_chain(make_step, label, r1=8, r2=40, tries=3):
    """Chained fori_loop timing; returns seconds per rep."""
    @jax.jit
    def cal(v, reps):
        v = jax.lax.fori_loop(0, reps, lambda _, x: make_step(x), v)
        return jnp.sum(v[0] ^ v[1], dtype=jnp.uint32) if isinstance(v, tuple) else jnp.sum(v.lo ^ v.hi, dtype=jnp.uint32)

    _ = float(cal(data, r1)); _ = float(cal(data, r2))
    t1s, t2s = [], []
    for _ in range(tries):
        t0 = time.perf_counter(); _ = float(cal(data, r1)); t1 = time.perf_counter()
        _ = float(cal(data, r2)); t2 = time.perf_counter()
        t1s.append(t1 - t0); t2s.append(t2 - t1)
    dt = (min(t2s) - min(t1s)) / (r2 - r1)
    print(f"[probe] {label}: {dt*1e6:.1f} us/rep ({batch/dt:.0f} polys/s-batch)",
          file=sys.stderr, flush=True)
    return dt


def part_a():
    plan = Mxu8NttPlan64(log_n, q)
    tabs = plan.inverse_mul_tabs(key, 0)
    out = {}
    for t in (32, 64, 128, 256):
        try:
            step = lambda v, t=t: mxu8_fused_roundtrip64_mul(plan, v, tabs, 1, t)
            dt = timeit_chain(step, f"rt tile={t}")
            out[t] = dt
        except Exception as e:
            print(f"[probe] rt tile={t} failed: {e!r}", file=sys.stderr)
    best = min(out.values())
    mm = batch * (n * log_n + n) / best
    print(f"[probe] A: best rt {best*1e6:.1f} us/batch -> {mm/1e9:.1f}e9 modmul/s")
    return best


def part_b():
    """Matmul-only skeleton: same 4 dots/chunk as the rt kernel, byte glue
    only (results wrong; timing only)."""
    plan = Mxu8NttPlan64(log_n, q)
    A, B, P = plan.A, plan.B, plan.planes
    tile = 32
    cs, chunks = 16, 2
    w1 = jnp.asarray(plan.w1f); w2 = jnp.asarray(plan.w2f)
    w1m = jnp.asarray(plan.w1mf); w2m = jnp.asarray(plan.w2mf)

    def kernel(w1_ref, w2_ref, w1m_ref, w2m_ref, vlo_ref, vhi_ref, olo_ref, ohi_ref):
        for g in range(chunks):
            rows = slice(g * cs * A, (g + 1) * cs * A)
            sl = vlo_ref[rows, :]
            parts = []
            for p in range(cs):
                blk = sl[p * A:(p + 1) * A, :]
                parts.append(jnp.concatenate(
                    [(blk >> (8 * (i % 4))).astype(jnp.int8) for i in range(P)], axis=0))
            x8 = jnp.concatenate(parts, axis=1)          # (PA, cs*B)
            o1 = _DOT(w1_ref[:], x8)
            # re-split o1 cheaply (wrong values, right shapes)
            a2 = jnp.concatenate(
                [jnp.concatenate([(o1[c * A:(c + 1) * A, i * B:(i + 1) * B] & 127).astype(jnp.int8)
                                  for c in range(P)], axis=1) for i in range(cs)], axis=0)  # (cs*A, PB)
            o2 = _DOT(a2, w2_ref[:])
            x3 = jnp.concatenate(
                [jnp.concatenate([(o2[i * A:(i + 1) * A, c * B:(c + 1) * B] & 127).astype(jnp.int8)
                                  for c in range(P)], axis=1) for i in range(cs)], axis=0)
            o3 = _DOT(x3, w1m_ref[:])
            a4 = jnp.concatenate(
                [jnp.concatenate([(o3[i * A:(i + 1) * A, c * B:(c + 1) * B] & 127).astype(jnp.int8)
                                  for c in range(P)], axis=0) for i in range(cs)], axis=1)  # (PA, cs*B)
            o4 = _DOT(w2m_ref[:], a4)
            acc = sum(o4[c * A:(c + 1) * A, :].astype(jnp.uint32) for c in range(P))
            olo_ref[rows, :] = jnp.concatenate(
                [acc[:, i * B:(i + 1) * B] for i in range(cs)], axis=0)
            ohi_ref[rows, :] = olo_ref[rows, :]

    w_spec = lambda s: pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((tile * A, B), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def step(v):
        lo, hi = v
        lo2, hi2 = pl.pallas_call(
            kernel, grid=(batch // tile,),
            in_specs=[w_spec(w1.shape), w_spec(w2.shape), w_spec(w1m.shape),
                      w_spec(w2m.shape)] + [v_spec] * 2,
            out_specs=[v_spec] * 2,
            out_shape=[jax.ShapeDtypeStruct((batch * A, B), jnp.uint32)] * 2,
        )(w1, w2, w1m, w2m, lo.reshape(batch * A, B), hi.reshape(batch * A, B))
        return (lo2.reshape(batch, n), hi2.reshape(batch, n))

    global data
    data_t = (data.lo, data.hi)
    import types
    dt = timeit_chain_t(step, data_t, "B: mm skeleton (4 dots)")
    mm = batch * (n * log_n + n) / dt
    print(f"[probe] B: skeleton -> {mm/1e9:.1f}e9 modmul/s-equniv ceiling")
    return dt


def part_c():
    """Per-r0 weight-reload amplification, pure MXU microbench.

    The full A=32 per-r0 weight set (25.7 MB) does not compile (scoped
    VMEM OOM — part of the probe's evidence); A=8 (6.4 MB, resident)
    measures the per-dot cost cleanly and scales linearly in A."""
    A, PB = 8, 896
    for tile in (64, 128):
        rows = tile
        wid = jnp.asarray(np.random.randint(-127, 127, size=(A, PB, PB), dtype=np.int8))
        wbig = jnp.asarray(np.random.randint(-127, 127, size=(2, PB, PB), dtype=np.int8))
        xs = jnp.asarray(np.random.randint(-127, 127, size=(A * rows, PB), dtype=np.int8))

        def kern_per_r0(w_ref, x_ref, o_ref):
            for r in range(A):
                o_ref[r * rows:(r + 1) * rows, :] = _DOT(
                    x_ref[r * rows:(r + 1) * rows, :], w_ref[r])

        def kern_big(w_ref, x_ref, o_ref):
            # two DISTINCT big dots summed (what the fold replaces); the
            # sum defeats dead-store elimination
            o_ref[:] = _DOT(x_ref[:], w_ref[0]) + _DOT(x_ref[:], w_ref[1])

        w_spec = lambda s: pl.BlockSpec(s, lambda: tuple(0 for _ in s), memory_space=pltpu.VMEM)
        perr0 = pl.pallas_call(
            kern_per_r0,
            in_specs=[w_spec(wid.shape), w_spec(xs.shape)],
            out_specs=w_spec((A * rows, PB)),
            out_shape=jax.ShapeDtypeStruct((A * rows, PB), jnp.int32))
        big = pl.pallas_call(
            kern_big,
            in_specs=[w_spec(wbig.shape), w_spec(xs.shape)],
            out_specs=w_spec((A * rows, PB)),
            out_shape=jax.ShapeDtypeStruct((A * rows, PB), jnp.int32))

        for name, fn, w in (("per-r0 x1", perr0, wid), ("big x2", big, wbig)):
            @jax.jit
            def chain(x, reps, fn=fn, w=w):
                def body(_, x):
                    o = fn(w, x)
                    return (o & 127).astype(jnp.int8)
                x = jax.lax.fori_loop(0, reps, body, x)
                return jnp.sum(x.astype(jnp.int32))
            _ = float(chain(xs, 64)); _ = float(chain(xs, 1064))
            t1s, t2s = [], []
            for _ in range(3):
                t0 = time.perf_counter(); _ = float(chain(xs, 64)); t1 = time.perf_counter()
                _ = float(chain(xs, 1064)); t2 = time.perf_counter()
                t1s.append(t1 - t0); t2s.append(t2 - t1)
            dt = (min(t2s) - min(t1s)) / 1000
            macs = A * rows * PB * PB * (1 if name.startswith("per") else 2)
            print(f"[probe] C tile={tile} {name}: {dt*1e6:.1f} us "
                  f"({macs/dt/1e12:.1f} Tmac/s)")


def part_d():
    """HBM copy bandwidth via a trivial grid copy kernel."""
    sz = 64 * 1024 * 1024  # 64 MB u32
    x = jnp.asarray(np.random.randint(0, 2**31, size=(sz // 4,), dtype=np.uint32)).reshape(-1, 1024)
    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1
    rows = x.shape[0]
    tile = 2048
    spec = pl.BlockSpec((tile, 1024), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cp = pl.pallas_call(kern, grid=(rows // tile,), in_specs=[spec],
                        out_specs=spec, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32))
    @jax.jit
    def chain(x, reps):
        x = jax.lax.fori_loop(0, reps, lambda _, v: cp(v), x)
        return x[0, 0]
    _ = float(chain(x, 2)); _ = float(chain(x, 10))
    t1s, t2s = [], []
    for _ in range(3):
        t0 = time.perf_counter(); _ = float(chain(x, 2)); t1 = time.perf_counter()
        _ = float(chain(x, 10)); t2 = time.perf_counter()
        t1s.append(t1 - t0); t2s.append(t2 - t1)
    dt = (min(t2s) - min(t1s)) / 8
    bw = 2 * 64e6 / dt / 1e9
    print(f"[probe] D: HBM copy {dt*1e3:.2f} ms/64MB r+w -> {bw:.0f} GB/s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "abcd"
    if "a" in which: part_a()
    if "b" in which: part_b()
    if "c" in which: part_c()
    if "d" in which: part_d()
