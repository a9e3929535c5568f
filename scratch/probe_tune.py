"""Tune (h1, tile) for the fused MXU kernel; measure transpose overhead
and the honest round trip (fwd out4 -> pointwise shoup -> inv canonical)."""

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
    mxu_fused_forward64,
    mxu_fused_inverse64,
)


def timeit(fn, data, r1=64, r2=512):
    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained(v, reps):
        def body(_, v):
            return fn(v)

        v = jax.lax.fori_loop(0, reps, body, v)
        return jnp.sum(v.lo ^ v.hi, dtype=jnp.uint32)

    _ = float(chained(data, r1))
    _ = float(chained(data, r2))
    best = None
    for _i in range(2):
        t0 = time.perf_counter()
        _ = float(chained(data, r1))
        t1 = time.perf_counter()
        _ = float(chained(data, r2))
        t2 = time.perf_counter()
        dt = max((t2 - t1) - (t1 - t0), 1e-9) / (r2 - r1)
        best = dt if best is None else min(best, dt)
    return best


def main():
    log_n = 12
    n = 1 << log_n
    q = 1125899906826241
    batch = 64
    rng = np.random.default_rng(7)
    raw = rng.integers(0, q, size=(batch, n), dtype=np.uint64)
    data = to_u64_pair(raw)
    modmul = batch * (n // 2) * log_n

    # pure transpose cost (the XLA-side kernel-layout shuffle)
    A, B = 32, 128
    bp = batch

    def tr(v):
        def f(x):
            return (
                x.reshape(bp, A, B).transpose(1, 0, 2).reshape(A, bp * B)
                .reshape(bp, A, B).transpose(1, 0, 2).reshape(bp, n)
            )

        return U64(f(v.lo), f(v.hi))

    dt = timeit(tr, data)
    print(f"double-transpose only: {dt*1e6:.1f} us/call ({modmul/dt/1e9:.1f}e9-equiv)", flush=True)

    for h1 in (4, 5):
        for tile in (8, 16, 32):
            plan = MxuNttPlan64(log_n, q, h1=h1)
            try:
                fwd = lambda v: mxu_fused_forward64(plan, v, 4, tile)
                inv = lambda v: mxu_fused_inverse64(plan, v, 4, tile)
                dtf = timeit(fwd, data)
                dti = timeit(inv, data)
                print(
                    f"h1={h1} tile={tile:2d}  fwd {modmul/dtf/1e9:7.2f}e9"
                    f"  inv {modmul/dti/1e9:7.2f}e9",
                    flush=True,
                )
            except Exception as e:
                print(f"h1={h1} tile={tile} FAIL {str(e).splitlines()[0][:90]}", flush=True)

    # honest round trip with a fixed-operand Shoup pointwise in between
    plan = MxuNttPlan64(log_n, q)
    from primus_fhe_tpu.transforms.ntt import _shoup_lazy64
    from primus_fhe_tpu.numeric.limb import u64_full

    key = rng.integers(0, q, size=(n,), dtype=np.uint64)
    kw = to_u64_pair(key)
    # precon table computed host-side
    pre_np = np.asarray(
        [((int(k) << 64) // q) & 0xFFFFFFFFFFFFFFFF for k in key], dtype=np.uint64
    )
    prew = to_u64_pair(pre_np)
    qq = u64_full((), q)

    for tile in (8, 16):
        def rt(v, tile=tile):
            f = mxu_fused_forward64(plan, v, 4, tile)
            p = _shoup_lazy64(f, kw, prew, qq)
            return mxu_fused_inverse64(plan, p, 1, tile)

        tabs = plan.inverse_mul_tabs(key, tile)

        def rtf(v, tile=tile, tabs=tabs):
            f = mxu_fused_forward64(plan, v, 4, tile)
            from primus_fhe_tpu.ops.ntt_mxu import mxu_fused_inverse64_mul

            return mxu_fused_inverse64_mul(plan, f, tabs, 1, tile)

        dtr = timeit(rt, data)
        dtrf = timeit(rtf, data)
        # 2 transforms + n pointwise muls per poly
        mm = batch * (n * log_n + n)
        print(
            f"roundtrip tile={tile}: unfused {mm/dtr/1e9:7.2f}e9 "
            f"fusedmul {mm/dtrf/1e9:7.2f}e9 modmul/s "
            f"({batch/dtrf:,.0f} roundtrips/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
