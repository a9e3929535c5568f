"""Byte-radix kernel vs 7-bit kernel on real TPU: rt headline + 60-bit tier."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from primus_fhe_tpu.numeric import to_u64_pair
from primus_fhe_tpu.ops.ntt_mxu import MxuNttPlan64, mxu_fused_roundtrip64_mul
from primus_fhe_tpu.ops.ntt_mxu8 import (
    Mxu8NttPlan64,
    mxu8_fused_forward64,
    mxu8_fused_roundtrip64_mul,
)

LOG_N = 12
N = 1 << LOG_N


def timeit(fn, *args, r1=64, r2=256, tries=3):
    _ = float(fn(*args, r1))
    _ = float(fn(*args, r2))
    best = None
    for _i in range(tries):
        t0 = time.perf_counter()
        _ = float(fn(*args, r1))
        t1 = time.perf_counter()
        _ = float(fn(*args, r2))
        t2 = time.perf_counter()
        best = min(best or 9e9, max((t2 - t1) - (t1 - t0), 1e-9))
    return best / (r2 - r1)


def bench_rt(name, mk_step, batch, q):
    rng = np.random.default_rng(7)
    data = to_u64_pair(rng.integers(0, q, size=(batch, N), dtype=np.uint64))
    step = mk_step()

    @jax.jit
    def chained(v, reps):
        v = jax.lax.fori_loop(0, reps, lambda _, v: step(v), v)
        return jnp.sum(v.lo ^ v.hi, dtype=jnp.uint32)

    dt = timeit(chained, data) / batch
    print(
        f"[mxu8] {name:34s} rt/s={1/dt/1e6:7.3f}M modmul/s="
        f"{(N*LOG_N+N)/dt/1e9:6.1f}e9"
    )


def main():
    print(f"[mxu8] backend={jax.default_backend()}")
    q50 = 1125899906826241
    q60 = 1152921504606830593
    rng = np.random.default_rng(7)
    key50 = rng.integers(0, q50, size=(N,), dtype=np.uint64)
    key60 = rng.integers(0, q60, size=(N,), dtype=np.uint64)

    for batch, tile in ((128, 8), (256, 16), (256, 8), (128, 16)):
        p8 = Mxu8NttPlan64(LOG_N, q50)
        t8 = p8.inverse_mul_tabs(key50, tile)
        bench_rt(
            f"byte-radix q50 b={batch} t={tile}",
            lambda p8=p8, t8=t8, tile=tile: (
                lambda v: mxu8_fused_roundtrip64_mul(p8, v, t8, 1, tile)
            ),
            batch,
            q50,
        )
    p7 = MxuNttPlan64(LOG_N, q50)
    t7 = p7.inverse_mul_tabs(key50, 8)
    bench_rt(
        "7bit-limb  q50 b=128 t=8 (baseline)",
        lambda: (lambda v: mxu_fused_roundtrip64_mul(p7, v, t7, 1, 8)),
        128,
        q50,
    )
    # 60-bit tier round trip + forward
    for batch, tile in ((128, 8), (256, 16)):
        p60 = Mxu8NttPlan64(LOG_N, q60)
        t60 = p60.inverse_mul_tabs(key60, tile)
        bench_rt(
            f"byte-radix q60 b={batch} t={tile}",
            lambda p60=p60, t60=t60, tile=tile: (
                lambda v: mxu8_fused_roundtrip64_mul(p60, v, t60, 1, tile)
            ),
            batch,
            q60,
        )
    # forward-only 60-bit (VERDICT #2 metric: NTTs/s vs VPU butterfly 694k)
    p60 = Mxu8NttPlan64(LOG_N, q60)
    data = to_u64_pair(rng.integers(0, q60, size=(128, N), dtype=np.uint64))

    @jax.jit
    def fwd_chain(v, reps):
        def body(_, v):
            f = mxu8_fused_forward64(p60, v, 4, 8)
            # keep values in-range for repeat (4q < 2^62 ok for 8-plane)
            return f

        v = jax.lax.fori_loop(0, reps, body, v)
        return jnp.sum(v.lo ^ v.hi, dtype=jnp.uint32)

    dt = timeit(fwd_chain, data) / 128
    print(f"[mxu8] q60 forward-only               ntts/s={1/dt/1e6:7.3f}M")


if __name__ == "__main__":
    main()
