"""Sweep the mxu8 rt kernel's chunk size (matmul issue width) on TPU.

_chunking currently picks the smallest cs with cs*A >= 128; bigger cs
means fewer, wider matmuls per grid step.  Monkeypatch and measure.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scratch")

from ptime import timeit

import primus_fhe_tpu.ops.ntt_mxu8 as m8
from primus_fhe_tpu.numeric import to_u64_pair

LOG_N = 12
N = 1 << LOG_N
Q = 1125899906826241


def bench(batch, tile, cs):
    orig = m8._chunking
    m8._chunking = lambda t, A, cs=cs: (cs, t // cs)
    try:
        rng = np.random.default_rng(7)
        key = rng.integers(0, Q, size=(N,), dtype=np.uint64)
        data = to_u64_pair(rng.integers(0, Q, size=(batch, N), dtype=np.uint64))
        plan = m8.Mxu8NttPlan64(LOG_N, Q)
        tabs = plan.inverse_mul_tabs(key, tile)

        def step(v):
            return m8.mxu8_fused_roundtrip64_mul(plan, v, tabs, 1, tile)

        @jax.jit
        def chained(v, reps):
            v = jax.lax.fori_loop(0, reps, lambda _, v: step(v), v)
            return jnp.sum(v.lo ^ v.hi, dtype=jnp.uint32)

        dt = timeit(chained, data) / batch
        rate = (N * LOG_N + N) / dt / 1e9
        print(f"[cs] b={batch:4d} t={tile:3d} cs={cs:3d} rt/s={1/dt/1e6:7.3f}M  {rate:6.1f}e9")
        return rate
    except Exception as e:
        print(f"[cs] b={batch} t={tile} cs={cs} FAILED {type(e).__name__}: {str(e)[:100]}")
        return 0.0
    finally:
        m8._chunking = orig
        m8.mxu8_fused_roundtrip64_mul._clear_cache()


def main():
    print(f"[cs] backend={jax.default_backend()}")
    for batch, tile, cs in (
        (256, 16, 4),   # current default
        (256, 16, 8),
        (256, 16, 16),
        (256, 32, 8),
        (256, 32, 16),
        (256, 32, 32),
        (512, 32, 16),
        (512, 32, 32),
    ):
        bench(batch, tile, cs)


if __name__ == "__main__":
    main()
