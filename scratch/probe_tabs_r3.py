"""KO probe: replace full-size table LOADS with (1,1) scalar broadcasts
in twiddle/keymul (results wrong; timing isolates vector-load cost)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scratch")

from ptime import timeit

import primus_fhe_tpu.ops.ntt_mxu8 as m8
from primus_fhe_tpu.numeric import to_u64_pair
from primus_fhe_tpu.ops.ntt_mxu import _sconst

LOG_N = 12
N = 1 << LOG_N
Q = 1125899906826241
BATCH, TILE = 512, 32

_orig_tw = m8._twiddle8


def run(label, patch):
    if patch:
        w = 12345
        pre = ((w << 64) // Q) & 0xFFFFFFFFFFFFFFFF
        lo, hi = w & 0xFFFFFFFF, w >> 32
        sc = tuple(
            np.uint32(v)
            for v in (
                lo, hi, lo & 0xFFFF, lo >> 16,
                pre & 0xFFFF, (pre >> 16) & 0xFFFF,
                (pre >> 32) & 0xFFFF, pre >> 48,
            )
        )

        def tw_scalar(q, sol, shoup, narrow, v_lo, v_hi, corr, t_t, t32_t, ct_t, qc):
            y = m8._fold32(v_lo, v_hi, sol)
            y = m8._add64(*y, *corr)
            return shoup(*y, *sc, *qc)

        m8._twiddle8 = tw_scalar
    try:
        rng = np.random.default_rng(7)
        key = rng.integers(0, Q, size=(N,), dtype=np.uint64)
        data = to_u64_pair(rng.integers(0, Q, size=(BATCH, N), dtype=np.uint64))
        plan = m8.Mxu8NttPlan64(LOG_N, Q)
        tabs = plan.inverse_mul_tabs(key, TILE)

        def step(v):
            return m8.mxu8_fused_roundtrip64_mul(plan, v, tabs, 1, TILE)

        @jax.jit
        def chained(v, reps):
            v = jax.lax.fori_loop(0, reps, lambda _, v: step(v), v)
            return jnp.sum(v.lo ^ v.hi, dtype=jnp.uint32)

        dt = timeit(chained, data) / BATCH
        print(f"[tabs] {label:24s} rt/s={1/dt/1e6:7.3f}M  ({dt*1e9:6.1f} ns/poly)")
    finally:
        m8._twiddle8 = _orig_tw
        m8.mxu8_fused_roundtrip64_mul._clear_cache()


if __name__ == "__main__":
    print(f"[tabs] backend={jax.default_backend()}")
    run("full tables", False)
    run("scalar twiddle tables", True)
