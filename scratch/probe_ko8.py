"""Stage-knockout breakdown of the mxu8 fused rt kernel (monkeypatch).

Each knockout replaces one stage with a near-free placeholder keeping
shapes/dtypes; delta vs the full kernel ~= that stage's cost.  Checksums
are wrong under knockout by design.
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
BATCH, TILE, CS = 512, 32, 32

_orig = dict(
    split=m8._split_bytes_list,
    twiddle=m8._twiddle8,
    finish=m8._finish8,
    recombine=m8._recombine_bytes,
    chunking=m8._chunking,
)


def ko_split(lo, hi, planes):
    p = lo.astype(jnp.int8)
    return [p] * planes


def ko_twiddle(q, sol, shoup, narrow, v_lo, v_hi, corr, t_t, t32_t, ct_t, qc,
               high_bound=None, y=None):
    return y if y is not None else v_lo


def ko_finish(q, sol, shoup, narrow, v2l, v2h, corr, bounds, out_factor, qc,
              y=None):
    return y if y is not None else v2l


def ko_recombine(digs, bias, smax):
    z = digs[0].astype(jnp.uint32)
    return (z, z), (z, z)


def run(label, kos):
    m8._chunking = lambda t, A: (CS, t // CS)
    for k in kos:
        setattr(m8, {"split": "_split_bytes_list", "twiddle": "_twiddle8",
                     "finish": "_finish8", "recombine": "_recombine_bytes"}[k],
                {"split": ko_split, "twiddle": ko_twiddle,
                 "finish": ko_finish, "recombine": ko_recombine}[k])
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
        print(f"[ko8] {label:28s} rt/s={1/dt/1e6:7.3f}M  ({dt*1e9:6.1f} ns/poly)")
        return dt
    except Exception as e:
        print(f"[ko8] {label} FAILED {type(e).__name__}: {str(e)[:110]}")
        return None
    finally:
        m8._split_bytes_list = _orig["split"]
        m8._twiddle8 = _orig["twiddle"]
        m8._finish8 = _orig["finish"]
        m8._recombine_bytes = _orig["recombine"]
        m8._chunking = _orig["chunking"]
        m8.mxu8_fused_roundtrip64_mul._clear_cache()


def main():
    print(f"[ko8] backend={jax.default_backend()} b={BATCH} t={TILE} cs={CS}")
    base = run("none", ())
    for k in ("split", "twiddle", "finish", "recombine"):
        dt = run(k, (k,))
        if base and dt:
            print(f"[ko8]   -> {k} cost ~ {(base-dt)*1e9:+6.1f} ns/poly")
    dt = run("ALL", ("split", "twiddle", "finish", "recombine"))
    if base and dt:
        print(f"[ko8]   -> all-elementwise cost ~ {(base-dt)*1e9:+6.1f} ns/poly")


if __name__ == "__main__":
    main()
