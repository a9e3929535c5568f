"""Tier evidence on real TPU: 60-bit prime mxu8 vs VPU butterfly, and
small-n (N=256/512) mxu8 vs VPU.  Forward+inverse separately."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scratch")

from ptime import timeit

from primus_fhe_tpu.numeric import to_u64_pair
from primus_fhe_tpu.ops.ntt_mxu8 import (
    Mxu8NttPlan64,
    mxu8_fused_forward64,
    mxu8_fused_inverse64,
)
from primus_fhe_tpu.ops.ntt_pallas import (
    PallasNttPlan64,
    pallas_forward64,
    pallas_inverse64,
)


def bench_dir(name, step, data, batch):
    @jax.jit
    def chained(v, reps):
        v = jax.lax.fori_loop(0, reps, lambda _, v: step(v), v)
        return jnp.sum(v.lo ^ v.hi, dtype=jnp.uint32)

    dt = timeit(chained, data) / batch
    print(f"[tiers] {name:42s} {1/dt/1e6:8.3f}M transforms/s")
    return 1 / dt


def run(log_n, q, batch, tile):
    n = 1 << log_n
    rng = np.random.default_rng(7)
    data = to_u64_pair(rng.integers(0, q, size=(batch, n), dtype=np.uint64))
    m = Mxu8NttPlan64(log_n, q)
    p = PallasNttPlan64(log_n, q)
    qb = q.bit_length()
    # fwd: canonical in, [0,4q) out feeds inv ([0,4q) ok for both tiers?)
    # keep each direction self-chained at out_factor=1 for comparability
    r = {}
    r["mxu8 fwd"] = bench_dir(
        f"mxu8  fwd n={n} q={qb}b tile={tile}",
        lambda v: mxu8_fused_forward64(m, v, 1, tile), data, batch)
    r["vpu fwd"] = bench_dir(
        f"vpu   fwd n={n} q={qb}b",
        lambda v: pallas_forward64(p, v, 1, 16), data, batch)
    r["mxu8 inv"] = bench_dir(
        f"mxu8  inv n={n} q={qb}b tile={tile}",
        lambda v: mxu8_fused_inverse64(m, v, 1, tile), data, batch)
    r["vpu inv"] = bench_dir(
        f"vpu   inv n={n} q={qb}b",
        lambda v: pallas_inverse64(p, v, 1, 16), data, batch)
    print(f"[tiers]   -> fwd speedup {r['mxu8 fwd']/r['vpu fwd']:.2f}x, "
          f"inv speedup {r['mxu8 inv']/r['vpu inv']:.2f}x")


if __name__ == "__main__":
    print(f"[tiers] backend={jax.default_backend()}")
    run(12, 1152921504606830593, 256, 32)   # 60-bit golden prime
    run(8, 1125899906826241, 2048, 32)      # N=256, 50-bit
    run(9, 1125899906826241, 1024, 32)      # N=512, 50-bit
