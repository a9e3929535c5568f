"""Sweep tile_b for the MXU CMux kernel (single-step timing, TPU)."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scratch")

import jax
import jax.numpy as jnp

from ptime import timeit

from primus_fhe_tpu.decompose import ApproxSignedBasis32
from primus_fhe_tpu.lattice import tfhe
from primus_fhe_tpu.ops.cmux_mxu import get_plan, mxu_cmux_step_nat, prepare_mxu_bsk

LOG_N, K, LB, LV = 10, 1, 8, 2
N = 1 << LOG_N
K1 = K + 1
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64

basis = ApproxSignedBasis32(None, LB, reverse_length=LV)
conv = tfhe.make_convolver(LOG_N, LV, K, LB)
rng = np.random.default_rng(0)
acc = jnp.asarray(
    rng.integers(0, 1 << 32, size=(BATCH, K1, N), dtype=np.uint64).astype(np.uint32)
)
degrees = jnp.asarray(rng.integers(0, 2 * N, size=BATCH, dtype=np.int64), jnp.int32)
ggsw = jnp.asarray(
    rng.integers(0, 1 << 32, size=(1, K1, LV, K1, N), dtype=np.uint64).astype(np.uint32)
)
kv, kpre = prepare_mxu_bsk(conv, ggsw)
kv, kpre = kv[0], kpre[0]
plan = get_plan(conv.log_n, tuple(conv.primes), conv.product)
crt = plan.crt_consts(conv.product)
acc_nat = acc.reshape(BATCH, K1, plan.A, plan.B)

for tile_b in (2, 4, 8, 16, 32, 64):
    if BATCH % tile_b:
        continue
    try:
        run = jax.jit(
            lambda a, t=tile_b: mxu_cmux_step_nat(
                plan, basis, crt, a, degrees, kv, kpre, K1, LV, tile_b=t
            )
        )
        out = jax.block_until_ready(run(acc_nat))

        def reps(r, run=run):
            a = acc_nat
            for _ in range(r):
                a = run(a)
            return jnp.sum(a, dtype=jnp.uint32)

        dt = timeit(reps, r1=16, r2=128, tries=3)
        print(f"tile_b={tile_b}: {dt*1e6:.1f} us/step  ({BATCH/dt/512:.0f} boots/s-equiv)")
    except Exception as e:
        print(f"tile_b={tile_b}: FAILED {type(e).__name__}: {str(e)[:200]}")
