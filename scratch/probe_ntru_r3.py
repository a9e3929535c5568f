"""NTRU CMux step cost on real TPU: baseline + variants.

Production-ish dims: N=1024, q ~30-bit NTT prime, L=3 digits, batch of
accumulators; one CMux step = decompose -> L fwd NTT -> MAC -> (X^a - 1)
factor -> inv NTT -> add.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scratch")

from ptime import timeit

from primus_fhe_tpu.boot import ntru_blind_rotate as nb
from primus_fhe_tpu.utils.primes import next_ntt_prime

LOG_N = 10
N = 1 << LOG_N
Q = next_ntt_prime(30, LOG_N)
LOG_BASIS = 10
LEVEL = 3
BATCH = 64


def main():
    print(f"[ntru] backend={jax.default_backend()} N={N} q={Q} L={LEVEL} batch={BATCH}")
    ctx = nb.NtruContext(LOG_N, Q, LOG_BASIS, LEVEL)
    rng = np.random.default_rng(7)
    acc0 = jnp.asarray(rng.integers(0, Q, size=(BATCH, N), dtype=np.uint32))
    evk_i = jnp.asarray(rng.integers(0, Q, size=(LEVEL, N), dtype=np.uint32))
    a_i = jnp.asarray(rng.integers(0, 2 * N, size=(BATCH, 1), dtype=np.int32))

    from primus_fhe_tpu.modular.modops import add32, lazy_mul32, sub32
    from primus_fhe_tpu.transforms.ntt import inverse32, monomial32

    def step(acc):
        ep = nb._external_product_ntt(ctx, ctx.basis, acc, evk_i)
        mono = monomial32(ctx.plan, a_i)
        factor = sub32(mono, jnp.ones_like(mono), ctx.m.value)
        delta = inverse32(ctx.plan, lazy_mul32(ep, factor, ctx.m))
        return add32(acc, delta, ctx.m.value)

    def run(name, stepfn):
        @jax.jit
        def chained(v, reps):
            v = jax.lax.fori_loop(0, reps, lambda _, v: stepfn(v), v)
            return jnp.sum(v, dtype=jnp.uint32)

        dt = timeit(chained, acc0, r1=16, r2=128) / BATCH
        print(f"[ntru] {name:34s} {dt*1e6:8.3f} us/acc  ({1/dt/1e3:7.1f}k steps/s)")

    run("A baseline (xla ntt, mono gather)", step)

    # B: coeff-domain rotation instead of the NTT-domain monomial gather
    def step_b(acc):
        ep = nb._external_product_ntt(ctx, ctx.basis, acc, evk_i)
        delta = inverse32(ctx.plan, ep)
        rot = nb.rotate_poly_q(delta, a_i[..., 0], N, ctx.m.value)
        return add32(acc, sub32(rot, delta, ctx.m.value), ctx.m.value)

    run("B coeff-rotation", step_b)

    # C: pallas NTT kernels + coeff rotation
    from primus_fhe_tpu.ops.ntt_pallas import (
        PallasNttPlan32,
        pallas_forward32,
        pallas_inverse32,
    )
    from primus_fhe_tpu.modular.modops import (
        barrett_lazy_reduce32,
        reduce_once32,
    )

    pplan = PallasNttPlan32(LOG_N, Q)

    def ext_prod_pallas(acc):
        digits = ctx.basis.decompose(acc)  # (L, batch, N)
        f = pallas_forward32(pplan, digits.reshape(LEVEL * BATCH, N), 1, 16)
        f = f.reshape(LEVEL, BATCH, N)
        acc_sum = None
        for l in range(LEVEL):
            t = reduce_once32(lazy_mul32(f[l], evk_i[l], ctx.m), ctx.m.value)
            acc_sum = t if acc_sum is None else acc_sum + t
        return reduce_once32(barrett_lazy_reduce32(acc_sum, ctx.m), ctx.m.value)

    def step_c(acc):
        ep = ext_prod_pallas(acc)
        delta = pallas_inverse32(pplan, ep, 1, 16)
        rot = nb.rotate_poly_q(delta, a_i[..., 0], N, ctx.m.value)
        return add32(acc, sub32(rot, delta, ctx.m.value), ctx.m.value)

    run("C pallas ntt + coeff-rotation", step_c)

    # D: pallas NTT + NTT-domain mono gather
    def step_d(acc):
        ep = ext_prod_pallas(acc)
        mono = monomial32(ctx.plan, a_i)
        factor = sub32(mono, jnp.ones_like(mono), ctx.m.value)
        delta = pallas_inverse32(pplan, lazy_mul32(ep, factor, ctx.m), 1, 16)
        return add32(acc, delta, ctx.m.value)

    run("D pallas ntt + mono gather", step_d)


if __name__ == "__main__":
    main()
