"""NTRU single-kernel MXU CMux vs the composed path — bit-exact."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import importlib

nb = importlib.import_module("primus_fhe_tpu.boot.ntru_blind_rotate")
from primus_fhe_tpu.distr.sampling import DiscreteGaussian
from primus_fhe_tpu.ops.ntru_cmux_mxu import (
    get_ntru_plan,
    ntru_cmux_step_nat,
    prepare_mxu_evk,
)
from primus_fhe_tpu.utils.primes import next_ntt_prime

LOG_N = 8
N = 1 << LOG_N
Q = next_ntt_prime(30, LOG_N)


@pytest.fixture(scope="module")
def ctx():
    return nb.NtruContext(LOG_N, Q, 10, 3)


def test_ntru_mxu_step_matches_composed(ctx):
    rng = np.random.default_rng(0)
    bsz = 4
    acc = jnp.asarray(rng.integers(0, Q, size=(bsz, N), dtype=np.int64), jnp.uint32)
    degrees = jnp.asarray(rng.integers(0, 2 * N, size=bsz, dtype=np.int64), jnp.int32)
    evk_coeff = jnp.asarray(
        rng.integers(0, Q, size=(1, ctx.level, N), dtype=np.int64), jnp.uint32
    )

    # oracle: composed decompose -> NTT -> MAC -> INTT -> (X^a - 1) add
    from primus_fhe_tpu.transforms.ntt import forward32
    from primus_fhe_tpu.modular.modops import add32, sub32

    evk_ntt = forward32(ctx.plan, evk_coeff[0])
    ep = nb._external_product_ntt(ctx, ctx.basis, acc, evk_ntt)
    delta = nb._ntt_inv(ctx, ep)
    rot = nb.rotate_poly_q(delta, degrees, N, ctx.m.value)
    want = np.asarray(add32(acc, sub32(rot, delta, ctx.m.value), ctx.m.value))

    kv, kpre = prepare_mxu_evk(ctx, evk_coeff)
    plan = get_ntru_plan(LOG_N, Q)
    out = ntru_cmux_step_nat(
        plan, ctx.basis, acc.reshape(bsz, plan.A, plan.B), degrees,
        kv[0], kpre[0], ctx.level,
    )
    got = np.asarray(out.reshape(bsz, N))
    assert (got == want).all(), np.argwhere(got != want)[:5]


@pytest.mark.slow
def test_ntru_mxu_full_rotation_matches(ctx):
    """Full blind rotation: MXU key pack vs the composed scan, and the
    decoded message survives."""
    gauss = DiscreteGaussian(1.0)
    n_lwe, batch = 8, 2
    kk = jax.random.split(jax.random.PRNGKey(5), 3)
    sk = nb.ntru_keygen(kk[0], ctx)
    secret = (jax.random.bits(kk[1], (n_lwe,), dtype=jnp.uint32) & 1).astype(jnp.uint32)
    evk_ref = nb.make_ntru_bootstrap_key(kk[2], ctx, sk, secret, gauss)
    evk_mxu = nb.make_ntru_bootstrap_key_mxu(kk[2], ctx, sk, secret, gauss)
    test_poly = nb.ntru_test_polynomial(N, Q, ctx.delta)
    rng = np.random.default_rng(11)
    lwe = jnp.asarray(
        rng.integers(0, 2 * N, size=(batch, n_lwe + 1), dtype=np.int64)
    ).astype(jnp.int32)

    out_ref = nb.ntru_blind_rotate(ctx, evk_ref, lwe, test_poly)
    out_mxu = nb.ntru_blind_rotate(ctx, evk_mxu, lwe, test_poly)
    assert (np.asarray(out_ref) == np.asarray(out_mxu)).all()
