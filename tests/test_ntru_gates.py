"""NTRU boolean gates — full FHEW-style loop: encrypt mod q under the
binary key s, gate (affine → modulus switch → blind rotate → extract →
key switch back to s), decrypt. Gate outputs are valid gate inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primus_fhe_tpu.boot.ntru_blind_rotate import (
    NtruContext,
    make_ntru_bootstrap_key,
    make_ntru_keyswitch_key,
    modulus_switch_q,
    ntru_keygen,
)
from primus_fhe_tpu.boot.ntru_gates import (
    false_mu,
    ntru_and,
    ntru_nand,
    ntru_not,
    ntru_or,
    true_mu,
)
from primus_fhe_tpu.decompose import ApproxSignedBasis32
from primus_fhe_tpu.distr.sampling import DiscreteGaussian
from primus_fhe_tpu.utils.primes import next_ntt_prime

pytestmark = pytest.mark.slow

LOG_N = 9
N = 1 << LOG_N
Q = next_ntt_prime(30, LOG_N)
N_LWE = 8


@pytest.fixture(scope="module")
def setup():
    ctx = NtruContext(LOG_N, Q, 8, 3, t_scale=8)
    ks_basis = ApproxSignedBasis32(Q, 7, 3)
    gauss = DiscreteGaussian(3.2)
    key = jax.random.PRNGKey(17)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    sk = ntru_keygen(k1, ctx)
    s = (jax.random.bits(k2, (N_LWE,), dtype=jnp.uint32) & 1).astype(jnp.uint32)
    evk = make_ntru_bootstrap_key(k3, ctx, sk, s, gauss)
    ksk = make_ntru_keyswitch_key(k4, ctx, sk, s, ks_basis, gauss)
    return ctx, ks_basis, gauss, sk, s, evk, ksk


def _encrypt(key, ctx, s, mu):
    from primus_fhe_tpu.distr.sampling import sample_uniform

    ka, ke = jax.random.split(key)
    a = sample_uniform(ka, (N_LWE,), ctx.q_int)
    e = DiscreteGaussian(3.2).sample_mod(ke, (), ctx.q_int)
    sv = np.asarray(s).astype(np.int64)
    b = (int(np.asarray(a).astype(np.int64) @ sv) + int(mu) + int(e)) % ctx.q_int
    return jnp.concatenate([a, jnp.asarray([b], dtype=jnp.uint32)])


def _decrypt_bit(ctx, s, ct):
    a = np.asarray(ct[:-1]).astype(np.int64)
    b = int(ct[-1])
    sv = np.asarray(s).astype(np.int64)
    ph = (b - int(a @ sv)) % ctx.q_int
    phc = ph - ctx.q_int if ph > ctx.q_int // 2 else ph
    t = true_mu(ctx)
    assert abs(abs(phc) - t) < t // 2, phc  # must be near ±q/8
    return 1 if phc > 0 else 0


def test_modulus_switch_q_exact():
    ctx = NtruContext(LOG_N, Q, 8, 3, t_scale=8)
    rng = np.random.default_rng(0)
    x = rng.integers(0, Q, size=256, dtype=np.uint32)
    got = np.asarray(modulus_switch_q(jnp.asarray(x), ctx, 11))
    want = ((x.astype(object) * 2048 + Q // 2) // Q) % 2048
    np.testing.assert_array_equal(got.astype(object), want)


def test_nand_truth_table(setup):
    ctx, ks_basis, gauss, sk, s, evk, ksk = setup
    key = jax.random.PRNGKey(101)
    mus = {0: false_mu(ctx), 1: true_mu(ctx)}
    for b1 in (0, 1):
        for b2 in (0, 1):
            c1 = _encrypt(jax.random.fold_in(key, 2 * b1), ctx, s, mus[b1])
            c2 = _encrypt(jax.random.fold_in(key, 4 + b2), ctx, s, mus[b2])
            out = ntru_nand(ctx, evk, ksk, ks_basis, c1, c2)
            assert _decrypt_bit(ctx, s, out) == (1 - (b1 & b2)), (b1, b2)


def test_and_or_not(setup):
    ctx, ks_basis, gauss, sk, s, evk, ksk = setup
    key = jax.random.PRNGKey(202)
    mus = {0: false_mu(ctx), 1: true_mu(ctx)}
    for b1, b2 in ((0, 1), (1, 1)):
        c1 = _encrypt(jax.random.fold_in(key, 8 + b1), ctx, s, mus[b1])
        c2 = _encrypt(jax.random.fold_in(key, 16 + b2), ctx, s, mus[b2])
        out = ntru_and(ctx, evk, ksk, ks_basis, c1, c2)
        assert _decrypt_bit(ctx, s, out) == (b1 & b2), (b1, b2)
        out = ntru_or(ctx, evk, ksk, ks_basis, c1, c2)
        assert _decrypt_bit(ctx, s, out) == (b1 | b2), (b1, b2)
        assert _decrypt_bit(ctx, s, ntru_not(ctx, c1)) == 1 - b1


def test_gate_composability(setup):
    """A gate output feeds the next gate: NAND(NAND(x,x), NAND(y,y)) = OR."""
    ctx, ks_basis, gauss, sk, s, evk, ksk = setup
    key = jax.random.PRNGKey(303)
    mus = {0: false_mu(ctx), 1: true_mu(ctx)}
    for x, y in ((0, 0), (1, 0)):
        cx = _encrypt(jax.random.fold_in(key, x), ctx, s, mus[x])
        cy = _encrypt(jax.random.fold_in(key, 2 + y), ctx, s, mus[y])
        nx = ntru_nand(ctx, evk, ksk, ks_basis, cx, cx)  # NOT x (via NAND)
        ny = ntru_nand(ctx, evk, ksk, ks_basis, cy, cy)
        out = ntru_nand(ctx, evk, ksk, ks_basis, nx, ny)
        assert _decrypt_bit(ctx, s, out) == (x | y), (x, y)
