"""NTRU (NGS / FINAL-style) blind-rotation tests.

Covers the FHEW-variant pipeline the reference leaves to callers: scalar
NTRU encrypt/phase, vector-NGS external product, the CMux chain, and LWE
extraction under the key ``f``.  Messages are multiples of Δ = (q-1)/4 so
the ``f = 1 + 4 f'`` phase trick is exact (error = -m·f', tiny).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primus_fhe_tpu.boot.ntru_blind_rotate import (
    NtruContext,
    extract_lwe_ntru,
    lwe_phase_q,
    make_ntru_bootstrap_key,
    ngs_encrypt_bit,
    ntru_blind_rotate,
    ntru_encrypt_poly,
    ntru_keygen,
    ntru_phase,
    ntru_test_polynomial,
    rotate_poly_q,
)
from primus_fhe_tpu.distr.sampling import DiscreteGaussian
from primus_fhe_tpu.modular.modops import lazy_mul32, reduce_once32
from primus_fhe_tpu.transforms.ntt import inverse32
from primus_fhe_tpu.utils.primes import next_ntt_prime

LOG_N = 5
N = 1 << LOG_N
Q = next_ntt_prime(30, LOG_N)
DELTA = (Q - 1) // 4
LOG_BASIS = 8
LEVEL = 3
N_LWE = 8


def _centered(x):
    x = np.asarray(x).astype(np.int64)
    return np.where(x > Q // 2, x - Q, x)


@pytest.fixture(scope="module")
def setup():
    assert Q % (2 * N) == 1 and (Q - 1) % 4 == 0
    ctx = NtruContext(LOG_N, Q, LOG_BASIS, LEVEL)
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    sk = ntru_keygen(k1, ctx)
    gauss = DiscreteGaussian(3.2)
    lwe_secret = (jax.random.bits(k2, (N_LWE,), dtype=jnp.uint32) & 1).astype(
        jnp.uint32
    )
    evk = make_ntru_bootstrap_key(k3, ctx, sk, lwe_secret, gauss)
    return ctx, sk, gauss, lwe_secret, evk


@pytest.mark.slow
def test_keygen_invertible(setup):
    ctx, sk, *_ = setup
    # f * f^-1 == 1 in the NTT domain
    prod = reduce_once32(lazy_mul32(sk.f_ntt, sk.f_inv_ntt, ctx.m), ctx.m.value)
    np.testing.assert_array_equal(np.asarray(prod), np.ones(N, dtype=np.uint32))
    # f == 1 + 4f': constant term ≡ 1 mod 4, all others ≡ 0 mod 4 (centered)
    f = np.asarray(sk.f).astype(np.int64)
    f_c = np.where(f > Q // 2, f - Q, f)
    assert (f_c[0] - 1) % 4 == 0
    assert np.all(f_c[1:] % 4 == 0)
    assert np.all(np.abs(f_c) <= 5)


def test_scalar_encrypt_phase_roundtrip(setup):
    ctx, sk, gauss, *_ = setup
    key = jax.random.PRNGKey(3)
    for m in range(4):
        mu = jnp.zeros(N, dtype=jnp.uint32).at[0].set((DELTA * m) % Q)
        c = ntru_encrypt_poly(jax.random.fold_in(key, m), ctx, sk, mu, gauss)
        ph = np.asarray(ntru_phase(ctx, sk, c)).astype(np.int64)[0]
        decoded = int(round(4 * ph / Q)) % 4
        assert decoded == m, (m, ph)


def test_external_product_selects_bit(setup):
    ctx, sk, gauss, *_ = setup
    from primus_fhe_tpu.boot.ntru_blind_rotate import _external_product_ntt

    key = jax.random.PRNGKey(9)
    acc = jnp.zeros(N, dtype=jnp.uint32).at[0].set(DELTA)  # trivial Δ·1
    for bit in (0, 1):
        evk = ngs_encrypt_bit(jax.random.fold_in(key, bit), ctx, sk, bit, gauss)
        from primus_fhe_tpu.transforms.ntt import forward32

        evk_ntt = forward32(ctx.plan, evk)
        ep = inverse32(ctx.plan, _external_product_ntt(ctx, ctx.basis, acc, evk_ntt))
        ph = _centered(np.asarray(ntru_phase(ctx, sk, ep)))[0]
        assert abs(ph - bit * DELTA) < DELTA // 2, (bit, ph)


def test_rotate_poly_q_matches_naive():
    ctx = NtruContext(LOG_N, Q, LOG_BASIS, LEVEL)
    rng = np.random.default_rng(0)
    poly = rng.integers(0, Q, size=N, dtype=np.uint32)
    for d in (0, 1, 5, N - 1, N, N + 3, 2 * N - 1):
        got = np.asarray(rotate_poly_q(jnp.asarray(poly), d, N, ctx.m.value))
        want = np.zeros(N, dtype=np.int64)
        for i in range(N):
            j = (i + d) % (2 * N)
            s = 1 if j < N else -1
            want[j % N] = (want[j % N] + s * int(poly[i])) % Q
        np.testing.assert_array_equal(got.astype(np.int64), want % Q)


def _switched_lwe(b, a=None):
    ct = np.zeros(N_LWE + 1, dtype=np.int32)
    if a is not None:
        ct[:N_LWE] = a
    ct[N_LWE] = b
    return jnp.asarray(ct)


def test_blind_rotate_sign_trivial(setup):
    ctx, sk, gauss, lwe_secret, evk = setup
    tp = ntru_test_polynomial(N, Q, DELTA)
    # phase b in the lower half of Z_2N -> +Δ
    acc = ntru_blind_rotate(ctx, evk, _switched_lwe(N // 2), tp)
    a_vec = extract_lwe_ntru(acc, ctx.m.value)
    ph = _centered(lwe_phase_q(a_vec, sk.f, ctx.m))
    assert abs(ph - DELTA) < DELTA // 2, ph
    # upper half -> -Δ
    acc = ntru_blind_rotate(ctx, evk, _switched_lwe(N + N // 2), tp)
    ph = _centered(lwe_phase_q(extract_lwe_ntru(acc, ctx.m.value), sk.f, ctx.m))
    assert abs(ph + DELTA) < DELTA // 2, ph


def test_blind_rotate_encrypted(setup):
    ctx, sk, gauss, lwe_secret, evk = setup
    tp = ntru_test_polynomial(N, Q, DELTA)
    rng = np.random.default_rng(21)
    s = np.asarray(lwe_secret).astype(np.int64)
    for phase, sign in ((N // 2, +1), (N + N // 2, -1)):
        a = rng.integers(0, 2 * N, size=N_LWE)
        b = (a @ s + phase) % (2 * N)
        acc = ntru_blind_rotate(ctx, evk, _switched_lwe(b, a), tp)
        ph = _centered(lwe_phase_q(extract_lwe_ntru(acc, ctx.m.value), sk.f, ctx.m))
        assert abs(ph - sign * DELTA) < DELTA // 2, (phase, ph)


def test_blind_rotate_batched(setup):
    ctx, sk, gauss, lwe_secret, evk = setup
    tp = ntru_test_polynomial(N, Q, DELTA)
    cts = jnp.stack(
        [_switched_lwe(N // 2), _switched_lwe(N + N // 2), _switched_lwe(1)]
    )
    acc = ntru_blind_rotate(ctx, evk, cts, tp)
    assert acc.shape == (3, N)
    phs = _centered(lwe_phase_q(extract_lwe_ntru(acc, ctx.m.value), sk.f, ctx.m))
    assert abs(phs[0] - DELTA) < DELTA // 2
    assert abs(phs[1] + DELTA) < DELTA // 2
    assert abs(phs[2] - DELTA) < DELTA // 2
