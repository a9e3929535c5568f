"""Blind-rotation bootstrapping integration tests (config-5 pipeline).

Composes the full stack: modulus switch -> scan of CMux external products
-> LWE extraction, on tiny parameters.  The sign-test polynomial maps
phases in the upper/lower torus half to ±delta.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primus_fhe_tpu.boot import blind_rotate, bootstrap, make_bootstrap_key
from primus_fhe_tpu.decompose import ApproxSignedBasis32
from primus_fhe_tpu.distr.sampling import DiscreteGaussian
from primus_fhe_tpu.lattice import tfhe

LOG_N = 5
N = 1 << LOG_N
K = 1
LOG_BASIS = 8
LEVEL = 3
N_LWE = 8
DELTA = 1 << 28


def _centered(x):
    x = np.asarray(x).astype(np.int64)
    return np.where(x >= 1 << 31, x - (1 << 32), x)


@pytest.fixture(scope="module")
def setup():
    basis = ApproxSignedBasis32(None, LOG_BASIS, reverse_length=LEVEL)
    conv = tfhe.make_convolver(LOG_N, LEVEL, K, LOG_BASIS)
    gauss = DiscreteGaussian(3.2)
    key = jax.random.PRNGKey(11)
    k1, k2, k3 = jax.random.split(key, 3)
    lwe_secret = (jax.random.bits(k1, (N_LWE,), dtype=jnp.uint32) & 1).astype(
        jnp.uint32
    )
    glwe_secret = (jax.random.bits(k2, (K, N), dtype=jnp.uint32) & 1).astype(
        jnp.uint32
    )
    bsk = make_bootstrap_key(k3, lwe_secret, glwe_secret, basis, gauss, conv)
    test_poly = jnp.full(N, DELTA, dtype=jnp.uint32)
    return basis, conv, gauss, lwe_secret, glwe_secret, bsk, test_poly


def _trivial_lwe(mu):
    ct = np.zeros(N_LWE + 1, dtype=np.uint32)
    ct[N_LWE] = mu % (1 << 32)
    return jnp.asarray(ct)


def _encrypt_lwe(key, mu, secret, sigma=3.2):
    g = DiscreteGaussian(sigma)
    a = jax.random.bits(key, (N_LWE,), dtype=jnp.uint32)
    e = g.sample_torus32(jax.random.fold_in(key, 1), ())
    b = jnp.sum(a * secret, dtype=jnp.uint32) + jnp.uint32(mu % (1 << 32)) + e
    return jnp.concatenate([a, b[None]])


def test_bootstrap_sign_trivial(setup):
    basis, conv, gauss, lwe_secret, glwe_secret, bsk, test_poly = setup
    # phase in the lower torus half (positive): output ~ +DELTA
    out_pos = bootstrap(conv, basis, bsk, _trivial_lwe(1 << 29), test_poly, LOG_N)
    from primus_fhe_tpu.lattice.lwe import phase_torus32

    flat_secret = glwe_secret.reshape(-1)
    ph = _centered(phase_torus32(out_pos, flat_secret))
    assert abs(ph - DELTA) < DELTA // 2, ph
    # phase in the upper half (negative): output ~ -DELTA
    out_neg = bootstrap(
        conv, basis, bsk, _trivial_lwe((1 << 32) - (1 << 29)), test_poly, LOG_N
    )
    ph = _centered(phase_torus32(out_neg, flat_secret))
    assert abs(ph + DELTA) < DELTA // 2, ph


def test_bootstrap_encrypted(setup):
    basis, conv, gauss, lwe_secret, glwe_secret, bsk, test_poly = setup
    from primus_fhe_tpu.lattice.lwe import phase_torus32

    flat_secret = glwe_secret.reshape(-1)
    key = jax.random.PRNGKey(5)
    ct = _encrypt_lwe(key, 1 << 29, lwe_secret)
    out = bootstrap(conv, basis, bsk, ct, test_poly, LOG_N)
    ph = _centered(phase_torus32(out, flat_secret))
    assert abs(ph - DELTA) < DELTA // 2, ph


def test_bootstrap_batched(setup):
    basis, conv, gauss, lwe_secret, glwe_secret, bsk, test_poly = setup
    from primus_fhe_tpu.lattice.lwe import phase_torus32

    flat_secret = glwe_secret.reshape(-1)
    cts = jnp.stack(
        [
            _trivial_lwe(1 << 29),
            _trivial_lwe((1 << 32) - (1 << 29)),
            _trivial_lwe(1 << 30),
        ]
    )
    out = bootstrap(conv, basis, bsk, cts, test_poly, LOG_N)
    assert out.shape == (3, N + 1)
    phs = _centered(phase_torus32(out, flat_secret))
    assert abs(phs[0] - DELTA) < DELTA // 2
    assert abs(phs[1] + DELTA) < DELTA // 2
    assert abs(phs[2] - DELTA) < DELTA // 2


def test_programmable_bootstrap_lut(setup):
    """PBS: bootstrap with an arbitrary LUT evaluates f(m) homomorphically."""
    from primus_fhe_tpu.boot.blind_rotate import lut_test_polynomial
    from primus_fhe_tpu.lattice.lwe import phase_torus32

    basis, conv, gauss, lwe_secret, glwe_secret, bsk, _ = setup
    flat_secret = glwe_secret.reshape(-1)
    message_bits = 2  # messages 0..3 in the lower torus half
    delta = 1 << 29  # bucket size: 2^32 / 2^(bits+1)
    table = np.array([(7 - 2 * m) * (1 << 26) for m in range(4)], dtype=np.uint32)
    tp = lut_test_polynomial(table, LOG_N, message_bits)
    for m in range(3):  # stay inside the lower half (no sign wrap)
        ct = _trivial_lwe(m * delta)
        out = bootstrap(conv, basis, bsk, ct, tp, LOG_N)
        ph = _centered(phase_torus32(out, flat_secret))
        expect = _centered(np.asarray(table[m], dtype=np.uint32))
        assert abs(int(ph) - int(expect)) < 1 << 24, (m, ph, expect)
