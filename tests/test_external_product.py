"""TFHE external product integration test.

Reference pattern: crates/primus_lattice/tests/tfhe_external_product.rs —
encrypt a message GLWE, build a GGSW of a small multiplier, run the
external product, decrypt, and verify the product message within the noise
bound.  The exact CRT-NTT backend means transform noise is zero; the only
noise is encryption Gaussian + gadget approximation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from primus_fhe_tpu.decompose import ApproxSignedBasis32
from primus_fhe_tpu.distr.sampling import DiscreteGaussian
from primus_fhe_tpu.lattice import glwe as glwe_mod
from primus_fhe_tpu.lattice import tfhe
import pytest

LOG_N = 5
N = 1 << LOG_N
K = 1  # glwe dimension (mask polys)
LOG_BASIS = 8
LEVEL = 3
SIGMA = 3.2


def _setup(seed=0):
    basis = ApproxSignedBasis32(None, LOG_BASIS, reverse_length=LEVEL)
    conv = tfhe.make_convolver(LOG_N, LEVEL, K, LOG_BASIS)
    gauss = DiscreteGaussian(SIGMA)
    key = jax.random.PRNGKey(seed)
    ks, kg, ke, km = jax.random.split(key, 4)
    secret = (jax.random.bits(ks, (K, N), dtype=jnp.uint32) & 1).astype(jnp.uint32)
    return basis, conv, gauss, secret, kg, ke, km


def _centered(x):
    x = np.asarray(x).astype(np.int64)
    return np.where(x >= 1 << 31, x - (1 << 32), x)


@pytest.mark.slow
def test_external_product_by_one():
    basis, conv, gauss, secret, kg, ke, km = _setup(1)
    # message in the high bits: Delta = 2^28, small payload
    delta = 1 << 28
    msg = np.zeros(N, dtype=np.uint32)
    msg[0] = 3 * delta
    msg[2] = 1 * delta
    ct = glwe_mod.encrypt_torus(ke, jnp.asarray(msg), secret, gauss, conv)
    ggsw = tfhe.ggsw_encrypt_torus(kg, 1, secret, basis, gauss, conv)
    key_ntt = tfhe.ggsw_to_ntt(conv, ggsw)
    out = tfhe.external_product(conv, basis, ct, key_ntt)
    phase = glwe_mod.phase_torus(out, secret, conv)
    err = _centered(np.asarray(phase) - msg)
    # noise must be far below Delta/2
    assert np.abs(err).max() < delta // 4, np.abs(err).max()


def test_external_product_by_monomial():
    basis, conv, gauss, secret, kg, ke, km = _setup(2)
    delta = 1 << 28
    msg = np.zeros(N, dtype=np.uint32)
    msg[0] = delta
    ct = glwe_mod.encrypt_torus(ke, jnp.asarray(msg), secret, gauss, conv)
    # GGSW of X^5: message poly with coeff 1 at degree 5
    mu = np.zeros(N, dtype=np.uint32)
    mu[5] = 1
    ggsw = tfhe.ggsw_encrypt_torus(kg, jnp.asarray(mu), secret, basis, gauss, conv)
    key_ntt = tfhe.ggsw_to_ntt(conv, ggsw)
    out = tfhe.external_product(conv, basis, ct, key_ntt)
    phase = glwe_mod.phase_torus(out, secret, conv)
    expect = np.zeros(N, dtype=np.uint32)
    expect[5] = delta
    err = _centered(np.asarray(phase) - expect)
    assert np.abs(err).max() < delta // 4, np.abs(err).max()


def test_external_product_by_zero_kills_message():
    basis, conv, gauss, secret, kg, ke, km = _setup(3)
    delta = 1 << 28
    msg = np.full(N, delta, dtype=np.uint32)
    ct = glwe_mod.encrypt_torus(ke, jnp.asarray(msg), secret, gauss, conv)
    ggsw = tfhe.ggsw_encrypt_torus(kg, 0, secret, basis, gauss, conv)
    key_ntt = tfhe.ggsw_to_ntt(conv, ggsw)
    out = tfhe.external_product(conv, basis, ct, key_ntt)
    phase = glwe_mod.phase_torus(out, secret, conv)
    err = _centered(phase)
    assert np.abs(err).max() < delta // 4, np.abs(err).max()


def test_glwe_encrypt_decrypt():
    basis, conv, gauss, secret, kg, ke, km = _setup(4)
    delta = 1 << 24
    msg = (np.arange(N, dtype=np.uint32) % 16) * delta
    ct = glwe_mod.encrypt_torus(ke, jnp.asarray(msg), secret, gauss, conv)
    phase = glwe_mod.phase_torus(ct, secret, conv)
    err = _centered(np.asarray(phase) - msg)
    assert np.abs(err).max() < 64  # just gaussian noise
