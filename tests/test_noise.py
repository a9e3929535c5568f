"""Noise model sanity: predictions bound measured noise in live pipelines."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primus_fhe_tpu import noise
from primus_fhe_tpu.decompose import ApproxSignedBasis32
from primus_fhe_tpu.distr.sampling import DiscreteGaussian
from primus_fhe_tpu.lattice import glwe as glwe_mod, tfhe

LOG_N, N, K, LB, LV, SIG = 5, 32, 1, 8, 3, 3.2


def _centered(x):
    x = np.asarray(x).astype(np.int64)
    return np.where(x >= 1 << 31, x - (1 << 32), x)


def test_external_product_noise_bounded_by_model():
    basis = ApproxSignedBasis32(None, LB, reverse_length=LV)
    conv = tfhe.make_convolver(LOG_N, LV, K, LB)
    gauss = DiscreteGaussian(SIG)
    key = jax.random.PRNGKey(17)
    ks, kg, ke = jax.random.split(key, 3)
    secret = (jax.random.bits(ks, (K, N), dtype=jnp.uint32) & 1).astype(jnp.uint32)
    msg = jnp.zeros(N, dtype=jnp.uint32)
    ct = glwe_mod.encrypt_torus(ke, msg, secret, gauss, conv)
    ggsw = tfhe.ggsw_encrypt_torus(kg, 1, secret, basis, gauss, conv)
    out = tfhe.external_product(conv, basis, ct, tfhe.ggsw_to_ntt(conv, ggsw))
    err = _centered(glwe_mod.phase_torus(out, secret, conv))

    pred = noise.external_product(
        noise.fresh_lwe(SIG), SIG, N, K, LV, LB, basis.drop_bits
    )
    # measured RMS must sit within ~6x of the model (and above /100 of it —
    # catches both underestimates and grossly loose models)
    rms = float(np.sqrt((err.astype(np.float64) ** 2).mean()))
    assert rms < 6 * pred.stddev, (rms, pred.stddev)
    assert rms > pred.stddev / 100, (rms, pred.stddev)


def test_budget_arithmetic():
    fresh = noise.fresh_lwe(3.2)
    doubled = noise.add(fresh, fresh)
    assert doubled.variance == pytest.approx(2 * fresh.variance)
    scaled = noise.scalar_mul(fresh, 3)
    assert scaled.variance == pytest.approx(9 * fresh.variance)
    assert fresh.decryption_failure_margin(message_bits=2) > 1e6  # tiny noise


def test_bootstrap_budget_for_toy_params():
    basis = ApproxSignedBasis32(None, LB, reverse_length=LV)
    br = noise.blind_rotate(8, SIG, N, K, LV, LB, basis.drop_bits)
    ks = noise.key_switch(br, SIG, N * (K), 3, 8, 8)
    ms = noise.modulus_switch(ks, 8, LOG_N + 1)
    # the gates tests decode 1/8-encoded bits: margin must exceed 1
    assert ms.decryption_failure_margin(message_bits=1) > 1, ms.bits()
