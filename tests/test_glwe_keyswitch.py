"""GLWE -> GLWE key switch: phase preserved across key and dimension change."""

import jax
import jax.numpy as jnp
import numpy as np

from primus_fhe_tpu.decompose import ApproxSignedBasis32
from primus_fhe_tpu.distr.sampling import DiscreteGaussian
from primus_fhe_tpu.lattice import glwe as glwe_mod
from primus_fhe_tpu.lattice.glwe_keyswitch import (
    glwe_key_switch,
    make_glwe_keyswitch_key,
)
from primus_fhe_tpu.lattice.tfhe import external_product_bound_bits
from primus_fhe_tpu.transforms.torus import TorusConvolver32
import pytest

LOG_N, N = 5, 32
K_IN, K_OUT = 2, 1
LB, LV = 8, 3


def _centered(x):
    x = np.asarray(x).astype(np.int64)
    return np.where(x >= 1 << 31, x - (1 << 32), x)


@pytest.mark.slow
def test_glwe_key_switch_preserves_phase():
    basis = ApproxSignedBasis32(None, LB, reverse_length=LV)
    conv = TorusConvolver32(
        LOG_N, external_product_bound_bits(N, LV, max(K_IN, K_OUT), LB)
    )
    gauss = DiscreteGaussian(3.2)
    key = jax.random.PRNGKey(13)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s_in = (jax.random.bits(k1, (K_IN, N), dtype=jnp.uint32) & 1).astype(jnp.uint32)
    s_out = (jax.random.bits(k2, (K_OUT, N), dtype=jnp.uint32) & 1).astype(jnp.uint32)
    ksk = make_glwe_keyswitch_key(k3, s_in, s_out, basis, gauss, conv)
    assert ksk.shape == (conv.count, K_IN, LV, K_OUT + 1, N)

    delta = 1 << 27
    msg = (np.arange(N, dtype=np.uint32) % 8) * delta
    ct = glwe_mod.encrypt_torus(k4, jnp.asarray(msg), s_in, gauss, conv)
    out = glwe_key_switch(conv, basis, ct, ksk)
    assert out.shape == (K_OUT + 1, N)
    ph = glwe_mod.phase_torus(out, s_out, conv)
    err = _centered(np.asarray(ph) - msg)
    assert np.abs(err).max() < delta // 4, np.abs(err).max()


@pytest.mark.slow
def test_pack_lwes():
    """Pack 4 LWEs into one GLWE: coefficients 0..3 decrypt the messages."""
    from primus_fhe_tpu.lattice.glwe_keyswitch import (
        make_packing_keyswitch_key,
        pack_lwes,
    )

    N_LWE = 16
    basis = ApproxSignedBasis32(None, LB, reverse_length=LV)
    conv = TorusConvolver32(
        LOG_N, external_product_bound_bits(N, LV, 1, LB)
    )
    gauss = DiscreteGaussian(3.2)
    key = jax.random.PRNGKey(23)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lwe_s = (jax.random.bits(k1, (N_LWE,), dtype=jnp.uint32) & 1).astype(jnp.uint32)
    glwe_s = (jax.random.bits(k2, (1, N), dtype=jnp.uint32) & 1).astype(jnp.uint32)
    pksk = make_packing_keyswitch_key(k3, lwe_s, glwe_s, basis, gauss, conv)

    delta = 1 << 28
    msgs = [1, 3, 0, 2]
    cts = []
    for j, m in enumerate(msgs):
        a = jax.random.bits(jax.random.fold_in(k4, j), (N_LWE,), dtype=jnp.uint32)
        b = jnp.sum(a * lwe_s, dtype=jnp.uint32) + jnp.uint32(m * delta)
        cts.append(jnp.concatenate([a, b[None]]))
    packed = pack_lwes(conv, basis, jnp.stack(cts), pksk)
    assert packed.shape == (2, N)
    ph = _centered(np.asarray(glwe_mod.phase_torus(packed, glwe_s, conv)))
    for j, m in enumerate(msgs):
        err = abs(int(ph[j]) - m * delta)
        err = min(err, (1 << 32) - err)
        assert err < delta // 4, (j, ph[j], m * delta)
