"""Circuit bootstrapping: LWE(bit) -> GGSW(bit) -> external product.

Closes the fully-composable-circuit loop: the GGSW produced from an
encrypted bit must act as a homomorphic multiplier in an external product.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primus_fhe_tpu.boot import make_bootstrap_key
from primus_fhe_tpu.boot.circuit_bootstrap import (
    circuit_bootstrap,
    make_private_functional_ksk,
)
from primus_fhe_tpu.decompose import ApproxSignedBasis32
from primus_fhe_tpu.distr.sampling import DiscreteGaussian
from primus_fhe_tpu.lattice import glwe as glwe_mod, tfhe

pytestmark = pytest.mark.slow

LOG_N, N, K, N_LWE = 5, 32, 1, 8
LB_PBS, LV_PBS = 8, 3
LB_CB, LV_CB = 8, 2
LB_PRIV, LV_PRIV = 8, 3


def _centered(x):
    x = np.asarray(x).astype(np.int64)
    return np.where(x >= 1 << 31, x - (1 << 32), x)


@pytest.fixture(scope="module")
def ctx():
    basis_pbs = ApproxSignedBasis32(None, LB_PBS, reverse_length=LV_PBS)
    basis_cb = ApproxSignedBasis32(None, LB_CB, reverse_length=LV_CB)
    basis_priv = ApproxSignedBasis32(None, LB_PRIV, reverse_length=LV_PRIV)
    conv = tfhe.make_convolver(LOG_N, max(LV_PBS, LV_PRIV), K, 8)
    gauss = DiscreteGaussian(3.2)
    key = jax.random.PRNGKey(31)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    lwe_s = (jax.random.bits(k1, (N_LWE,), dtype=jnp.uint32) & 1).astype(jnp.uint32)
    glwe_s = (jax.random.bits(k2, (K, N), dtype=jnp.uint32) & 1).astype(jnp.uint32)
    bsk = make_bootstrap_key(k3, lwe_s, glwe_s, basis_pbs, gauss, conv)
    ext = glwe_s.reshape(-1)  # extracted key (k=1)
    # private KSKs: mask row j uses f = s_j * x; body row uses f = -x.
    priv_ksks = []
    for j in range(K):
        priv_ksks.append(
            make_private_functional_ksk(
                jax.random.fold_in(k4, j), glwe_s[j], ext, glwe_s,
                basis_priv, gauss, conv,
            )
        )
    minus_one = jnp.zeros(N, dtype=jnp.uint32).at[0].set(jnp.uint32(-1 & 0xFFFFFFFF))
    priv_ksks.append(
        make_private_functional_ksk(
            jax.random.fold_in(k4, K), minus_one, ext, glwe_s,
            basis_priv, gauss, conv,
        )
    )
    return basis_pbs, basis_cb, basis_priv, conv, gauss, lwe_s, glwe_s, bsk, priv_ksks, k5


def _encrypt_bit(key, bit, secret):
    a = jax.random.bits(key, (N_LWE,), dtype=jnp.uint32)
    b = jnp.sum(a * secret, dtype=jnp.uint32) + jnp.uint32(bit << 31)
    return jnp.concatenate([a, b[None]])


@pytest.mark.parametrize("bit", [0, 1])
def test_circuit_bootstrap_then_external_product(ctx, bit):
    basis_pbs, basis_cb, basis_priv, conv, gauss, lwe_s, glwe_s, bsk, priv_ksks, key = ctx
    ct_bit = _encrypt_bit(jax.random.fold_in(key, bit), bit, lwe_s)
    ggsw_coeff = circuit_bootstrap(
        conv, basis_pbs, bsk, conv, basis_cb, basis_priv, priv_ksks, ct_bit, LOG_N
    )
    assert ggsw_coeff.shape == (K + 1, LV_CB, K + 1, N)
    key_ntt = tfhe.ggsw_to_ntt(conv, ggsw_coeff)

    delta = 1 << 28
    msg = np.zeros(N, dtype=np.uint32)
    msg[0] = 3 * delta
    msg[4] = delta
    glwe_ct = glwe_mod.encrypt_torus(
        jax.random.fold_in(key, 10 + bit), jnp.asarray(msg), glwe_s, gauss, conv
    )
    out = tfhe.external_product(conv, basis_cb, glwe_ct, key_ntt)
    ph = _centered(np.asarray(glwe_mod.phase_torus(out, glwe_s, conv)))
    expect = msg.astype(np.int64) * bit
    err = np.abs(ph - _centered(expect.astype(np.uint32)))
    assert err.max() < delta // 2, (bit, err.max())
