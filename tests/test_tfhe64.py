"""64-bit-torus external product: trivial-key exactness in the >2^53 regime."""

import random

import jax.numpy as jnp
import numpy as np

from primus_fhe_tpu.decompose import ApproxSignedBasis64
from primus_fhe_tpu.lattice.tfhe64 import (
    external_product64,
    ggsw_to_ntt64,
    make_convolver64,
)
from primus_fhe_tpu.numeric import U64, from_u64_pair, to_u64_pair

rng = random.Random(6464)

LOG_N = 4
N = 1 << LOG_N
K = 1
LB = 16
LV = 4
M64 = 1 << 64


def _trivial_ggsw64(basis, mu_poly):
    """Noise-free GGSW(mu): row r level l = mu * scalar_l at component r."""
    level = basis.decompose_length
    out = np.zeros((K + 1, level, K + 1, N), dtype=np.uint64)
    for r in range(K + 1):
        for l in range(level):
            out[r, l, r] = (mu_poly * basis.scalars[l]) % M64
    return to_u64_pair(out)


def test_external_product64_identity_full_range():
    basis = ApproxSignedBasis64(None, LB, reverse_length=LV)
    conv = make_convolver64(LOG_N, LV, K, LB)
    mu = np.zeros(N, dtype=np.uint64)
    mu[0] = 1  # X^0
    key = ggsw_to_ntt64(conv, _trivial_ggsw64(basis, mu.astype(object)))

    # full-range 64-bit GLWE values — beyond the f64 FFT's 2^53 precision
    glwe = np.array(
        [[rng.getrandbits(64) for _ in range(N)] for _ in range(K + 1)],
        dtype=np.uint64,
    )
    out = from_u64_pair(external_product64(conv, basis, to_u64_pair(glwe), key))
    # identity up to the gadget drop error (and exactly on dropped-bit-free
    # positions); drop = 64 - LV*LB = 0 here -> exact.
    assert basis.drop_bits == 0
    assert (out == glwe).all()


def test_external_product64_monomial():
    basis = ApproxSignedBasis64(None, LB, reverse_length=LV)
    conv = make_convolver64(LOG_N, LV, K, LB)
    mu = np.zeros(N, dtype=object)
    mu[3] = 1  # X^3
    key = ggsw_to_ntt64(conv, _trivial_ggsw64(basis, mu))
    glwe = np.array(
        [[rng.getrandbits(60) for _ in range(N)] for _ in range(K + 1)],
        dtype=np.uint64,
    )
    out = from_u64_pair(external_product64(conv, basis, to_u64_pair(glwe), key))

    def negacyclic_shift3(row):
        res = np.zeros(N, dtype=object)
        for j, c in enumerate(row):
            k = j + 3
            if k < N:
                res[k] = (res[k] + int(c)) % M64
            else:
                res[k - N] = (res[k - N] - int(c)) % M64
        return res

    for comp in range(K + 1):
        expect = negacyclic_shift3(glwe[comp])
        assert out[comp].astype(object).tolist() == expect.tolist()
