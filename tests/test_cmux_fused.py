"""Fused CMux step vs the composed path — bit-exact differential test.

The fused two-kernel step (rotate+decompose+lift+NTT, then MAC+INTT+CRT+
add) must equal ``acc + external_product(rotate(acc, d) - acc, key)``
computed by the staged jnp path, for every batch row and degree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primus_fhe_tpu.boot.blind_rotate import _rotate_glwe
from primus_fhe_tpu.decompose import ApproxSignedBasis32
from primus_fhe_tpu.lattice import tfhe

LOG_N = 8
N = 1 << LOG_N
K = 1
LOG_BASIS = 8
LEVEL = 2


@pytest.fixture(scope="module")
def setup():
    basis = ApproxSignedBasis32(None, LOG_BASIS, reverse_length=LEVEL)
    conv = tfhe.make_convolver(LOG_N, LEVEL, K, LOG_BASIS)
    # force the pallas plans even off-TPU (interpret mode runs them on CPU)
    if not conv.use_pallas:
        from primus_fhe_tpu.ops.ntt_pallas import PallasNttPlan32

        conv.pallas_plans = [PallasNttPlan32(LOG_N, p) for p in conv.primes]
    rng = np.random.default_rng(42)
    key_coeff = jnp.asarray(
        rng.integers(0, 1 << 32, size=(K + 1, LEVEL, K + 1, N), dtype=np.uint64).astype(
            np.uint32
        )
    )
    key_ntt = tfhe.ggsw_to_ntt(conv, key_coeff)
    acc = jnp.asarray(
        rng.integers(0, 1 << 32, size=(3, K + 1, N), dtype=np.uint64).astype(np.uint32)
    )
    return basis, conv, key_ntt, acc


def test_fused_step_matches_composed(setup):
    basis, conv, key_ntt, acc = setup
    from primus_fhe_tpu.ops.cmux_fused import fused_cmux_step

    degrees = jnp.asarray([0, 7, 2 * N - 3], dtype=jnp.int32)
    got = np.asarray(fused_cmux_step(conv, basis, acc, degrees, key_ntt))

    for i, d in enumerate([0, 7, 2 * N - 3]):
        rotated = _rotate_glwe(acc[i], jnp.int32(d), N)
        delta = tfhe.external_product(conv, basis, rotated - acc[i], key_ntt)
        want = np.asarray(acc[i] + delta)
        np.testing.assert_array_equal(got[i], want)


@pytest.mark.slow
def test_fused_step_batch_sizes(setup):
    basis, conv, key_ntt, _ = setup
    from primus_fhe_tpu.ops.cmux_fused import fused_cmux_step

    rng = np.random.default_rng(9)
    for bsz in (1, 2, 5):
        acc = jnp.asarray(
            rng.integers(0, 1 << 32, size=(bsz, K + 1, N), dtype=np.uint64).astype(
                np.uint32
            )
        )
        degrees = jnp.asarray(rng.integers(0, 2 * N, size=bsz), dtype=jnp.int32)
        got = np.asarray(fused_cmux_step(conv, basis, acc, degrees, key_ntt))
        for i in range(bsz):
            rotated = _rotate_glwe(acc[i], degrees[i], N)
            delta = tfhe.external_product(conv, basis, rotated - acc[i], key_ntt)
            np.testing.assert_array_equal(got[i], np.asarray(acc[i] + delta))
