"""Normal-order transform variants (reference order-variant parity).

The reference's ``NttTable`` documents normal-order, bit-reversed, and
scrambled entry points (``crates/primus_ntt/src/ntt/primitive.rs:27-48``);
the hot device pipelines here keep the bit-reversed contract, and these
wrappers provide the normal-order public surface.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from primus_fhe_tpu.numeric.limb import U64, to_u64_pair
from primus_fhe_tpu.transforms import ntt
from primus_fhe_tpu.transforms.plan import build_plan32, build_plan64

Q32 = 1073692673
Q64 = 1125899906826241
LOG_N = 8
N = 1 << LOG_N


def test_bit_reverse_permute_involution():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 32, size=(2, N), dtype=np.uint32))
    y = ntt.bit_reverse_permute(ntt.bit_reverse_permute(x, LOG_N), LOG_N)
    assert (np.asarray(y) == np.asarray(x)).all()


def test_normal_order_32_matches_permuted_fast_path():
    plan = build_plan32(LOG_N, Q32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, Q32, size=(3, N), dtype=np.uint32))
    f_norm = ntt.forward32_normal_order(plan, x)
    f_rev = ntt.forward32(plan, x)
    rev = ntt._bit_reverse_indices(LOG_N)
    assert (np.asarray(f_norm) == np.asarray(f_rev)[..., rev]).all()
    back = ntt.inverse32_normal_order(plan, f_norm)
    assert (np.asarray(back) == np.asarray(x)).all()


def test_normal_order_64_roundtrip():
    plan = build_plan64(LOG_N, Q64)
    rng = np.random.default_rng(2)
    x = to_u64_pair(rng.integers(0, Q64, size=(2, N), dtype=np.uint64))
    f = ntt.forward64_normal_order(plan, x)
    back = ntt.inverse64_normal_order(plan, f)
    assert (np.asarray(back.lo) == np.asarray(x.lo)).all()
    assert (np.asarray(back.hi) == np.asarray(x.hi)).all()


def test_normal_order_spectrum_is_natural_evaluation_order():
    """Slot j of the normal-order spectrum = evaluation at psi^(2j+1)."""
    plan = build_plan32(LOG_N, Q32)
    rng = np.random.default_rng(3)
    coeffs = rng.integers(0, Q32, size=N, dtype=np.uint32)
    f = np.asarray(ntt.forward32_normal_order(plan, jnp.asarray(coeffs)))
    from primus_fhe_tpu.golden.model import GoldenNtt

    g = GoldenNtt(LOG_N, Q32)
    psi = g.root
    for j in [0, 1, 5, N - 1]:
        root = pow(int(psi), 2 * j + 1, Q32)
        val = 0
        for i, c in enumerate(coeffs):
            val = (val + int(c) * pow(root, i, Q32)) % Q32
        assert f[j] == val
