"""Sharded four-step MXU NTT vs the single-device fused kernels.

8 virtual CPU devices, interpret-mode Pallas: the lane-sharded pass-1 /
all-to-all / row-sharded pass-2 composition must be BIT-EXACT against
``mxu8_fused_forward64`` / ``mxu8_fused_inverse64`` (same matrices, same
folds) for Solinas and general primes, both 7- and 8-plane tiers.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from primus_fhe_tpu.numeric.limb import U64, to_u64_pair
from primus_fhe_tpu.ops.ntt_mxu8 import (
    Mxu8NttPlan64,
    mxu8_fused_forward64,
    mxu8_fused_inverse64,
    mxu8_fused_inverse64_mul,
)
from primus_fhe_tpu.parallel.coeff_sharded_mxu import (
    from_coeff_layout,
    get_sharded_plan,
    ntt_layout_to_flat,
    sharded_mxu_forward64,
    sharded_mxu_inverse64,
    to_coeff_layout,
)

pytestmark = [
    pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices"),
    pytest.mark.slow,
]

LOG_N = 10
N = 1 << LOG_N
BATCH = 8
PRIMES = [
    1125899906826241,  # 50-bit golden (Solinas fold path)
    1125899906629633,  # 50-bit non-Solinas (general-q path)
    1152921504606830593,  # 60-bit golden (8-plane tier)
]


def _mesh():
    return jax.sharding.Mesh(np.array(jax.devices()[:8]), ("d",))


@pytest.mark.parametrize("q", PRIMES)
def test_sharded_forward_matches_fused(q):
    rng = np.random.default_rng(1)
    x = to_u64_pair(rng.integers(0, q, size=(BATCH, N), dtype=np.uint64))
    plan = Mxu8NttPlan64(LOG_N, q)
    want = mxu8_fused_forward64(plan, x, 1)

    mesh = _mesh()
    xc = to_coeff_layout(x, plan.A, plan.B)
    got3 = sharded_mxu_forward64(mesh, "d", LOG_N, q, xc, 1)
    got = ntt_layout_to_flat(got3)
    assert (np.asarray(got.lo) == np.asarray(want.lo)).all()
    assert (np.asarray(got.hi) == np.asarray(want.hi)).all()


@pytest.mark.parametrize("q", PRIMES)
def test_sharded_roundtrip_with_mul(q):
    """fwd -> fused pointwise-mul inverse (the gadget-product shape)."""
    from primus_fhe_tpu.parallel.coeff_sharded_mxu import ntt_layout_from_flat

    rng = np.random.default_rng(2)
    x = to_u64_pair(rng.integers(0, q, size=(BATCH, N), dtype=np.uint64))
    key = rng.integers(0, q, size=N, dtype=np.uint64)
    plan = Mxu8NttPlan64(LOG_N, q)
    mul_tabs = plan.inverse_mul_tabs(key)

    f_ref = mxu8_fused_forward64(plan, x, 1)
    want = mxu8_fused_inverse64_mul(plan, f_ref, mul_tabs, 1)

    mesh = _mesh()
    xc = to_coeff_layout(x, plan.A, plan.B)
    f3 = sharded_mxu_forward64(mesh, "d", LOG_N, q, xc, 1)
    y3 = sharded_mxu_inverse64(mesh, "d", LOG_N, q, f3, 1, mul_tabs=mul_tabs)
    got = from_coeff_layout(y3)
    assert (np.asarray(got.lo) == np.asarray(x.lo) * 0 + np.asarray(got.lo)).all()
    wl, wh = np.asarray(want.lo), np.asarray(want.hi)
    assert (np.asarray(got.lo) == wl).all()
    assert (np.asarray(got.hi) == wh).all()


def test_sharded_inverse_plain():
    q = PRIMES[0]
    rng = np.random.default_rng(3)
    x = to_u64_pair(rng.integers(0, q, size=(BATCH, N), dtype=np.uint64))
    plan = Mxu8NttPlan64(LOG_N, q)
    f_ref = mxu8_fused_forward64(plan, x, 1)
    want = mxu8_fused_inverse64(plan, f_ref, 1)
    assert (np.asarray(want.lo) == np.asarray(x.lo)).all()  # round trip

    from primus_fhe_tpu.parallel.coeff_sharded_mxu import ntt_layout_from_flat

    mesh = _mesh()
    f3 = ntt_layout_from_flat(f_ref, plan.A, plan.B)
    y3 = sharded_mxu_inverse64(mesh, "d", LOG_N, q, f3, 1)
    got = from_coeff_layout(y3)
    assert (np.asarray(got.lo) == np.asarray(x.lo)).all()
    assert (np.asarray(got.hi) == np.asarray(x.hi)).all()
