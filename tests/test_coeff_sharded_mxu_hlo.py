"""Collective structure of the sharded four-step MXU NTT.

The design claim is ONE all-to-all per transform direction (vs log2(D)
ppermutes in the butterfly-exchange path): pin it in the optimized HLO so
a regression reintroducing extra collectives fails CI.
"""

import numpy as np
import jax
import pytest

from primus_fhe_tpu.numeric.limb import to_u64_pair
from primus_fhe_tpu.parallel.coeff_sharded_mxu import (
    _fwd_fn,
    _inv_fn,
    get_sharded_plan,
    to_coeff_layout,
)

pytestmark = [
    pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices"),
    pytest.mark.slow,
]

LOG_N, N, BATCH = 10, 1024, 8
Q = 1125899906826241


def _collective_counts(txt: str) -> dict:
    out: dict = {}
    for kind in ("all-to-all", "collective-permute", "all-reduce",
                 "all-gather", "reduce-scatter"):
        # count op starts only (async pairs print -start/-done)
        n = 0
        for line in txt.splitlines():
            if f" {kind}(" in line or f" {kind}-start(" in line:
                n += 1
        out[kind] = n
    return out


def test_forward_is_one_all_to_all():
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("d",))
    plan = get_sharded_plan(LOG_N, Q, BATCH)
    rng = np.random.default_rng(0)
    x = to_u64_pair(rng.integers(0, Q, size=(BATCH, N), dtype=np.uint64))
    xc = to_coeff_layout(x, plan.A, plan.B)
    fn = _fwd_fn(mesh, "d", LOG_N, Q, BATCH, 1)
    # _fwd_fn returns a lambda closing over the jitted fn; trace via call
    import jax.numpy as jnp

    jitted = jax.jit(lambda lo, hi: fn(lo, hi))
    txt = jitted.lower(xc.lo, xc.hi).compile().as_text()
    counts = _collective_counts(txt)
    assert counts["all-to-all"] == 2, counts  # one per u32 half
    assert counts["collective-permute"] == 0, counts
    assert counts["all-reduce"] == 0, counts
    assert counts["all-gather"] == 0, counts
    assert counts["reduce-scatter"] == 0, counts


def test_roundtrip_is_two_all_to_alls():
    from primus_fhe_tpu.parallel.coeff_sharded_mxu import (
        sharded_mxu_forward64,
        sharded_mxu_inverse64,
    )
    from primus_fhe_tpu.ops.ntt_mxu8 import Mxu8NttPlan64

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("d",))
    plan = Mxu8NttPlan64(LOG_N, Q)
    rng = np.random.default_rng(1)
    key = rng.integers(0, Q, size=N, dtype=np.uint64)
    mul_tabs = plan.inverse_mul_tabs(key)
    x = to_u64_pair(rng.integers(0, Q, size=(BATCH, N), dtype=np.uint64))
    xc = to_coeff_layout(x, plan.A, plan.B)

    def rt(lo, hi):
        from primus_fhe_tpu.numeric.limb import U64

        f = sharded_mxu_forward64(mesh, "d", LOG_N, Q, U64(lo, hi), 1)
        y = sharded_mxu_inverse64(
            mesh, "d", LOG_N, Q, f, 1, mul_tabs=mul_tabs
        )
        return y.lo, y.hi

    txt = jax.jit(rt).lower(xc.lo, xc.hi).compile().as_text()
    counts = _collective_counts(txt)
    assert counts["all-to-all"] == 4, counts  # 2 halves x 2 directions
    assert counts["collective-permute"] == 0, counts
    assert counts["all-reduce"] == 0, counts
