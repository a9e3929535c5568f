"""Table-driven (dynamic-q) MXU forward vs the static fused kernel.

One compiled program must serve every modulus: feed per-residue table
packs to the SAME kernel and require bit-exact agreement with the
per-modulus static kernels.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from primus_fhe_tpu.numeric.limb import U64, to_u64_pair
from primus_fhe_tpu.ops.ntt_mxu8 import Mxu8NttPlan64, mxu8_fused_forward64
from primus_fhe_tpu.ops.ntt_mxu8_dyn import (
    DynMxuTables64,
    mxu8_dyn_forward64,
    stack_dyn_tables,
)

LOG_N = 10
N = 1 << LOG_N
BATCH = 4
MODULI = [1125899906826241, 1125899906629633]  # Solinas + general 50-bit
# 8-plane tier (q < 2^62): 60-bit Solinas golden prime + a general 60-bit
# neighbour + the 62-bit non-Solinas guard-path prime
MODULI60 = [1152921504606830593, 1152921504606748673]
Q62 = 4611686018425815041


@pytest.mark.parametrize("q,out_factor", [
    (MODULI[0], 1),
    pytest.param(MODULI[0], 4, marks=pytest.mark.slow),
    pytest.param(MODULI[1], 1, marks=pytest.mark.slow),
    pytest.param(MODULI[1], 4, marks=pytest.mark.slow),
    (MODULI60[0], 1),  # 8-plane Solinas
    pytest.param(MODULI60[1], 1, marks=pytest.mark.slow),
    pytest.param(Q62, 1, marks=pytest.mark.slow),  # 62-bit guard sums
    pytest.param(Q62, 4, marks=pytest.mark.slow),
])
def test_dyn_matches_static(q, out_factor):
    rng = np.random.default_rng(0)
    x = to_u64_pair(rng.integers(0, q, size=(BATCH, N), dtype=np.uint64))
    want = mxu8_fused_forward64(Mxu8NttPlan64(LOG_N, q), x, out_factor)
    pack = DynMxuTables64(LOG_N, q)
    got = mxu8_dyn_forward64(
        tuple(jnp.asarray(t) for t in pack.tables),
        (LOG_N, pack.A, pack.B, pack.planes), x, out_factor,
    )
    assert (np.asarray(got.lo) == np.asarray(want.lo)).all()
    assert (np.asarray(got.hi) == np.asarray(want.hi)).all()


@pytest.mark.slow
def test_one_program_two_moduli():
    """The SAME jitted function transforms both residues (tables as
    runtime arguments — the shard_map usage shape)."""
    stacked, shapes = stack_dyn_tables(LOG_N, MODULI)
    rng = np.random.default_rng(1)

    @jax.jit
    def run(tabs, lo, hi):
        return mxu8_dyn_forward64(tabs, shapes, U64(lo, hi), 1).lo

    for i, q in enumerate(MODULI):
        x = to_u64_pair(rng.integers(0, q, size=(BATCH, N), dtype=np.uint64))
        tabs = tuple(jnp.asarray(t[i]) for t in stacked)
        got = run(tabs, x.lo, x.hi)
        want = mxu8_fused_forward64(Mxu8NttPlan64(LOG_N, q), x, 1)
        assert (np.asarray(got) == np.asarray(want.lo)).all(), q


@pytest.mark.slow
def test_one_program_mixed_tiers():
    """A stack mixing the 7- and 8-plane tiers builds homogeneously at 8
    planes; the SAME jitted program transforms a 50-bit and a 60-bit
    residue bit-exactly."""
    mixed = [MODULI[0], MODULI60[0]]
    stacked, shapes = stack_dyn_tables(LOG_N, mixed)
    assert shapes[3] == 8
    rng = np.random.default_rng(3)

    @jax.jit
    def run(tabs, lo, hi):
        return mxu8_dyn_forward64(tabs, shapes, U64(lo, hi), 1).lo

    for i, q in enumerate(mixed):
        x = to_u64_pair(rng.integers(0, q, size=(BATCH, N), dtype=np.uint64))
        tabs = tuple(jnp.asarray(t[i]) for t in stacked)
        got = run(tabs, x.lo, x.hi)
        want = mxu8_fused_forward64(Mxu8NttPlan64(LOG_N, q), x, 1)
        assert (np.asarray(got) == np.asarray(want.lo)).all(), q


@pytest.mark.parametrize("q", [
    MODULI[0],
    pytest.param(MODULI[1], marks=pytest.mark.slow),
    pytest.param(MODULI60[0], marks=pytest.mark.slow),
    pytest.param(Q62, marks=pytest.mark.slow),
])
def test_dyn_inverse_roundtrip(q):
    """dyn fwd -> dyn inverse (with and without fused key mul) vs the
    static kernels, bit-exact."""
    from primus_fhe_tpu.ops.ntt_mxu8 import mxu8_fused_inverse64_mul
    from primus_fhe_tpu.ops.ntt_mxu8_dyn import (
        DynMxuInvTables64,
        mxu8_dyn_inverse64,
    )

    rng = np.random.default_rng(2)
    x = to_u64_pair(rng.integers(0, q, size=(BATCH, N), dtype=np.uint64))
    key = rng.integers(0, q, size=N, dtype=np.uint64)
    plan = Mxu8NttPlan64(LOG_N, q)
    mul_tabs = plan.inverse_mul_tabs(key)

    f = mxu8_fused_forward64(plan, x, 1)
    want = mxu8_fused_inverse64_mul(plan, f, mul_tabs, 1)

    ipack = DynMxuInvTables64(LOG_N, q)
    ishapes = (LOG_N, ipack.A, ipack.B, ipack.planes)
    itabs = tuple(jnp.asarray(t) for t in ipack.tables)
    got = mxu8_dyn_inverse64(
        itabs, ishapes, f, 1,
        mul_tabs=tuple(jnp.asarray(t) for t in mul_tabs),
    )
    assert (np.asarray(got.lo) == np.asarray(want.lo)).all()
    assert (np.asarray(got.hi) == np.asarray(want.hi)).all()

    # plain inverse closes the round trip
    got2 = mxu8_dyn_inverse64(itabs, ishapes, f, 1)
    assert (np.asarray(got2.lo) == np.asarray(x.lo)).all()
