"""DCRT fast-path tier selection and byte-radix plan split defaults.

The TPU-only routing branch (`transforms/dcrt.dcrt_forward64_fast`)
cannot execute on the CPU test mesh, but its selection predicate and the
plan geometry it relies on are pure host logic — pinned here so a tier
regression (e.g. the 60-bit primes silently falling back to the VPU
butterfly) fails in CI.
"""

from primus_fhe_tpu.ops.ntt_mxu8 import Mxu8NttPlan64, _planes_for
from primus_fhe_tpu.transforms.dcrt import _mxu_ok


def test_tier_selection_covers_reference_primes():
    # reference bench/golden primes (crates/primus_ntt/tests/ntt.rs,
    # benches/bench_u64.rs:8)
    for q in (
        1073692673,  # 30-bit
        562949953392641,  # 49-bit
        1125899906826241,  # 50-bit
        1152921504606830593,  # 60-bit golden prime
        4611686018425815041,  # 62-bit (ntt_large's Q62)
    ):
        assert _mxu_ok(12, q), q
        assert _mxu_ok(8, q), q
    assert not _mxu_ok(7, 1125899906826241)  # B=128 needs log_n >= 8
    assert not _mxu_ok(12, (1 << 62) + 9)  # beyond the byte-radix range


def test_planes_tiers():
    assert _planes_for(536813569) == 4  # u32 tier
    assert _planes_for(1125899906826241) == 7
    assert _planes_for(1152921504606830593) == 8


def test_small_n_split_keeps_lane_alignment():
    # q - 1 = 2^14 * (2^36 - 1): NTT-friendly up to log_n = 13
    for log_n in range(8, 14):
        plan = Mxu8NttPlan64(log_n, 1125899906826241)
        assert plan.A * plan.B == 1 << log_n
        assert plan.B >= 128, (log_n, plan.B)
    # N=256 reaches the minimum pass-1 height
    assert Mxu8NttPlan64(8, 1125899906826241).A == 2
