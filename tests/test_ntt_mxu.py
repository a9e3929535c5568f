"""MXU four-step NTT: differential tests vs the golden model.

Mirrors the reference's cross-backend equivalence suite
(crates/primus_ntt/tests/ntt.rs) — the int8-matmul backend must agree
bit-exactly with the golden scalar model on the reference primes.
"""

import numpy as np
import pytest

from primus_fhe_tpu.golden.model import GoldenNtt
from primus_fhe_tpu.numeric import from_u64_pair, to_u64_pair
from primus_fhe_tpu.ops.ntt_mxu import MxuNttPlan64, mxu_forward64


@pytest.mark.parametrize(
    "log_n,q",
    [
        (8, 536813569),  # 30-bit reference prime
        (8, 1125899906826241),  # 50-bit reference bench prime
        (7, 562949953392641),  # ~49-bit reference prime, odd log_n
        (12, 1125899906826241),  # the headline bench shape
    ],
)
def test_mxu_forward_matches_golden(log_n, q):
    n = 1 << log_n
    g = GoldenNtt(log_n, q)
    rng = np.random.default_rng(42 + log_n)
    vals = rng.integers(0, q, size=(3, n), dtype=np.uint64)
    plan = MxuNttPlan64(log_n, q)
    out = from_u64_pair(mxu_forward64(plan, to_u64_pair(vals), 1))
    for row in range(vals.shape[0]):
        expect = g.forward([int(x) for x in vals[row]])
        assert [int(x) for x in out[row]] == expect


def test_mxu_forward_lazy_ranges():
    log_n, q = 8, 1125899906826241
    n = 1 << log_n
    rng = np.random.default_rng(7)
    vals = rng.integers(0, q, size=(2, n), dtype=np.uint64)
    plan = MxuNttPlan64(log_n, q)
    v = to_u64_pair(vals)
    canon = from_u64_pair(mxu_forward64(plan, v, 1))
    for f in (2, 4):
        lazy = from_u64_pair(mxu_forward64(plan, v, f))
        assert (lazy < f * q).all()
        assert ((lazy % q) == canon).all()


def test_mxu_forward_lazy_input():
    # contract allows any representative < 2^56
    log_n, q = 7, 1125899906826241
    n = 1 << log_n
    rng = np.random.default_rng(11)
    vals = rng.integers(0, q, size=(2, n), dtype=np.uint64)
    shifted = vals + np.uint64(3 * q)
    plan = MxuNttPlan64(log_n, q)
    a = from_u64_pair(mxu_forward64(plan, to_u64_pair(vals), 1))
    b = from_u64_pair(mxu_forward64(plan, to_u64_pair(shifted), 1))
    assert (a == b).all()


def test_mxu_rejects_large_q():
    with pytest.raises(ValueError):
        MxuNttPlan64(10, 1152921504606830593)  # 60-bit: beyond 8-limb bound


@pytest.mark.slow
def test_mxu_fused_matches_golden():
    from primus_fhe_tpu.ops.ntt_mxu import mxu_fused_forward64

    for log_n, q in [(8, 1125899906826241), (8, 536813569), (7, 562949953392641)]:
        n = 1 << log_n
        g = GoldenNtt(log_n, q)
        rng = np.random.default_rng(5 + log_n)
        vals = rng.integers(0, q, size=(5, n), dtype=np.uint64)
        plan = MxuNttPlan64(log_n, q)
        out = from_u64_pair(mxu_fused_forward64(plan, to_u64_pair(vals), 1, 4))
        for row in range(vals.shape[0]):
            expect = g.forward([int(x) for x in vals[row]])
            assert [int(x) for x in out[row]] == expect, (log_n, q, row)


def test_mxu_fused_lazy_and_padding():
    from primus_fhe_tpu.ops.ntt_mxu import mxu_fused_forward64

    log_n, q = 7, 1125899906826241
    n = 1 << log_n
    rng = np.random.default_rng(3)
    vals = rng.integers(0, q, size=(3, n), dtype=np.uint64)  # pad 3 -> 4
    plan = MxuNttPlan64(log_n, q)
    v = to_u64_pair(vals)
    canon = from_u64_pair(mxu_fused_forward64(plan, v, 1, 4))
    lazy = from_u64_pair(mxu_fused_forward64(plan, v, 4, 4))
    assert (lazy < 4 * q).all()
    assert ((lazy % q) == canon).all()


@pytest.mark.parametrize(
    "log_n,q",
    [
        (8, 536813569),
        (8, 1125899906826241),
        (7, 562949953392641),
    ],
)
def test_mxu_inverse_matches_golden(log_n, q):
    from primus_fhe_tpu.ops.ntt_mxu import mxu_fused_inverse64, mxu_inverse64

    n = 1 << log_n
    g = GoldenNtt(log_n, q)
    rng = np.random.default_rng(13 + log_n)
    vals = rng.integers(0, q, size=(3, n), dtype=np.uint64)
    plan = MxuNttPlan64(log_n, q)
    out = from_u64_pair(mxu_inverse64(plan, to_u64_pair(vals), 1))
    outf = from_u64_pair(mxu_fused_inverse64(plan, to_u64_pair(vals), 1, 4))
    for row in range(vals.shape[0]):
        expect = g.inverse([int(x) for x in vals[row]])
        assert [int(x) for x in out[row]] == expect, ("einsum", row)
        assert [int(x) for x in outf[row]] == expect, ("fused", row)


@pytest.mark.slow
def test_mxu_roundtrip_lazy():
    """fwd (lazy out) -> inv accepts the lazy representative; exact values."""
    from primus_fhe_tpu.ops.ntt_mxu import mxu_fused_inverse64

    log_n, q = 8, 1125899906826241
    n = 1 << log_n
    rng = np.random.default_rng(17)
    vals = rng.integers(0, q, size=(4, n), dtype=np.uint64)
    plan = MxuNttPlan64(log_n, q)
    from primus_fhe_tpu.ops.ntt_mxu import mxu_fused_forward64

    f = mxu_fused_forward64(plan, to_u64_pair(vals), 4, 4)
    rt = from_u64_pair(mxu_fused_inverse64(plan, f, 1, 4))
    assert (rt == vals).all()
    lazy = from_u64_pair(mxu_fused_inverse64(plan, f, 2, 4))
    assert (lazy < 2 * q).all()
    assert ((lazy % q) == vals).all()


@pytest.mark.slow
def test_mxu_fused_inverse_mul():
    """Fused pointwise-multiply + inverse == golden pointwise then inverse,
    for both a Solinas and a general prime."""
    from primus_fhe_tpu.ops.ntt_mxu import (
        mxu_fused_forward64,
        mxu_fused_inverse64_mul,
    )

    for log_n, q in [(8, 1125899906826241), (8, 536813569)]:
        n = 1 << log_n
        g = GoldenNtt(log_n, q)
        rng = np.random.default_rng(29)
        vals = rng.integers(0, q, size=(3, n), dtype=np.uint64)
        key = rng.integers(0, q, size=(n,), dtype=np.uint64)
        plan = MxuNttPlan64(log_n, q)
        tile = 2
        tabs = plan.inverse_mul_tabs(key, tile)
        f = mxu_fused_forward64(plan, to_u64_pair(vals), 4, tile)
        got = from_u64_pair(mxu_fused_inverse64_mul(plan, f, tabs, 1, tile))
        for row in range(vals.shape[0]):
            fwd = g.forward([int(x) for x in vals[row]])
            prod = [fv * int(kv) % q for fv, kv in zip(fwd, key)]
            expect = g.inverse(prod)
            assert [int(x) for x in got[row]] == expect, (q, row)


def test_mxu_fused_large_n():
    """The headline shape (log_n >= 10, lane-aligned default split) is
    bit-exact through the fused kernels — guards the alignment defaults."""
    from primus_fhe_tpu.ops.ntt_mxu import (
        mxu_fused_forward64,
        mxu_fused_inverse64,
    )

    log_n, q = 10, 1125899906826241
    n = 1 << log_n
    g = GoldenNtt(log_n, q)
    rng = np.random.default_rng(31)
    vals = rng.integers(0, q, size=(2, n), dtype=np.uint64)
    plan = MxuNttPlan64(log_n, q)
    assert plan.B % 128 == 0 and plan.Bi % 128 == 0
    f = mxu_fused_forward64(plan, to_u64_pair(vals), 4, 2)
    fwd = from_u64_pair(mxu_fused_forward64(plan, to_u64_pair(vals), 1, 2))
    for row in range(vals.shape[0]):
        assert [int(x) for x in fwd[row]] == g.forward([int(x) for x in vals[row]])
    rt = from_u64_pair(mxu_fused_inverse64(plan, f, 1, 2))
    assert (rt == vals).all()


def test_mxu_nondefault_h1():
    """h1 override: golden equivalence away from the square split, and
    out-of-range h1 rejected (advisor finding)."""
    from primus_fhe_tpu.ops.ntt_mxu import mxu_inverse64

    log_n, q = 8, 1125899906826241
    n = 1 << log_n
    g = GoldenNtt(log_n, q)
    rng = np.random.default_rng(23)
    vals = rng.integers(0, q, size=(2, n), dtype=np.uint64)
    plan = MxuNttPlan64(log_n, q, h1=5)
    out = from_u64_pair(mxu_forward64(plan, to_u64_pair(vals), 1))
    inv = from_u64_pair(mxu_inverse64(plan, to_u64_pair(vals), 1))
    for row in range(vals.shape[0]):
        assert [int(x) for x in out[row]] == g.forward([int(x) for x in vals[row]])
        assert [int(x) for x in inv[row]] == g.inverse([int(x) for x in vals[row]])
    with pytest.raises(ValueError):
        MxuNttPlan64(8, q, h1=9)
    with pytest.raises(ValueError):
        MxuNttPlan64(8, q, h1=-1)
