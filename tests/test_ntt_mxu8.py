"""Byte-radix MXU NTT (ops/ntt_mxu8.py): differential tests vs golden.

Same cross-backend discipline as tests/test_ntt_mxu.py
(crates/primus_ntt/tests/ntt.rs pattern), now including the 60-bit tier
the 7-bit-limb kernel cannot reach: golden prime 1152921504606830593
(crates/primus_ntt/tests/ntt.rs / avx512 q < 2^62 range).
"""

import numpy as np
import pytest

from primus_fhe_tpu.golden.model import GoldenNtt
from primus_fhe_tpu.numeric import from_u64_pair, to_u64_pair
from primus_fhe_tpu.ops.ntt_mxu8 import (
    Mxu8NttPlan64,
    mxu8_fused_forward64,
    mxu8_fused_inverse64,
    mxu8_fused_inverse64_mul,
    mxu8_fused_roundtrip64_mul,
)

# (log_n, q): Solinas 50-bit bench prime (7 planes), 30-bit (7 planes),
# general non-Solinas prime (general-q paths), 60-bit Solinas golden
# prime (8 planes), ~49-bit reference prime.
PRIMES = [
    (8, 1125899906826241),
    (8, 536813569),
    (7, 562949953392641),
    (8, 1152921504606830593),
    (7, 998244353),  # non-Solinas NTT prime (119*2^23+1): general-q path
    (8, 4611686018425815041),  # 62-bit non-Solinas: guarded general-q sums
]


def test_planes_selection():
    assert Mxu8NttPlan64(6, 1125899906826241).planes == 7
    assert Mxu8NttPlan64(6, 1152921504606830593).planes == 8
    with pytest.raises(ValueError):
        Mxu8NttPlan64(6, (1 << 61) + 9)


@pytest.mark.parametrize("log_n,q", PRIMES)
def test_mxu8_forward_matches_golden(log_n, q):
    n = 1 << log_n
    g = GoldenNtt(log_n, q)
    rng = np.random.default_rng(42 + log_n)
    vals = rng.integers(0, q, size=(3, n), dtype=np.uint64)
    plan = Mxu8NttPlan64(log_n, q)
    out = from_u64_pair(mxu8_fused_forward64(plan, to_u64_pair(vals), 1, 2))
    for row in range(vals.shape[0]):
        expect = g.forward([int(x) for x in vals[row]])
        assert [int(x) for x in out[row]] == expect, (q, row)


@pytest.mark.parametrize("log_n,q", PRIMES)
def test_mxu8_inverse_matches_golden(log_n, q):
    n = 1 << log_n
    g = GoldenNtt(log_n, q)
    rng = np.random.default_rng(13 + log_n)
    vals = rng.integers(0, q, size=(3, n), dtype=np.uint64)
    plan = Mxu8NttPlan64(log_n, q)
    out = from_u64_pair(mxu8_fused_inverse64(plan, to_u64_pair(vals), 1, 2))
    for row in range(vals.shape[0]):
        expect = g.inverse([int(x) for x in vals[row]])
        assert [int(x) for x in out[row]] == expect, (q, row)


def test_mxu8_forward_lazy_ranges_and_input():
    log_n, q = 8, 1125899906826241
    n = 1 << log_n
    rng = np.random.default_rng(7)
    vals = rng.integers(0, q, size=(2, n), dtype=np.uint64)
    plan = Mxu8NttPlan64(log_n, q)
    v = to_u64_pair(vals)
    canon = from_u64_pair(mxu8_fused_forward64(plan, v, 1, 2))
    for f in (2, 4):
        lazy = from_u64_pair(mxu8_fused_forward64(plan, v, f, 2))
        assert (lazy < f * q).all()
        assert ((lazy % q) == canon).all()
    # lazy input representative (any u64 < 2^56 for the 7-plane tier)
    shifted = to_u64_pair(vals + np.uint64(3 * q))
    b = from_u64_pair(mxu8_fused_forward64(plan, shifted, 1, 2))
    assert (b == canon).all()


def test_mxu8_60bit_lazy_input():
    """8-plane tier accepts any u64 representative."""
    log_n, q = 7, 1152921504606830593
    vals = np.random.default_rng(3).integers(0, q, size=(2, 1 << log_n), dtype=np.uint64)
    plan = Mxu8NttPlan64(log_n, q)
    a = from_u64_pair(mxu8_fused_forward64(plan, to_u64_pair(vals), 1, 2))
    shifted = to_u64_pair(vals + np.uint64(7 * q))  # still < 2^64
    b = from_u64_pair(mxu8_fused_forward64(plan, shifted, 1, 2))
    assert (a == b).all()


@pytest.mark.parametrize(
    "log_n,q",
    [(8, 1125899906826241), (8, 1152921504606830593), (7, 998244353)],
)
def test_mxu8_fused_inverse_mul(log_n, q):
    n = 1 << log_n
    g = GoldenNtt(log_n, q)
    rng = np.random.default_rng(29)
    vals = rng.integers(0, q, size=(3, n), dtype=np.uint64)
    key = rng.integers(0, q, size=(n,), dtype=np.uint64)
    plan = Mxu8NttPlan64(log_n, q)
    tile = 2
    tabs = plan.inverse_mul_tabs(key, tile)
    f = mxu8_fused_forward64(plan, to_u64_pair(vals), 4, tile)
    got = from_u64_pair(mxu8_fused_inverse64_mul(plan, f, tabs, 1, tile))
    for row in range(vals.shape[0]):
        fwd = g.forward([int(x) for x in vals[row]])
        prod = [fv * int(kv) % q for fv, kv in zip(fwd, key)]
        expect = g.inverse(prod)
        assert [int(x) for x in got[row]] == expect, (q, row)


@pytest.mark.parametrize(
    "log_n,q",
    [
        (8, 1125899906826241),  # 7-plane Solinas (headline prime)
        (8, 1152921504606830593),  # 8-plane Solinas
        (7, 998244353),  # 4-plane general-q
        (7, 1099511603713),  # 7-plane general-q
        (7, 4611686018425815041),  # 8-plane general-q (guarded sums)
    ],
)
def test_mxu8_fused_roundtrip_mul(log_n, q):
    """The single-kernel round trip == golden fwd -> pointwise -> inv."""
    n = 1 << log_n
    g = GoldenNtt(log_n, q)
    rng = np.random.default_rng(31)
    vals = rng.integers(0, q, size=(4, n), dtype=np.uint64)
    key = rng.integers(0, q, size=(n,), dtype=np.uint64)
    plan = Mxu8NttPlan64(log_n, q)
    tile = 2
    tabs = plan.inverse_mul_tabs(key, tile)
    got = from_u64_pair(
        mxu8_fused_roundtrip64_mul(plan, to_u64_pair(vals), tabs, 1, tile)
    )
    for row in range(vals.shape[0]):
        fwd = g.forward([int(x) for x in vals[row]])
        prod = [fv * int(kv) % q for fv, kv in zip(fwd, key)]
        expect = g.inverse(prod)
        assert [int(x) for x in got[row]] == expect, (q, row)


def test_mxu8_headline_shape():
    """log_n=12 lane-aligned default split, forward+inverse round trip."""
    log_n, q = 12, 1125899906826241
    n = 1 << log_n
    rng = np.random.default_rng(37)
    vals = rng.integers(0, q, size=(2, n), dtype=np.uint64)
    plan = Mxu8NttPlan64(log_n, q)
    assert plan.B % 128 == 0
    f = mxu8_fused_forward64(plan, to_u64_pair(vals), 4, 2)
    rt = from_u64_pair(mxu8_fused_inverse64(plan, f, 1, 2))
    assert (rt == vals).all()


@pytest.mark.parametrize(
    "log_n,q",
    [
        (8, 536813569),  # 4-plane tier
        (8, 1125899906826241),  # 7-plane tier
        (8, 1152921504606830593),  # 8-plane Solinas
        (8, 4611686018425815041),  # 8-plane general-q (guarded sums)
    ],
)
def test_mxu8_extreme_inputs(log_n, q):
    """Bound-stressing inputs: all-0x00 bytes (every signed byte = -128)
    and the max in-contract value with all-0xFF bytes (every byte =
    +127), plus q-1 — the patterns that drive digit sums and the packed
    16-bit groups toward their bias/overflow margins."""
    from primus_fhe_tpu.ops.ntt_mxu8 import _planes_for

    n = 1 << log_n
    g = GoldenNtt(log_n, q)
    plan = Mxu8NttPlan64(log_n, q)
    planes = _planes_for(q)
    hi = min((1 << (8 * planes)) - 1, (1 << 64) - 1)
    rows = [
        [0] * n,
        [hi] * n,
        [q - 1] * n,
        [hi if i % 2 else 0 for i in range(n)],
    ]
    vals = np.array(rows, dtype=np.uint64)
    out = from_u64_pair(mxu8_fused_forward64(plan, to_u64_pair(vals), 1, 2))
    for r, row in enumerate(rows):
        expect = g.forward([int(x) % q for x in row])
        got = [int(x) for x in np.asarray(out)[r]]
        assert got == expect, (q, r)


def test_twiddle8_wide_halves_sound():
    """Worst-case soundness of the general-q twiddle/finish folds: the
    8-plane B-contraction can PROVE recombined halves up to ~2^49, past
    the narrow Shoup's y < 2^48 contract.  _twiddle8/_finish8 must route
    such halves through the full lazy Shoup (regression for the
    narrow-overrun fix); exercised here directly on synthetic halves at
    the bound, checked against exact Python arithmetic."""
    import jax
    import jax.numpy as jnp

    from primus_fhe_tpu.ops.mxu_common import (
        _const64,
        _make_shoup_lazy64,
        _make_shoup_narrow64,
        _shoup_tabs,
    )
    from primus_fhe_tpu.ops.ntt_mxu8 import _twiddle8

    q = 4611686018425815041  # 62-bit non-Solinas
    rng = np.random.default_rng(11)
    # halves just past the narrow bound (the proven 8-plane worst case)
    ylo = rng.integers(0, 1 << 49, size=(8, 128), dtype=np.uint64)
    yhi = rng.integers(0, 1 << 49, size=(8, 128), dtype=np.uint64)
    tw = rng.integers(1, q, size=(8, 128), dtype=np.uint64).astype(object)
    t_t = [jnp.asarray(t) for t in _shoup_tabs(tw, q)]
    t32 = [
        jnp.asarray(t)
        for t in _shoup_tabs((tw * ((1 << 32) % q)) % q, q)
    ]
    corr = rng.integers(0, q, size=(8, 128), dtype=np.uint64).astype(object)
    ct = [
        jnp.asarray(t)
        for t in (
            np.vectorize(lambda v: int(v) & 0xFFFFFFFF, otypes=[np.uint32])(corr),
            np.vectorize(lambda v: int(v) >> 32, otypes=[np.uint32])(corr),
        )
    ]
    shoup = _make_shoup_lazy64(q, exact=False)
    narrow = _make_shoup_narrow64(q)
    pair = lambda a: (
        jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray((a >> np.uint64(32)).astype(np.uint32)),
    )
    bounds = (1 << 49, 1 << 49, 0)  # force the full-lazy route

    @jax.jit
    def run():
        return _twiddle8(
            q, None, shoup, narrow, pair(ylo), pair(yhi), ct, t_t, t32, ct,
            _const64(q), bounds=bounds,
        )

    rlo, rhi = run()
    got = np.asarray(rlo).astype(np.uint64) | (
        np.asarray(rhi).astype(np.uint64) << np.uint64(32)
    )
    for i in range(8):
        for j in range(0, 128, 17):
            want = (
                int(ylo[i, j]) * int(tw[i, j])
                + int(yhi[i, j]) * int(tw[i, j]) * (1 << 32)
            ) % q
            want = (want + int(corr[i, j])) % q
            assert int(got[i, j]) % q == want, (i, j)
            assert int(got[i, j]) < 16 * q  # lazy but bounded
