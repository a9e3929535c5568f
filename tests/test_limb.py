"""Differential tests: u32 limb kernels vs arbitrary-precision Python ints."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primus_fhe_tpu.numeric import (
    U64,
    from_u64_pair,
    mul_wide_u32,
    to_u64_pair,
    u64_add,
    u64_ge,
    u64_lt,
    u64_min,
    u64_mul_hi,
    u64_mul_lo,
    u64_mul_wide,
    u64_neg,
    u64_shl,
    u64_shr,
    u64_sub,
)

rng = random.Random(0xF0E)
M64 = (1 << 64) - 1


def _rand_u64_batch(n, bits=64):
    return np.array([rng.getrandbits(bits) for _ in range(n)], dtype=np.uint64)


@pytest.fixture(scope="module")
def pairs():
    a = _rand_u64_batch(512)
    b = _rand_u64_batch(512)
    # Edge patterns front-loaded.
    edge = np.array(
        [0, 1, M64, M64 - 1, 1 << 32, (1 << 32) - 1, 1 << 63, (1 << 63) - 1],
        dtype=np.uint64,
    )
    a[: len(edge)] = edge
    b[: len(edge)] = edge[::-1]
    return a, b


def test_mul_wide_u32(pairs):
    a, b = pairs
    a32 = (a & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    b32 = (b & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    lo, hi = mul_wide_u32(jnp.asarray(a32), jnp.asarray(b32))
    expect = a32.astype(object) * b32.astype(object)
    got = (np.asarray(hi).astype(object) << 32) | np.asarray(lo).astype(object)
    assert (got == expect).all()


def test_u64_roundtrip(pairs):
    a, _ = pairs
    assert (from_u64_pair(to_u64_pair(a)) == a).all()


def test_u64_add_sub_neg(pairs):
    a, b = pairs
    ua, ub = to_u64_pair(a), to_u64_pair(b)
    ai, bi = a.astype(object), b.astype(object)
    assert (from_u64_pair(u64_add(ua, ub)).astype(object) == (ai + bi) & M64).all()
    assert (from_u64_pair(u64_sub(ua, ub)).astype(object) == (ai - bi) & M64).all()
    assert (from_u64_pair(u64_neg(ua)).astype(object) == (-ai) & M64).all()


def test_u64_mul(pairs):
    a, b = pairs
    ua, ub = to_u64_pair(a), to_u64_pair(b)
    ai, bi = a.astype(object), b.astype(object)
    prod = ai * bi
    assert (from_u64_pair(u64_mul_lo(ua, ub)).astype(object) == prod & M64).all()
    assert (from_u64_pair(u64_mul_hi(ua, ub)).astype(object) == prod >> 64).all()
    lo, hi = u64_mul_wide(ua, ub)
    got = (from_u64_pair(hi).astype(object) << 64) | from_u64_pair(lo).astype(object)
    assert (got == prod).all()


def test_u64_compare_min(pairs):
    a, b = pairs
    ua, ub = to_u64_pair(a), to_u64_pair(b)
    assert (np.asarray(u64_lt(ua, ub)) == (a < b)).all()
    assert (np.asarray(u64_ge(ua, ub)) == (a >= b)).all()
    assert (from_u64_pair(u64_min(ua, ub)) == np.minimum(a, b)).all()


def test_u64_shifts(pairs):
    a, _ = pairs
    ua = to_u64_pair(a)
    ai = a.astype(object)
    for k in (0, 1, 7, 31, 32, 33, 63):
        assert (from_u64_pair(u64_shr(ua, k)).astype(object) == ai >> k).all(), k
        assert (from_u64_pair(u64_shl(ua, k)).astype(object) == (ai << k) & M64).all(), k


def test_jit_composability():
    a = to_u64_pair(np.array([12345678901234567, 2**63 - 1], dtype=np.uint64))

    @jax.jit
    def f(x: U64):
        return u64_add(u64_mul_hi(x, x), x)

    out = from_u64_pair(f(a))
    expect = [((v * v) >> 64) + v & M64 for v in (12345678901234567, 2**63 - 1)]
    assert out.astype(object).tolist() == expect
