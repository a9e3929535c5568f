"""Differential tests: modular ops vs the Python golden model.

Covers the Barrett-32/64 tiers with the reference's golden-set primes
(BASELINE.md): q = 536813569 / 1073692673 (30-bit tier) and
562949953392641 / 1125899906826241 / 1152921504606830593 (Barrett-64 tier).
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from primus_fhe_tpu.golden import (
    barrett_lazy_reduce,
    barrett_lazy_reduce_wide,
    shoup_mul_lazy,
    shoup_quotient,
)
from primus_fhe_tpu.modular import barrett32, barrett64, modops, shoup32, shoup64
from primus_fhe_tpu.modular.factor import (
    factor_mul32,
    factor_mul64,
    factor_mul_lazy32,
    factor_mul_lazy64,
)
from primus_fhe_tpu.numeric import from_u64_pair, to_u64_pair

rng = random.Random(42)

PRIMES32 = [536813569, 1073692673, (1 << 31) - 19]  # last one: q close to 2^31
PRIMES64 = [562949953392641, 1125899906826241, 1152921504606830593]


def _rand_mod(q, n):
    return np.array([rng.randrange(q) for _ in range(n)], dtype=np.uint64)


# ---------------------------------------------------------------------------
# 32-bit path
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("q", PRIMES32)
def test_add_sub_neg32(q):
    a = _rand_mod(q, 256).astype(np.uint32)
    b = _rand_mod(q, 256).astype(np.uint32)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    qj = jnp.uint32(q)
    assert (np.asarray(modops.add32(ja, jb, qj)) == (a.astype(np.uint64) + b) % q).all()
    assert (
        np.asarray(modops.sub32(ja, jb, qj))
        == (a.astype(np.int64) - b) % q
    ).all()
    assert (np.asarray(modops.neg32(ja, qj)) == (-a.astype(np.int64)) % q).all()


@pytest.mark.parametrize("q", PRIMES32)
def test_barrett_mul32(q):
    m = barrett32(q)
    a = _rand_mod(q, 256).astype(np.uint32)
    b = _rand_mod(q, 256).astype(np.uint32)
    got = np.asarray(modops.mul32(jnp.asarray(a), jnp.asarray(b), m))
    expect = (a.astype(object) * b.astype(object)) % q
    assert (got.astype(object) == expect).all()


@pytest.mark.parametrize("q", PRIMES32)
def test_barrett_lazy_reduce32_matches_golden(q):
    m = barrett32(q)
    vals = np.array(
        [rng.getrandbits(32) for _ in range(256)] + [0, 1, q, 2 * q, (1 << 32) - 1],
        dtype=np.uint32,
    )
    got = np.asarray(modops.barrett_lazy_reduce32(jnp.asarray(vals), m))
    expect = np.array(
        [barrett_lazy_reduce(int(v), q, 32) for v in vals], dtype=np.uint32
    )
    assert (got == expect).all()
    assert (got.astype(np.uint64) < 2 * q).all()


@pytest.mark.parametrize("q", PRIMES32)
def test_barrett_wide_reduce32_matches_golden(q):
    m = barrett32(q)
    lo = np.array([rng.getrandbits(32) for _ in range(256)], dtype=np.uint32)
    # value must be < q * 2^32 for the lazy bound.
    hi = np.array([rng.randrange(q) for _ in range(256)], dtype=np.uint32)
    got = np.asarray(
        modops.barrett_lazy_reduce_wide32(jnp.asarray(lo), jnp.asarray(hi), m)
    )
    expect = np.array(
        [barrett_lazy_reduce_wide(int(l), int(h), q, 32) for l, h in zip(lo, hi)],
        dtype=np.uint32,
    )
    assert (got == expect).all()
    assert (got.astype(np.uint64) < 2 * q).all()


@pytest.mark.parametrize("q", PRIMES32[:2])
def test_shoup32(q):
    w = _rand_mod(q, 128).astype(np.uint32)
    y = _rand_mod(q, 128).astype(np.uint32)
    f = shoup32(w, q)
    assert (
        np.asarray(f.quotient).astype(object)
        == np.array([shoup_quotient(int(x), q, 32) for x in w], dtype=object)
    ).all()
    lazy = np.asarray(factor_mul_lazy32(jnp.asarray(y), f, jnp.uint32(q)))
    expect_lazy = np.array(
        [shoup_mul_lazy(int(b), int(a), shoup_quotient(int(a), q, 32), q, 32) for a, b in zip(w, y)],
        dtype=np.uint32,
    )
    assert (lazy == expect_lazy).all()
    got = np.asarray(factor_mul32(jnp.asarray(y), f, jnp.uint32(q)))
    expect = (w.astype(object) * y.astype(object)) % q
    assert (got.astype(object) == expect).all()


@pytest.mark.parametrize("q", PRIMES32[:1])
def test_dot32(q):
    m = barrett32(q)
    a = _rand_mod(q, 1024).astype(np.uint32)
    b = _rand_mod(q, 1024).astype(np.uint32)
    got = int(np.asarray(modops.dot32(jnp.asarray(a), jnp.asarray(b), m)))
    expect = int(sum(int(x) * int(y) for x, y in zip(a, b)) % q)
    assert got == expect


# ---------------------------------------------------------------------------
# 64-bit path
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("q", PRIMES64)
def test_add_sub_neg64(q):
    a = _rand_mod(q, 256)
    b = _rand_mod(q, 256)
    ua, ub = to_u64_pair(a), to_u64_pair(b)
    uq = to_u64_pair(np.uint64(q))
    ai, bi = a.astype(object), b.astype(object)
    assert (from_u64_pair(modops.add64(ua, ub, uq)).astype(object) == (ai + bi) % q).all()
    assert (from_u64_pair(modops.sub64(ua, ub, uq)).astype(object) == (ai - bi) % q).all()
    assert (from_u64_pair(modops.neg64(ua, uq)).astype(object) == (-ai) % q).all()


@pytest.mark.parametrize("q", PRIMES64)
def test_barrett_mul64(q):
    m = barrett64(q)
    a = _rand_mod(q, 256)
    b = _rand_mod(q, 256)
    got = from_u64_pair(modops.mul64(to_u64_pair(a), to_u64_pair(b), m))
    expect = (a.astype(object) * b.astype(object)) % q
    assert (got.astype(object) == expect).all()


@pytest.mark.parametrize("q", PRIMES64)
def test_barrett_wide_reduce64_matches_golden(q):
    m = barrett64(q)
    lo = _rand_u64 = np.array([rng.getrandbits(64) for _ in range(128)], dtype=np.uint64)
    hi = np.array([rng.randrange(q) for _ in range(128)], dtype=np.uint64)
    got = from_u64_pair(
        modops.barrett_lazy_reduce_wide64(to_u64_pair(lo), to_u64_pair(hi), m)
    )
    expect = np.array(
        [barrett_lazy_reduce_wide(int(l), int(h), q, 64) for l, h in zip(lo, hi)],
        dtype=object,
    )
    assert (got.astype(object) == expect).all()
    assert (got.astype(object) < 2 * q).all()


@pytest.mark.parametrize("q", PRIMES64)
def test_shoup64(q):
    w = _rand_mod(q, 128)
    y = _rand_mod(q, 128)
    f = shoup64(w, q)
    uq = to_u64_pair(np.uint64(q))
    lazy = from_u64_pair(factor_mul_lazy64(to_u64_pair(y), f, uq))
    expect_lazy = np.array(
        [
            shoup_mul_lazy(int(b), int(a), shoup_quotient(int(a), q, 64), q, 64)
            for a, b in zip(w, y)
        ],
        dtype=object,
    )
    assert (lazy.astype(object) == expect_lazy).all()
    got = from_u64_pair(factor_mul64(to_u64_pair(y), f, uq))
    expect = (w.astype(object) * y.astype(object)) % q
    assert (got.astype(object) == expect).all()


@pytest.mark.parametrize("q", PRIMES64[:1])
def test_dot64(q):
    m = barrett64(q)
    a = _rand_mod(q, 333)
    b = _rand_mod(q, 333)
    got = int(from_u64_pair(modops.dot64(to_u64_pair(a), to_u64_pair(b), m)))
    expect = int(sum(int(x) * int(y) for x, y in zip(a, b)) % q)
    assert got == expect


@pytest.mark.parametrize("q", [1152921504606830593])
def test_mul_add64(q):
    m = barrett64(q)
    a, b, c = _rand_mod(q, 64), _rand_mod(q, 64), _rand_mod(q, 64)
    got = from_u64_pair(
        modops.mul_add64(to_u64_pair(a), to_u64_pair(b), to_u64_pair(c), m)
    )
    expect = (a.astype(object) * b.astype(object) + c.astype(object)) % q
    assert (got.astype(object) == expect).all()
