"""NTT differential tests vs the golden model and the reference's prime set.

Reference pattern: crates/primus_ntt/tests/ntt.rs — identical fwd/inv/
monomial outputs across the Barrett-32/52/64 tiers, with roundtrip and
naive-negacyclic-product integration checks.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primus_fhe_tpu.golden import GoldenNtt, naive_negacyclic_mul
from primus_fhe_tpu.modular import barrett32, barrett64
from primus_fhe_tpu.numeric import from_u64_pair, to_u64_pair
from primus_fhe_tpu.transforms import (
    build_plan32,
    build_plan64,
    forward32,
    forward64,
    inverse32,
    inverse64,
    monomial32,
    monomial64,
    negacyclic_mul32,
    negacyclic_mul64,
)

rng = random.Random(1234)

# 30-bit-tier primes from the reference test/bench set; small n keeps the
# Python golden model fast.
P32 = 536813569  # tests/ntt.rs:17
P32B = 1073692673  # benches/bench_u64.rs
# Barrett-64-tier primes.
P64 = 562949953392641  # tests/ntt.rs:55
P64B = 1152921504606830593  # tests/ntt.rs:93


def _rand_poly(q, n):
    return np.array([rng.randrange(q) for _ in range(n)], dtype=np.uint64)


@pytest.mark.parametrize("q,log_n", [(P32, 8), (P32B, 9)])
def test_forward32_matches_golden(q, log_n):
    n = 1 << log_n
    g = GoldenNtt(log_n, q)
    plan = build_plan32(log_n, q)
    a = _rand_poly(q, n)
    got = np.asarray(forward32(plan, jnp.asarray(a.astype(np.uint32))))
    expect = g.forward([int(x) for x in a])
    assert got.astype(object).tolist() == expect


@pytest.mark.parametrize("q,log_n", [(P32, 8)])
def test_inverse32_roundtrip_and_golden(q, log_n):
    n = 1 << log_n
    g = GoldenNtt(log_n, q)
    plan = build_plan32(log_n, q)
    a = _rand_poly(q, n)
    ja = jnp.asarray(a.astype(np.uint32))
    fwd = forward32(plan, ja)
    back = np.asarray(inverse32(plan, fwd))
    assert back.astype(object).tolist() == [int(x) for x in a]
    expect_inv = g.inverse([int(x) for x in np.asarray(fwd)])
    assert np.asarray(inverse32(plan, fwd)).astype(object).tolist() == expect_inv


@pytest.mark.parametrize("q,log_n", [(P32, 8)])
def test_negacyclic_mul32_vs_naive(q, log_n):
    n = 1 << log_n
    plan = build_plan32(log_n, q)
    m = barrett32(q)
    a = _rand_poly(q, n)
    b = _rand_poly(q, n)
    got = np.asarray(
        negacyclic_mul32(plan, m, jnp.asarray(a.astype(np.uint32)), jnp.asarray(b.astype(np.uint32)))
    )
    expect = naive_negacyclic_mul([int(x) for x in a], [int(x) for x in b], q)
    assert got.astype(object).tolist() == expect


@pytest.mark.parametrize("q,log_n", [(P32, 8)])
def test_monomial32(q, log_n):
    n = 1 << log_n
    g = GoldenNtt(log_n, q)
    plan = build_plan32(log_n, q)
    for degree in (0, 1, 5, n - 1, n, 2 * n - 1, 3):
        got = np.asarray(monomial32(plan, jnp.int32(degree)))
        expect = g.monomial(1, degree)
        assert got.astype(object).tolist() == expect, degree
        got_neg = np.asarray(monomial32(plan, jnp.int32(degree), negate=True))
        expect_neg = g.monomial(q - 1, degree)
        assert got_neg.astype(object).tolist() == expect_neg, degree


@pytest.mark.parametrize("q,log_n", [(P64, 8), (P64B, 7)])
def test_forward64_matches_golden(q, log_n):
    n = 1 << log_n
    g = GoldenNtt(log_n, q)
    plan = build_plan64(log_n, q)
    a = _rand_poly(q, n)
    got = from_u64_pair(forward64(plan, to_u64_pair(a)))
    expect = g.forward([int(x) for x in a])
    assert got.astype(object).tolist() == expect


@pytest.mark.parametrize("q,log_n", [(P64, 8), (P64B, 7)])
def test_inverse64_roundtrip(q, log_n):
    n = 1 << log_n
    plan = build_plan64(log_n, q)
    a = _rand_poly(q, n)
    fwd = forward64(plan, to_u64_pair(a))
    back = from_u64_pair(inverse64(plan, fwd))
    assert back.astype(object).tolist() == [int(x) for x in a]


@pytest.mark.parametrize("q,log_n", [(P64, 7)])
def test_negacyclic_mul64_vs_naive(q, log_n):
    n = 1 << log_n
    plan = build_plan64(log_n, q)
    m = barrett64(q)
    a = _rand_poly(q, n)
    b = _rand_poly(q, n)
    got = from_u64_pair(negacyclic_mul64(plan, m, to_u64_pair(a), to_u64_pair(b)))
    expect = naive_negacyclic_mul([int(x) for x in a], [int(x) for x in b], q)
    assert got.astype(object).tolist() == expect


@pytest.mark.parametrize("q,log_n", [(P64, 7)])
def test_monomial64(q, log_n):
    n = 1 << log_n
    g = GoldenNtt(log_n, q)
    plan = build_plan64(log_n, q)
    for degree in (0, 1, n - 1, n + 2):
        got = from_u64_pair(monomial64(plan, jnp.int32(degree)))
        assert got.astype(object).tolist() == g.monomial(1, degree), degree


def test_batched_forward32():
    q, log_n = P32, 6
    n = 1 << log_n
    g = GoldenNtt(log_n, q)
    plan = build_plan32(log_n, q)
    batch = np.stack([_rand_poly(q, n) for _ in range(4)]).astype(np.uint32)
    got = np.asarray(forward32(plan, jnp.asarray(batch)))
    for row_in, row_out in zip(batch, got):
        assert row_out.astype(object).tolist() == g.forward([int(x) for x in row_in])


def test_forward32_jit():
    q, log_n = P32, 6
    plan = build_plan32(log_n, q)
    a = _rand_poly(q, 1 << log_n).astype(np.uint32)
    eager = np.asarray(forward32(plan, jnp.asarray(a)))
    jitted = np.asarray(jax.jit(forward32, static_argnames="out_factor")(plan, jnp.asarray(a)))
    assert (eager == jitted).all()


def test_lazy_output_factor32():
    q, log_n = P32, 6
    plan = build_plan32(log_n, q)
    a = _rand_poly(q, 1 << log_n).astype(np.uint32)
    lazy = np.asarray(forward32(plan, jnp.asarray(a), out_factor=4))
    strict = np.asarray(forward32(plan, jnp.asarray(a), out_factor=1))
    assert ((lazy.astype(np.uint64) % q) == strict.astype(np.uint64)).all()
    assert (lazy.astype(np.uint64) < 4 * q).all()
