"""Differential tests for device big integers vs Python ints."""

import random

import jax.numpy as jnp
import numpy as np

from primus_fhe_tpu.modular import barrett32, barrett64
from primus_fhe_tpu.numeric import to_u64_pair
from primus_fhe_tpu.numeric.bigint import (
    big_add,
    big_cond_sub,
    big_from_int,
    big_ge,
    big_mod_u32_dot,
    big_mod_u64_dot,
    big_mul_u32_add,
    big_shr_window,
    big_sub,
    big_to_int,
    big_to_ints,
)

rng = random.Random(99)
L = 4  # 128-bit integers
M = 1 << (32 * L)


def _batch(n, bits=32 * L):
    vals = [rng.getrandbits(bits) for _ in range(n)]
    arr = np.stack([big_from_int(v, L) for v in vals])
    return vals, jnp.asarray(arr)


def test_roundtrip():
    vals, arr = _batch(16)
    assert [big_to_int(r) for r in np.asarray(arr)] == vals
    assert big_to_ints(arr).tolist() == vals


def test_add_sub():
    va, a = _batch(64)
    vb, b = _batch(64)
    s, carry = big_add(a, b)
    got = big_to_ints(s) + (np.asarray(carry).astype(object) << (32 * L))
    assert got.tolist() == [x + y for x, y in zip(va, vb)]
    d, borrow = big_sub(a, b)
    expect = [(x - y) % M for x, y in zip(va, vb)]
    assert big_to_ints(d).tolist() == expect
    assert np.asarray(borrow).tolist() == [1 if x < y else 0 for x, y in zip(va, vb)]


def test_ge_cond_sub():
    va, a = _batch(64)
    vb, b = _batch(64)
    assert np.asarray(big_ge(a, b)).tolist() == [x >= y for x, y in zip(va, vb)]
    c = big_cond_sub(a, b)
    assert big_to_ints(c).tolist() == [x - y if x >= y else x for x, y in zip(va, vb)]


def test_mul_u32_add():
    va, a = _batch(32)
    vacc, acc = _batch(32)
    s = 0xDEADBEEF
    out, carry = big_mul_u32_add(a, jnp.uint32(s), acc)
    got = big_to_ints(out) + (np.asarray(carry).astype(object) << (32 * L))
    assert got.tolist() == [x * s + y for x, y in zip(va, vacc)]


def test_mod_dot32():
    q = 536813569
    m = barrett32(q)
    va, a = _batch(32)
    pow_t = jnp.asarray(
        np.array([pow(2, 32 * i, q) for i in range(L)], dtype=np.uint32)
    )
    got = np.asarray(big_mod_u32_dot(a, pow_t, m))
    assert got.astype(object).tolist() == [v % q for v in va]


def test_mod_dot64():
    q = 1125899906826241
    m = barrett64(q)
    va, a = _batch(32)
    pow_t = to_u64_pair(np.array([pow(2, 32 * i, q) for i in range(L)], dtype=np.uint64))
    from primus_fhe_tpu.numeric import from_u64_pair

    got = from_u64_pair(big_mod_u64_dot(a, pow_t, m))
    assert got.astype(object).tolist() == [v % q for v in va]


def test_shr_window():
    va, a = _batch(32)
    for shift, width in [(0, 8), (13, 7), (30, 8), (32, 16), (60, 12), (96, 32), (120, 8)]:
        got = np.asarray(big_shr_window(a, shift, width))
        expect = [(v >> shift) & ((1 << width) - 1) for v in va]
        assert got.astype(object).tolist() == expect, (shift, width)
