"""Field ops: exp / exp_pow_of_2 / inv / div (ReduceExp/Inv/Div parity).

Reference: ``crates/primus_reduce/src/ops.rs:210-343`` (op contracts) and
``FieldContext`` (``common.rs:97-151``).  Golden data = Python pow().
"""

import jax.numpy as jnp
import numpy as np

from primus_fhe_tpu.modular import barrett32, barrett64, modops
from primus_fhe_tpu.numeric.limb import U64, from_u64_pair, to_u64_pair

Q32 = 1073692673  # reference 30-bit prime (benches/bench_u64.rs:8)
Q64 = 1125899906826241  # reference 50-bit prime


def test_exp32_static_matches_pow():
    m = barrett32(Q32)
    rng = np.random.default_rng(0)
    a = rng.integers(0, Q32, size=64, dtype=np.uint32)
    for e in (0, 1, 2, 3, 17, Q32 - 2, Q32 - 1):
        got = np.asarray(modops.exp32(jnp.asarray(a), e, m))
        want = np.array([pow(int(x), e, Q32) for x in a], dtype=np.uint32)
        np.testing.assert_array_equal(got, want)


def test_exp32_traced_matches_pow():
    m = barrett32(Q32)
    rng = np.random.default_rng(1)
    a = rng.integers(0, Q32, size=32, dtype=np.uint32)
    e = rng.integers(0, 1 << 32, size=32, dtype=np.uint32)
    got = np.asarray(modops.exp32(jnp.asarray(a), jnp.asarray(e), m))
    want = np.array(
        [pow(int(x), int(k), Q32) for x, k in zip(a, e)], dtype=np.uint32
    )
    np.testing.assert_array_equal(got, want)


def test_exp_pow_of_2_32():
    m = barrett32(Q32)
    a = jnp.asarray(np.arange(1, 9, dtype=np.uint32) * 12345)
    got = np.asarray(modops.exp_pow_of_2_32(a, 5, m))
    want = np.array([pow(int(x), 1 << 5, Q32) for x in np.asarray(a)], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_inv_div32():
    m = barrett32(Q32)
    rng = np.random.default_rng(2)
    a = rng.integers(1, Q32, size=64, dtype=np.uint32)
    b = rng.integers(1, Q32, size=64, dtype=np.uint32)
    inv = np.asarray(modops.inv32(jnp.asarray(b), m, Q32))
    prod = np.asarray(modops.mul32(jnp.asarray(b), jnp.asarray(inv), m))
    np.testing.assert_array_equal(prod, np.ones(64, dtype=np.uint32))
    got = np.asarray(modops.div32(jnp.asarray(a), jnp.asarray(b), m, Q32))
    want = np.array(
        [int(x) * pow(int(y), Q32 - 2, Q32) % Q32 for x, y in zip(a, b)],
        dtype=np.uint32,
    )
    np.testing.assert_array_equal(got, want)
    # inv(0) = 0 by kernel convention
    assert int(np.asarray(modops.inv32(jnp.zeros(1, np.uint32), m, Q32))[0]) == 0


def test_exp_inv_div64():
    m = barrett64(Q64)
    rng = np.random.default_rng(3)
    a = rng.integers(1, Q64, size=16, dtype=np.uint64)
    av = to_u64_pair(a)
    for e in (0, 1, 5, 1 << 20):
        got = from_u64_pair(modops.exp64(av, e, m))
        want = np.array([pow(int(x), e, Q64) for x in a], dtype=np.uint64)
        np.testing.assert_array_equal(got.astype(np.uint64), want)
    inv = modops.inv64(av, m, Q64)
    prod = from_u64_pair(modops.mul64(av, inv, m))
    np.testing.assert_array_equal(prod, np.ones(16, dtype=np.uint64))
    b = rng.integers(1, Q64, size=16, dtype=np.uint64)
    got = from_u64_pair(modops.div64(av, to_u64_pair(b), m, Q64))
    want = np.array(
        [int(x) * pow(int(y), Q64 - 2, Q64) % Q64 for x, y in zip(a, b)],
        dtype=np.uint64,
    )
    np.testing.assert_array_equal(got.astype(np.uint64), want)
    sq = from_u64_pair(modops.exp_pow_of_2_64(av, 3, m))
    want = np.array([pow(int(x), 8, Q64) for x in a], dtype=np.uint64)
    np.testing.assert_array_equal(sq.astype(np.uint64), want)
