"""Dedicated CompactModulus / UintModulus op coverage.

Reference: ``crates/primus_modulus/src/compact/mod.rs:11-49`` (add/sub tier,
``q < 2^(BITS-2)``), ``src/uint/mod.rs:11-43`` + ``src/common/uint`` kernels
(compare-subtract any-q tier incl. multiply).  Golden data = Python ints.
"""

import jax.numpy as jnp
import numpy as np

from primus_fhe_tpu.modular import modops
from primus_fhe_tpu.modular.modulus import (
    CompactModulus64,
    UintModulus64,
    compact32,
    uint32_modulus,
)
from primus_fhe_tpu.numeric.limb import from_u64_pair, to_u64_pair


def test_compact32_add_sub_neg_double():
    q = 999999937  # non-NTT-friendly prime < 2^30
    cm = compact32(q)
    rng = np.random.default_rng(0)
    a = rng.integers(0, q, size=128, dtype=np.uint32)
    b = rng.integers(0, q, size=128, dtype=np.uint32)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    np.testing.assert_array_equal(
        np.asarray(modops.add32(aj, bj, cm.value)), (a.astype(np.int64) + b) % q
    )
    np.testing.assert_array_equal(
        np.asarray(modops.sub32(aj, bj, cm.value)), (a.astype(np.int64) - b) % q
    )
    np.testing.assert_array_equal(
        np.asarray(modops.neg32(aj, cm.value)), (-a.astype(np.int64)) % q
    )
    np.testing.assert_array_equal(
        np.asarray(modops.double32(aj, cm.value)), (2 * a.astype(np.int64)) % q
    )


def test_compact32_vector_moduli_broadcast():
    qs = np.array([97, 999999937, 12345679, 1 << 29], dtype=np.uint32)
    cm = compact32(qs)
    rng = np.random.default_rng(1)
    a = (rng.integers(0, 1 << 30, size=(4, 8)) % qs[:, None]).astype(np.uint32)
    b = (rng.integers(0, 1 << 30, size=(4, 8)) % qs[:, None]).astype(np.uint32)
    got = np.asarray(modops.add32(jnp.asarray(a), jnp.asarray(b), cm.value[:, None]))
    want = (a.astype(np.int64) + b) % qs[:, None]
    np.testing.assert_array_equal(got, want)


def test_compact32_rejects_oversized():
    import pytest

    with pytest.raises(ValueError):
        compact32(1 << 30)
    with pytest.raises(ValueError):
        uint32_modulus(1 << 31)


def test_uint_mul32_arbitrary_moduli():
    rng = np.random.default_rng(2)
    for q in (3, 4, 1000000007, (1 << 31) - 1, 1 << 30, 12345678, 2 * 3 * 5 * 7 * 11):
        um = uint32_modulus(q)
        a = rng.integers(0, 1 << 32, size=64, dtype=np.uint32)
        b = rng.integers(0, 1 << 32, size=64, dtype=np.uint32)
        got = np.asarray(modops.uint_mul32(jnp.asarray(a), jnp.asarray(b), um.value))
        want = (a.astype(object) * b.astype(object)) % q
        np.testing.assert_array_equal(got.astype(object), want)


def test_uint_mul32_vector_moduli():
    qs = np.array([97, 1000000007, (1 << 31) - 1], dtype=np.uint32)
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 32, size=(3, 16), dtype=np.uint32)
    b = rng.integers(0, 1 << 32, size=(3, 16), dtype=np.uint32)
    got = np.asarray(
        modops.uint_mul32(jnp.asarray(a), jnp.asarray(b), jnp.asarray(qs)[:, None])
    )
    want = (a.astype(object) * b.astype(object)) % qs[:, None].astype(object)
    np.testing.assert_array_equal(got.astype(object), want)


def test_uint_mul64_and_compact64():
    rng = np.random.default_rng(4)
    for q in (1000000007, (1 << 62) + 123, (1 << 63) - 25, 1 << 52):
        qv = to_u64_pair(np.uint64(q))
        um = UintModulus64(qv)
        cm = CompactModulus64(qv)
        a = rng.integers(0, min(q, 1 << 63), size=8, dtype=np.uint64)
        b = rng.integers(0, min(q, 1 << 63), size=8, dtype=np.uint64)
        av, bv = to_u64_pair(a), to_u64_pair(b)
        got = from_u64_pair(modops.uint_mul64(av, bv, um.value))
        want = (a.astype(object) * b.astype(object)) % q
        np.testing.assert_array_equal(got.astype(object), want)
        # compact tier: add/sub only
        got = from_u64_pair(modops.add64(av, bv, cm.value))
        np.testing.assert_array_equal(
            got.astype(object), (a.astype(object) + b.astype(object)) % q
        )
        got = from_u64_pair(modops.sub64(av, bv, cm.value))
        np.testing.assert_array_equal(
            got.astype(object), (a.astype(object) - b.astype(object)) % q
        )


# ---------------------------------------------------------------------------
# Dedicated compact kernels (modular/compact.py): branchless min-select tier
# + value-level shift-fold widening-mul/dot tier.  Golden data = Python ints.
# Reference: crates/primus_modulus/src/common/compact/{primitive,slice}.rs,
# simd/mul.rs.
# ---------------------------------------------------------------------------

import pytest

from primus_fhe_tpu.modular import compact as ck
from primus_fhe_tpu.numeric.limb import U64


@pytest.mark.parametrize("q", [97, 12345678, 999999937, (1 << 30) - 35])
def test_compact32_branchless_tier(q):
    rng = np.random.default_rng(q)
    a = rng.integers(0, q, size=256, dtype=np.uint32)
    b = rng.integers(0, q, size=256, dtype=np.uint32)
    aj, bj, qj = jnp.asarray(a), jnp.asarray(b), jnp.uint32(q)
    ai, bi = a.astype(np.int64), b.astype(np.int64)
    np.testing.assert_array_equal(np.asarray(ck.compact_add32(aj, bj, qj)), (ai + bi) % q)
    np.testing.assert_array_equal(np.asarray(ck.compact_sub32(aj, bj, qj)), (ai - bi) % q)
    np.testing.assert_array_equal(np.asarray(ck.compact_double32(aj, qj)), (2 * ai) % q)
    np.testing.assert_array_equal(np.asarray(ck.compact_neg32(aj, qj)), (-ai) % q)
    lazy = np.asarray(ck.compact_lazy_sub32(aj, bj, qj)).astype(np.int64)
    assert (lazy < 2 * q).all() and ((lazy % q) == (ai - bi) % q).all()
    wide = (a.astype(np.uint64) + np.uint64(q) - 1) % np.uint64(2 * q)
    np.testing.assert_array_equal(
        np.asarray(ck.compact_reduce_once32(jnp.asarray(wide.astype(np.uint32)), qj)).astype(np.int64),
        wide.astype(np.int64) % q,
    )


@pytest.mark.parametrize("q", [3, 97, 12345678, (1 << 30) - 35])
def test_compact_mul32_golden(q):
    rng = np.random.default_rng(q + 1)
    a = rng.integers(0, q, size=128, dtype=np.uint32)
    b = rng.integers(0, q, size=128, dtype=np.uint32)
    c = rng.integers(0, q, size=128, dtype=np.uint32)
    qj = jnp.uint32(q)
    got = np.asarray(ck.compact_mul32(jnp.asarray(a), jnp.asarray(b), qj))
    np.testing.assert_array_equal(got.astype(object), (a.astype(object) * b) % q)
    got = np.asarray(ck.compact_mul_add32(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), qj))
    np.testing.assert_array_equal(got.astype(object), (a.astype(object) * b + c) % q)


@pytest.mark.parametrize("n", [16, 48, 53, 1])  # chunk-exact + remainders
def test_compact_dot32_chunking(n):
    q = (1 << 30) - 35
    rng = np.random.default_rng(n)
    a = rng.integers(0, q, size=(3, n), dtype=np.uint32)
    b = rng.integers(0, q, size=(3, n), dtype=np.uint32)
    got = np.asarray(ck.compact_dot32(jnp.asarray(a), jnp.asarray(b), jnp.uint32(q)))
    want = np.array([(ra.astype(object) * rb).sum() % q for ra, rb in zip(a, b)])
    np.testing.assert_array_equal(got.astype(object), want)


def test_compact_dot32_vector_moduli():
    qs = np.array([97, 999999937, (1 << 30) - 35], dtype=np.uint32)
    rng = np.random.default_rng(9)
    a = (rng.integers(0, 1 << 30, size=(3, 33)) % qs[:, None]).astype(np.uint32)
    b = (rng.integers(0, 1 << 30, size=(3, 33)) % qs[:, None]).astype(np.uint32)
    got = np.asarray(ck.compact_dot32(jnp.asarray(a), jnp.asarray(b), jnp.asarray(qs)[:, None]))
    want = np.array(
        [(ra.astype(object) * rb).sum() % int(q) for ra, rb, q in zip(a, b, qs)]
    )
    np.testing.assert_array_equal(got.astype(object), want)


@pytest.mark.parametrize("q", [1000000007, 1125899906826241, (1 << 62) - 57])
def test_compact64_tiers_golden(q):
    rng = np.random.default_rng(q % 100000)
    a = rng.integers(0, q, size=32, dtype=np.uint64)
    b = rng.integers(0, q, size=32, dtype=np.uint64)
    av, bv, qv = to_u64_pair(a), to_u64_pair(b), to_u64_pair(np.uint64(q))
    ai, bi = a.astype(object), b.astype(object)
    np.testing.assert_array_equal(
        from_u64_pair(ck.compact_add64(av, bv, qv)).astype(object), (ai + bi) % q
    )
    np.testing.assert_array_equal(
        from_u64_pair(ck.compact_sub64(av, bv, qv)).astype(object), (ai - bi) % q
    )
    np.testing.assert_array_equal(
        from_u64_pair(ck.compact_double64(av, qv)).astype(object), (2 * ai) % q
    )
    lazy = from_u64_pair(ck.compact_lazy_sub64(av, bv, qv)).astype(object)
    assert (lazy < 2 * q).all() and ((lazy % q) == (ai - bi) % q).all()
    np.testing.assert_array_equal(
        from_u64_pair(ck.compact_mul64(av, bv, qv)).astype(object), (ai * bi) % q
    )


@pytest.mark.parametrize("n", [8, 19])
def test_compact_dot64_golden(n):
    q = (1 << 62) - 57
    rng = np.random.default_rng(n + 50)
    a = rng.integers(0, q, size=(2, n), dtype=np.uint64)
    b = rng.integers(0, q, size=(2, n), dtype=np.uint64)
    got = from_u64_pair(
        ck.compact_dot64(to_u64_pair(a), to_u64_pair(b), to_u64_pair(np.uint64(q)))
    ).astype(object)
    want = np.array([(ra.astype(object) * rb).sum() % q for ra, rb in zip(a, b)])
    np.testing.assert_array_equal(got, want)


def test_compact_matches_generic_uint_tier():
    """Differential: dedicated fold tier == generic bit-serial tier."""
    q = 999999937
    rng = np.random.default_rng(77)
    a = rng.integers(0, q, size=64, dtype=np.uint32)
    b = rng.integers(0, q, size=64, dtype=np.uint32)
    fast = np.asarray(ck.compact_mul32(jnp.asarray(a), jnp.asarray(b), jnp.uint32(q)))
    slow = np.asarray(modops.uint_mul32(jnp.asarray(a), jnp.asarray(b), jnp.uint32(q)))
    np.testing.assert_array_equal(fast, slow)
