"""RNS compose/decompose round-trips and base conversion.

Reference test pattern: crates/primus_rns/tests/rns.rs — round-trips plus
the closed-form wrapping-decompose formula; bench shapes (BASELINE.md) use
2×50-bit and 3×37-bit bases.
"""

import random

import jax.numpy as jnp
import numpy as np

from primus_fhe_tpu.numeric import from_u64_pair, to_u64_pair
from primus_fhe_tpu.numeric.bigint import big_from_int, big_to_ints
from primus_fhe_tpu.rns import BaseConverter32, BaseConverter64, RNSBase32, RNSBase64

rng = random.Random(5)

MOD32 = [536813569, 536608769, 536543233]  # three 29/30-bit NTT primes
MOD64 = [1125899906826241, 1125899906629633]  # the reference bench 50-bit pair


def test_rns32_roundtrip():
    base = RNSBase32(MOD32)
    Q = base.q_product
    vals = [rng.randrange(Q) for _ in range(64)]
    arr = jnp.asarray(np.stack([big_from_int(v, base.big_len) for v in vals]))
    residues = base.decompose(arr)
    expect = np.array([[v % q for v in vals] for q in MOD32], dtype=object)
    assert np.asarray(residues).astype(object).tolist() == expect.tolist()
    back = base.compose(residues)
    assert big_to_ints(back).tolist() == vals


def test_rns64_roundtrip():
    base = RNSBase64(MOD64)
    Q = base.q_product
    vals = [rng.randrange(Q) for _ in range(64)]
    arr = jnp.asarray(np.stack([big_from_int(v, base.big_len) for v in vals]))
    residues = base.decompose(arr)
    expect = [[v % q for v in vals] for q in MOD64]
    assert from_u64_pair(residues).astype(object).tolist() == expect
    back = base.compose(residues)
    assert big_to_ints(back).tolist() == vals


def test_wrapping_decompose32():
    base = RNSBase32(MOD32)
    B = 256
    vals = np.array([rng.randrange(B) for _ in range(64)], dtype=np.uint32)
    out = np.asarray(base.wrapping_decompose_small(jnp.asarray(vals), B))
    half = (B + 1) // 2
    for i, q in enumerate(MOD32):
        for j, v in enumerate(vals):
            expect = v if v < half else q - B + int(v)
            assert out[i, j] == expect
    # closed form: residues represent v centered mod B (rns.rs:54-62)
    for i, q in enumerate(MOD32):
        centered = [(int(v) if v < half else int(v) - B) % q for v in vals]
        assert (out[i].astype(object) == np.array(centered, dtype=object)).all()


def test_wrapping_decompose64():
    base = RNSBase64(MOD64)
    B = 1 << 20
    vals = np.array([rng.randrange(B) for _ in range(32)], dtype=np.uint64)
    out = from_u64_pair(base.wrapping_decompose_small(to_u64_pair(vals), B))
    half = (B + 1) // 2
    for i, q in enumerate(MOD64):
        centered = [(int(v) if v < half else int(v) - B) % q for v in vals]
        assert out[i].astype(object).tolist() == centered


def test_base_convert32_exact_for_small_values():
    in_base = RNSBase32(MOD32)
    out_base = RNSBase32([1073682433, 1073668097])
    conv = BaseConverter32(in_base, out_base)
    Q = in_base.q_product
    # fast_convert computes sum_i |x (Q/qi)^-1|_qi * (Q/qi) mod pj, which
    # equals x + alpha*Q for some alpha in [0, k).  Verify the residue is
    # congruent to x + alpha*Q for some valid alpha.
    vals = [rng.randrange(Q) for _ in range(32)]
    arr = jnp.asarray(
        np.array([[v % q for v in vals] for q in MOD32], dtype=np.uint32)
    )
    out = np.asarray(conv.fast_convert(arr))
    k = in_base.count
    for j, pj in enumerate(out_base.moduli_ints):
        for c, v in enumerate(vals):
            candidates = {(v + alpha * Q) % pj for alpha in range(k)}
            assert int(out[j, c]) in candidates


def test_base_convert64():
    in_base = RNSBase64(MOD64)
    out_base = RNSBase64([1152921504606830593])
    conv = BaseConverter64(in_base, out_base)
    Q = in_base.q_product
    vals = [rng.randrange(Q) for _ in range(16)]
    arr = to_u64_pair(np.array([[v % q for v in vals] for q in MOD64], dtype=np.uint64))
    out = from_u64_pair(conv.fast_convert(arr))
    k = in_base.count
    for j, pj in enumerate(out_base.moduli_ints):
        for c, v in enumerate(vals):
            candidates = {(v + alpha * Q) % pj for alpha in range(k)}
            assert int(out[j, c]) in candidates


def test_exact_decompose_on_exact_values():
    """fast_convert is exact when the composed value is exactly representable
    (alpha = 0 whenever inputs are already the canonical residues of a value
    whose adjusted sum does not overflow Q) — checked via compose."""
    base = RNSBase32(MOD32)
    vals = [rng.randrange(base.q_product) for _ in range(8)]
    arr = jnp.asarray(np.array([[v % q for v in vals] for q in MOD32], dtype=np.uint32))
    back = big_to_ints(base.compose(arr))
    assert back.tolist() == vals
