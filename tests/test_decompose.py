"""Gadget decomposition reconstruction tests.

Reference pattern: crates/primus_decompose/tests/{pow_of_2,non_pow_of_2,
big_uint}.rs — reconstruct sum(digit_j * B^j * 2^drop) and compare against
the input within the approximation error bound (centered distance mod q).
"""

import random

import jax.numpy as jnp
import numpy as np

from primus_fhe_tpu.decompose import (
    ApproxSignedBasis32,
    ApproxSignedBasis64,
    BigUintApproxSignedBasis,
)
from primus_fhe_tpu.numeric import from_u64_pair, to_u64_pair
from primus_fhe_tpu.numeric.bigint import big_from_int
from primus_fhe_tpu.rns import RNSBase64

rng = random.Random(77)


def _centered_dist(a, b, q):
    d = (a - b) % q
    return min(d, q - d)


def _check_reconstruction(digits, values, q, basis, scalars, bound):
    level = len(scalars)
    for c, v in enumerate(values):
        recon = sum(int(digits[j][c]) * scalars[j] for j in range(level)) % q
        assert _centered_dist(recon, int(v), q) <= bound, (
            c,
            v,
            [int(digits[j][c]) for j in range(level)],
        )


def test_pow2_modulus32():
    # modulus None = 2^32, log_basis 8 -> exact (no drop bits)
    basis = ApproxSignedBasis32(None, 8)
    assert basis.decompose_length == 4 and basis.drop_bits == 0
    vals = np.array([rng.getrandbits(32) for _ in range(128)], dtype=np.uint32)
    digits = np.asarray(basis.decompose(jnp.asarray(vals)))
    _check_reconstruction(digits, vals, 1 << 32, basis.basis, basis.scalars, 0)


def test_pow2_modulus32_with_drop():
    basis = ApproxSignedBasis32(None, 7, reverse_length=3)
    assert basis.drop_bits == 32 - 21
    vals = np.array([rng.getrandbits(32) for _ in range(128)], dtype=np.uint32)
    digits = np.asarray(basis.decompose(jnp.asarray(vals)))
    _check_reconstruction(
        digits, vals, 1 << 32, basis.basis, basis.scalars, basis.approximate_error_bound
    )


def test_non_pow2_modulus32():
    q = 536813569
    basis = ApproxSignedBasis32(q, 5)
    vals = np.array([rng.randrange(q) for _ in range(256)], dtype=np.uint32)
    digits = np.asarray(basis.decompose(jnp.asarray(vals)))
    _check_reconstruction(
        digits, vals, q, basis.basis, basis.scalars, basis.approximate_error_bound
    )


def test_non_pow2_modulus32_short():
    q = 1073692673
    basis = ApproxSignedBasis32(q, 6, reverse_length=3)
    vals = np.array([rng.randrange(q) for _ in range(256)], dtype=np.uint32)
    digits = np.asarray(basis.decompose(jnp.asarray(vals)))
    _check_reconstruction(
        digits, vals, q, basis.basis, basis.scalars, basis.approximate_error_bound
    )


def test_pow2_modulus64():
    basis = ApproxSignedBasis64(None, 16, reverse_length=2)
    vals = np.array([rng.getrandbits(64) for _ in range(64)], dtype=np.uint64)
    digits_u = basis.decompose(to_u64_pair(vals))
    digits = from_u64_pair(digits_u)
    _check_reconstruction(
        digits, vals, 1 << 64, basis.basis, basis.scalars, basis.approximate_error_bound
    )


def test_non_pow2_modulus64():
    q = 1125899906826241
    basis = ApproxSignedBasis64(q, 10)
    vals = np.array([rng.randrange(q) for _ in range(64)], dtype=np.uint64)
    digits = from_u64_pair(basis.decompose(to_u64_pair(vals)))
    _check_reconstruction(
        digits, vals, q, basis.basis, basis.scalars, basis.approximate_error_bound
    )


def test_big_uint_basis():
    base = RNSBase64([1125899906826241, 1125899906629633])
    basis = BigUintApproxSignedBasis(base, 12)
    Q = base.q_product
    vals = [rng.randrange(Q) for _ in range(32)]
    arr = jnp.asarray(np.stack([big_from_int(v, base.big_len) for v in vals]))
    digits = np.asarray(basis.unsigned_decompose(arr))  # (level, n) unsigned
    # Unsigned digits reconstruct with *centered* semantics: digit d with
    # d >= B/2-ish carries -B; the carry chain makes sum(centered_j B^j 2^drop)
    # equal the (adjusted) value within the error bound.
    level = basis.decompose_length
    B = basis.basis
    for c, v in enumerate(vals):
        recon = 0
        carry = 0
        # reconstruct from unsigned digits + implied signs: digit stream was
        # produced so that sum over levels of signed digits equals value.
        # signed digit = unsigned digit - B * (next carry taken at this level)
        # Recompute the signed stream by re-running the carry rule.
        adjusted = v + (basis.adjust_add_int if basis.threshold_int is not None and v >= basis.threshold_int else 0)
        carry = (
            (adjusted >> basis.init_carry_mask_bit) & 1
            if basis.init_carry_mask_bit is not None
            else 0
        )
        for j in range(level):
            window = (adjusted >> basis.shr_bits[j]) & (B - 1)
            temp = window + carry
            next_carry = 1 if (temp & basis.carry_mask) != 0 else 0
            unsigned = temp & (B - 1)
            assert unsigned == int(digits[j][c]), (j, c)
            signed = temp - B * next_carry
            recon += signed * basis.scalar_ints[j]
            carry = next_carry
        assert _centered_dist(recon % Q, v, Q) <= basis.approximate_error_bound
