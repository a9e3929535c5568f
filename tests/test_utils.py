"""Tests for host-side exact utilities (gcd / bits / primes).

Mirrors the reference's test strategy for ``primus_gcd`` (SURVEY.md §4):
Bezout identities checked through wider arithmetic, exhaustive small-domain
sweeps, and edge cases.
"""

import random

from primus_fhe_tpu.utils import (
    bit_reverse_indices,
    gcdinv,
    hensel_inv_pow2,
    is_prime,
    mod_inv,
    next_ntt_prime,
    ntt_prime_chain,
    reverse_lsbs,
    xgcd,
)


def test_xgcd_bezout_random():
    rng = random.Random(2026)
    for _ in range(200):
        a = rng.getrandbits(64)
        b = rng.getrandbits(64)
        g, x, y = xgcd(a, b)
        assert a * x + b * y == g
        if a and b:
            assert a % g == 0 and b % g == 0


def test_xgcd_exhaustive_u8():
    for a in range(64):
        for b in range(64):
            g, x, y = xgcd(a, b)
            assert a * x + b * y == g


def test_gcdinv_contract():
    rng = random.Random(7)
    for _ in range(200):
        m = rng.getrandbits(62) | 1
        a = rng.getrandbits(62)
        inv, g = gcdinv(a, m)
        assert 0 <= inv < m
        assert (inv * a) % m == g % m


def test_mod_inv():
    q = 1125899906826241
    for a in (2, 3, 12345, q - 1):
        inv = mod_inv(a, q)
        assert a * inv % q == 1


def test_hensel_inv_pow2():
    for k in (1, 5, 32, 64):
        for a in (1, 3, 5, 0xDEADBEEF | 1, (1 << 63) - 1):
            inv = hensel_inv_pow2(a, k)
            assert (a * inv) % (1 << k) == 1 % (1 << k)


def test_reverse_lsbs():
    assert reverse_lsbs(0b001, 3) == 0b100
    assert reverse_lsbs(0b110, 3) == 0b011
    idx = bit_reverse_indices(4)
    assert sorted(idx.tolist()) == list(range(16))
    for i in range(16):
        assert idx[idx[i]] == i


def test_is_prime_known():
    # The reference golden-set primes (BASELINE.md) are all prime.
    for q in (536813569, 562949953392641, 1152921504606830593, 1073692673, 1125899906826241):
        assert is_prime(q)
    assert not is_prime(561)  # Carmichael
    assert not is_prime(1)


def test_ntt_prime_chain():
    primes = ntt_prime_chain(60, 12, 3)
    assert len(set(primes)) == 3
    for q in primes:
        assert is_prime(q)
        assert (q - 1) % (1 << 13) == 0
        assert q < 1 << 60
    q = next_ntt_prime(31, 10)
    assert is_prime(q) and (q - 1) % 2048 == 0
