"""Exact torus convolver tests vs naive negacyclic convolution mod 2^32.

Reference pattern: crates/primus_fft/tests/negacyclic.rs — check against
O(n^2) negacyclic convolution AND against cyclic convolution (to prove the
negacyclic wrap is applied).  Here the result must be *exact* (the
convolver is integer CRT-NTT, not float FFT).
"""

import random

import jax.numpy as jnp
import numpy as np

from primus_fhe_tpu.transforms.torus import TorusConvolver32

rng = random.Random(31337)
M32 = 1 << 32


def _naive_negacyclic_torus(a, b):
    n = len(a)
    out = [0] * n

    def signed(x):
        return x - M32 if x >= M32 // 2 else x

    for i in range(n):
        for j in range(n):
            k = i + j
            v = signed(int(a[i])) * signed(int(b[j]))
            if k < n:
                out[k] += v
            else:
                out[k - n] -= v
    return [v % M32 for v in out]


def _naive_cyclic_torus(a, b):
    n = len(a)
    out = [0] * n

    def signed(x):
        return x - M32 if x >= M32 // 2 else x

    for i in range(n):
        for j in range(n):
            out[(i + j) % n] += signed(int(a[i])) * signed(int(b[j]))
    return [v % M32 for v in out]


def test_exact_negacyclic_mod_2_32():
    log_n = 5
    n = 1 << log_n
    # bound: n * 2^31 * 2^31 = 2^67
    conv = TorusConvolver32(log_n, bound_bits=67)
    a = np.array([rng.getrandbits(32) for _ in range(n)], dtype=np.uint32)
    b = np.array([rng.getrandbits(32) for _ in range(n)], dtype=np.uint32)
    got = np.asarray(conv.negacyclic_mul(jnp.asarray(a), jnp.asarray(b)))
    expect = _naive_negacyclic_torus(a, b)
    assert got.astype(object).tolist() == expect
    # and it must NOT equal the cyclic convolution (twist matters)
    assert got.astype(object).tolist() != _naive_cyclic_torus(a, b)


def test_small_values_roundtrip():
    log_n = 6
    n = 1 << log_n
    conv = TorusConvolver32(log_n, bound_bits=40)
    a = np.array([rng.randrange(256) for _ in range(n)], dtype=np.uint32)
    delta = jnp.zeros(n, dtype=jnp.uint32).at[0].set(1)  # X^0
    got = np.asarray(conv.negacyclic_mul(jnp.asarray(a), delta))
    assert (got == a).all()


def test_monomial_rotation():
    log_n = 5
    n = 1 << log_n
    conv = TorusConvolver32(log_n, bound_bits=45)
    a = np.array([rng.getrandbits(16) for _ in range(n)], dtype=np.uint32)
    x_d = jnp.zeros(n, dtype=jnp.uint32).at[3].set(1)  # X^3
    got = np.asarray(conv.negacyclic_mul(jnp.asarray(a), x_d))
    expect = _naive_negacyclic_torus(a, np.asarray(x_d))
    assert got.astype(object).tolist() == expect


def test_batched():
    log_n = 4
    n = 1 << log_n
    conv = TorusConvolver32(log_n, bound_bits=40)
    a = np.array(
        [[rng.getrandbits(16) for _ in range(n)] for _ in range(3)], dtype=np.uint32
    )
    b = np.array([rng.getrandbits(16) for _ in range(n)], dtype=np.uint32)
    bb = np.broadcast_to(b, (3, n))
    got = np.asarray(conv.negacyclic_mul(jnp.asarray(a), jnp.asarray(bb)))
    for i in range(3):
        assert got[i].astype(object).tolist() == _naive_negacyclic_torus(a[i], b)
