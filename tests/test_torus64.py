"""64-bit torus exact convolver tests — including the >2^53 regime where
the reference's f64 FFT path loses precision (torus.rs:46)."""

import random

import numpy as np

from primus_fhe_tpu.numeric import from_u64_pair, to_u64_pair
from primus_fhe_tpu.transforms.torus import TorusConvolver64

rng = random.Random(646)
M64 = 1 << 64


def _naive_negacyclic_torus64(a, b):
    n = len(a)
    out = [0] * n

    def signed(x):
        return int(x) - M64 if int(x) >= M64 // 2 else int(x)

    for i in range(n):
        for j in range(n):
            k = i + j
            v = signed(a[i]) * signed(b[j])
            if k < n:
                out[k] += v
            else:
                out[k - n] -= v
    return [v % M64 for v in out]


def test_exact_negacyclic_mod_2_64_full_range():
    """Full 64-bit coefficients — impossible for the f64 path."""
    log_n = 4
    n = 1 << log_n
    # bound: n * 2^63 * 2^63 = 2^130
    conv = TorusConvolver64(log_n, bound_bits=131)
    a = np.array([rng.getrandbits(64) for _ in range(n)], dtype=np.uint64)
    b = np.array([rng.getrandbits(64) for _ in range(n)], dtype=np.uint64)
    got = from_u64_pair(conv.negacyclic_mul(to_u64_pair(a), to_u64_pair(b)))
    expect = _naive_negacyclic_torus64(a, b)
    assert got.astype(object).tolist() == expect


def test_small_value_roundtrip64():
    log_n = 5
    n = 1 << log_n
    conv = TorusConvolver64(log_n, bound_bits=80)
    a = np.array([rng.getrandbits(60) for _ in range(n)], dtype=np.uint64)
    delta = np.zeros(n, dtype=np.uint64)
    delta[0] = 1
    got = from_u64_pair(conv.negacyclic_mul(to_u64_pair(a), to_u64_pair(delta)))
    assert (got == a).all()


def test_lift_recombine_identity64():
    log_n = 4
    n = 1 << log_n
    conv = TorusConvolver64(log_n, bound_bits=70)
    a = np.array(
        [rng.getrandbits(64) for _ in range(n // 2)]
        + [rng.getrandbits(20) for _ in range(n // 2)],
        dtype=np.uint64,
    )
    # forward -> inverse -> recombine with no multiply must reproduce a
    ua = to_u64_pair(a)
    res = conv.inverse(conv.forward(ua))
    back = from_u64_pair(conv.recombine(res))
    assert (back == a).all()
