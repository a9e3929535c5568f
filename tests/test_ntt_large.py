"""Reference-scale NTT tests.

- n=2048: the reference's own test shape (crates/primus_ntt/tests/ntt.rs)
  with its golden primes, full golden-model parity.
- n=65536: config-2 upper bound (BASELINE.json) — roundtrip + monomial
  closed-form spot checks (naive O(n^2) oracles are infeasible here; the
  monomial law out[j] = psi^((2 rev(j)+1) d) is exact and independent).
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from primus_fhe_tpu.golden import GoldenNtt
from primus_fhe_tpu.numeric import from_u64_pair, to_u64_pair
from primus_fhe_tpu.transforms import (
    build_plan32,
    build_plan64,
    forward32,
    forward64,
    inverse64,
    monomial32,
)

rng = random.Random(2048)


@pytest.mark.parametrize(
    "q", [536813569, 562949953392641, 1152921504606830593]
)  # tests/ntt.rs:17,55,93
def test_reference_shape_n2048(q):
    log_n = 11
    n = 1 << log_n
    g = GoldenNtt(log_n, q)
    a = [rng.randrange(q) for _ in range(n)]
    expect = g.forward(a)
    if q < 1 << 30:
        plan = build_plan32(log_n, q)
        got = np.asarray(forward32(plan, jnp.asarray(np.array(a, dtype=np.uint32))))
        assert got.astype(object).tolist() == expect
    else:
        plan = build_plan64(log_n, q)
        got = from_u64_pair(forward64(plan, to_u64_pair(np.array(a, dtype=np.uint64))))
        assert got.astype(object).tolist() == expect


def test_config2_n65536_roundtrip():
    log_n = 16
    n = 1 << log_n
    q = 1125899903827969  # 50-bit prime with q = 1 mod 2^17
    plan = build_plan64(log_n, q)
    a = np.array([rng.randrange(q) for _ in range(n)], dtype=np.uint64)
    ua = to_u64_pair(a)
    back = from_u64_pair(inverse64(plan, forward64(plan, ua)))
    assert (back == a).all()


def test_config2_n65536_monomial_law():
    log_n = 16
    n = 1 << log_n
    q = 1073479681  # 30-bit tier prime with q = 1 mod 2^17
    plan = build_plan32(log_n, q)
    g = GoldenNtt(log_n, q)
    for d in (1, 12345, n - 1):
        got = np.asarray(monomial32(plan, jnp.int32(d)))
        # closed form at a few positions
        for j in (0, 1, 7, n // 2, n - 1):
            i = g.reverse_lsbs[j]
            expect = pow(g.root, (2 * i + 1) * d, q)
            assert int(got[j]) == expect, (d, j)
