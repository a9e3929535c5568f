"""Triple differential test: native C++ oracle vs Python golden vs jnp.

All three implementations must agree bit-exactly on the reference prime
set — the strongest form of the reference's cross-backend equivalence
strategy (SURVEY.md §4.2).
"""

import random
import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="needs g++")

from primus_fhe_tpu import native
from primus_fhe_tpu.golden import GoldenNtt, minimal_primitive_root

rng = random.Random(616)


@pytest.mark.parametrize("q,log_n", [(536813569, 8), (1125899906826241, 7)])
def test_native_matches_golden(q, log_n):
    n = 1 << log_n
    nat = native.NativeNtt(log_n, q)
    g = GoldenNtt(log_n, q)
    assert int(nat.roots[1]) == g.roots[1]  # same minimal root convention
    assert nat.roots.tolist() == g.roots
    assert nat.inv_roots.tolist() == g.inv_roots
    a = np.array([rng.randrange(q) for _ in range(n)], dtype=np.uint64)
    assert nat.forward(a).tolist() == g.forward([int(x) for x in a])
    fwd = nat.forward(a)
    assert nat.inverse(fwd).tolist() == [int(x) for x in a]


def test_native_matches_jnp():
    import jax.numpy as jnp

    from primus_fhe_tpu.numeric import from_u64_pair, to_u64_pair
    from primus_fhe_tpu.transforms import build_plan64, forward64

    q, log_n = 1152921504606830593, 7
    n = 1 << log_n
    nat = native.NativeNtt(log_n, q)
    plan = build_plan64(log_n, q)
    a = np.array([rng.randrange(q) for _ in range(n)], dtype=np.uint64)
    got_jnp = from_u64_pair(forward64(plan, to_u64_pair(a)))
    got_nat = nat.forward(a)
    assert got_jnp.tolist() == got_nat.tolist()


def test_native_scalar_helpers():
    q = 1073692673
    assert native.minimal_primitive_root(11, q) == minimal_primitive_root(11, q)
    from primus_fhe_tpu.utils import mod_inv as py_inv

    for a in (2, 12345, q - 2):
        assert native.mod_inv(a, q) == py_inv(a, q)


def test_native_negacyclic_vs_naive():
    from primus_fhe_tpu.golden import naive_negacyclic_mul

    q, log_n = 536813569, 6
    n = 1 << log_n
    nat = native.NativeNtt(log_n, q)
    a = np.array([rng.randrange(q) for _ in range(n)], dtype=np.uint64)
    b = np.array([rng.randrange(q) for _ in range(n)], dtype=np.uint64)
    got = nat.negacyclic_mul(a, b)
    expect = naive_negacyclic_mul([int(x) for x in a], [int(x) for x in b], q)
    assert got.tolist() == expect
