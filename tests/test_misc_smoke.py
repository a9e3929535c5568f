"""Smoke coverage for remaining helpers: sharded wrappers, profiling,
multi-msg phase, parity records, device naive mul, graft entry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primus_fhe_tpu.modular import barrett32
from primus_fhe_tpu.modular.factor import multiply_factor32, factor_mul_lazy32
from primus_fhe_tpu.modular.modulus import compact32, uint32_modulus
from primus_fhe_tpu.poly.poly import poly_naive_mul32
from primus_fhe_tpu.utils.profiling import Timer, ntt_modmuls, op_rate

Q = 536813569


def test_records():
    c = compact32(1 << 29)
    u = uint32_modulus((1 << 31) - 19)
    assert int(c.value) == 1 << 29 and int(u.value) == (1 << 31) - 19
    with pytest.raises(ValueError):
        compact32(1 << 30)
    f = multiply_factor32(12345, Q)
    lazy = int(factor_mul_lazy32(jnp.uint32(678), f, jnp.uint32(Q)))
    assert lazy % Q == 12345 * 678 % Q


def test_naive_mul_matches_ntt():
    from primus_fhe_tpu.golden import naive_negacyclic_mul

    m = barrett32(Q)
    n = 16
    rng = np.random.default_rng(0)
    a = rng.integers(0, Q, n, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, Q, n, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(poly_naive_mul32(jnp.asarray(a), jnp.asarray(b), m))
    expect = naive_negacyclic_mul([int(x) for x in a], [int(x) for x in b], Q)
    assert got.astype(object).tolist() == expect


def test_multi_msg_phase():
    from primus_fhe_tpu.lattice.lwe import multi_msg_phase_torus32

    n, count = 8, 3
    key = jax.random.PRNGKey(0)
    s = (jax.random.bits(key, (n,), dtype=jnp.uint32) & 1).astype(jnp.uint32)
    a = jax.random.bits(jax.random.fold_in(key, 1), (n,), dtype=jnp.uint32)
    mus = jnp.asarray([10, 20, 30], dtype=jnp.uint32)
    b = jnp.sum(a * s, dtype=jnp.uint32) + mus
    ct = jnp.concatenate([a, b])
    ph = np.asarray(multi_msg_phase_torus32(ct, s, count))
    assert ph.tolist() == [10, 20, 30]


def test_timer_and_rates():
    with Timer() as t:
        _ = jnp.arange(8).sum()
    assert t.elapsed > 0
    assert ntt_modmuls(4096) == 2048 * 12
    assert op_rate(100, 2.0) == 50.0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_wrappers():
    from primus_fhe_tpu.parallel import (
        shard_dcrt_values,
        sharded_dcrt_forward32,
        sharded_dcrt_inverse32,
    )
    from primus_fhe_tpu.parallel.mesh import make_mesh
    from primus_fhe_tpu.transforms.dcrt import build_dcrt_plan32, dcrt_forward32

    moduli = [1073707009, 1073698817]
    mesh = make_mesh(8, residue=2)
    plan = build_dcrt_plan32(6, moduli)
    rng = np.random.default_rng(1)
    vals = jnp.asarray(
        np.stack([rng.integers(0, q, 64, dtype=np.uint64).astype(np.uint32) for q in moduli])
    )
    vs = shard_dcrt_values(vals, mesh)
    f = sharded_dcrt_forward32(plan, vs, mesh)
    assert (np.asarray(f) == np.asarray(dcrt_forward32(plan, vals))).all()
    back = sharded_dcrt_inverse32(plan, f, mesh)
    assert (np.asarray(back) == np.asarray(vals)).all()


def test_graft_entry_after_refactors():
    import sys

    sys.path.insert(0, ".")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 32)
