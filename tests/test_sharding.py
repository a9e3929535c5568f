"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Validates that residue-/batch-sharded execution produces bit-identical
results to single-device execution (the SPMD partitioner inserts the
collectives; integer semantics must be unaffected)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primus_fhe_tpu.numeric import from_u64_pair, to_u64_pair
from primus_fhe_tpu.parallel.mesh import make_mesh, residue_sharding
from primus_fhe_tpu.transforms.dcrt import (
    build_dcrt_plan32,
    build_dcrt_plan64,
    dcrt_forward32,
    dcrt_forward64,
    dcrt_inverse64,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


MOD32 = [1073707009, 1073698817, 1073692673, 1073682433]  # 4 × 30-bit-ish
MOD64 = [1125899906826241, 1125899906629633]


def test_sharded_dcrt_forward32_matches_single():
    mesh = make_mesh(8, residue=4)
    log_n = 8
    n = 1 << log_n
    plan = build_dcrt_plan32(log_n, MOD32)
    rng = np.random.default_rng(3)
    vals = jnp.asarray(
        np.stack([rng.integers(0, q, n, dtype=np.uint64).astype(np.uint32) for q in MOD32])
    )
    single = np.asarray(dcrt_forward32(plan, vals))

    sh = residue_sharding(mesh, vals.ndim)
    vs = jax.device_put(vals, sh)
    f = jax.jit(dcrt_forward32, static_argnames=("out_factor",), out_shardings=sh)
    sharded = np.asarray(f(plan, vs))
    assert (single == sharded).all()


def test_sharded_dcrt64_roundtrip_batched():
    mesh = make_mesh(8, residue=2)  # residue=2, batch=4
    log_n = 6
    n = 1 << log_n
    batch = 4
    plan = build_dcrt_plan64(log_n, MOD64)
    rng = np.random.default_rng(4)
    raw = np.stack(
        [
            [rng.integers(0, q, n, dtype=np.uint64) for _ in range(batch)]
            for q in MOD64
        ]
    )  # (n_mod, batch, n)
    vals = to_u64_pair(raw)
    single = from_u64_pair(dcrt_inverse64(plan, dcrt_forward64(plan, vals)))
    assert (single == raw).all()

    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("residue", "batch", None))
    vs = jax.tree.map(lambda x: jax.device_put(x, sh), vals)

    def rt(p, v):
        return dcrt_inverse64(p, dcrt_forward64(p, v))

    f = jax.jit(rt, out_shardings=jax.tree.map(lambda _: sh, vals))
    sharded = from_u64_pair(f(plan, vs))
    assert (sharded == raw).all()


def test_sharded_external_product_matches_single():
    from primus_fhe_tpu.decompose import ApproxSignedBasis32
    from primus_fhe_tpu.lattice import tfhe
    from jax.sharding import NamedSharding, PartitionSpec as P

    log_n, k, lb, lv = 5, 1, 8, 3
    n = 1 << log_n
    basis = ApproxSignedBasis32(None, lb, reverse_length=lv)
    conv = tfhe.make_convolver(log_n, lv, k, lb)
    rng = np.random.default_rng(5)
    batch = 4
    glwe = jnp.asarray(rng.integers(0, 1 << 32, (batch, k + 1, n), dtype=np.uint64).astype(np.uint32))
    key_ntt = jnp.asarray(
        rng.integers(0, 1 << 20, (conv.count, k + 1, lv, k + 1, n), dtype=np.uint64).astype(np.uint32)
    )
    single = np.asarray(tfhe.external_product(conv, basis, glwe, key_ntt))

    mesh = make_mesh(8, residue=2)
    g_sh = NamedSharding(mesh, P("batch", None, None))
    k_sh = NamedSharding(mesh, P("residue", None, None, None, None))
    gs = jax.device_put(glwe, g_sh)
    ks = jax.device_put(key_ntt, k_sh)
    f = jax.jit(
        lambda g, kt: tfhe.external_product(conv, basis, g, kt),
        out_shardings=g_sh,
    )
    sharded = np.asarray(f(gs, ks))
    assert (single == sharded).all()
