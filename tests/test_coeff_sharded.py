"""Coefficient-sharded NTT: ppermute butterfly exchange, bit-identical to
the single-device transform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primus_fhe_tpu.parallel.coeff_sharded import coeff_sharded_forward32
from primus_fhe_tpu.parallel.mesh import make_mesh
from primus_fhe_tpu.transforms import build_plan32, forward32

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

Q = 536813569


@pytest.mark.parametrize("d,log_n", [(2, 8), (4, 8), (8, 9)])
def test_coeff_sharded_matches_single(d, log_n):
    n = 1 << log_n
    mesh = make_mesh(d, residue=d)  # use the 'residue' axis as the coeff axis
    rng = np.random.default_rng(d)
    vals = jnp.asarray(rng.integers(0, Q, (3, n), dtype=np.uint64).astype(np.uint32))
    plan = build_plan32(log_n, Q)
    single = np.asarray(forward32(plan, vals))

    from jax.sharding import NamedSharding, PartitionSpec as P

    sharded_in = jax.device_put(vals, NamedSharding(mesh, P(None, "residue")))
    out = coeff_sharded_forward32(mesh, "residue", log_n, Q, sharded_in)
    assert (np.asarray(out) == single).all()
