"""Sharded execution of the DCRT / external-product pipelines.

Strategy (BASELINE.json north star): annotate shardings on the inputs and
let XLA's SPMD partitioner insert the collectives.  The DCRT NTT touches
only the trailing coefficient axis → a residue-sharded transform runs with
**zero** communication; the CRT recombine's ``sum over residues`` becomes a
``psum`` over the ``residue`` mesh axis; batched ciphertexts shard over
``batch``.  No hand-written collectives are needed on this path — the
sharding annotations fully determine them (cf. the scaling-book recipe).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

from ..transforms.dcrt import DcrtPlan32, dcrt_forward32, dcrt_inverse32
from .mesh import residue_batch_sharding, residue_sharding


def shard_dcrt_values(values, mesh: Mesh, batch_axis: int | None = None):
    """Places ``(k, ..., n)`` residues onto the mesh (residue-major)."""
    if batch_axis is None:
        sh = residue_sharding(mesh, values.ndim)
    else:
        sh = residue_batch_sharding(mesh, values.ndim, batch_axis)
    return jax.device_put(values, sh)


def sharded_dcrt_forward32(plan: DcrtPlan32, values, mesh: Mesh, out_factor: int = 1):
    """Residue-sharded forward NTT — compiles to zero-collective SPMD."""
    sh = residue_sharding(mesh, values.ndim)
    f = jax.jit(
        dcrt_forward32,
        static_argnames=("out_factor",),
        in_shardings=(None, sh),
        out_shardings=sh,
    )
    return f(plan, values, out_factor)


def sharded_dcrt_inverse32(plan: DcrtPlan32, values, mesh: Mesh, out_factor: int = 1):
    sh = residue_sharding(mesh, values.ndim)
    f = jax.jit(
        dcrt_inverse32,
        static_argnames=("out_factor",),
        in_shardings=(None, sh),
        out_shardings=sh,
    )
    return f(plan, values, out_factor)


def sharded_external_product(conv, basis, glwe, key_ntt, mesh: Mesh):
    """External product with residue-sharded transforms and batch-sharded
    ciphertexts; the CRT recombine's residue contraction lowers to a psum.

    ``glwe``: ``(B..., k+1, N)`` sharded over ``batch`` on axis 0 (if
    batched); ``key_ntt``: ``(kp, k+1, L, k+1, N)`` sharded over
    ``residue`` on axis 0.
    """
    from ..lattice.tfhe import external_product

    key_sh = residue_sharding(mesh, key_ntt.ndim)
    if glwe.ndim > 2:
        from .mesh import batch_sharding

        glwe_sh = batch_sharding(mesh, glwe.ndim, axis=0)
        out_sh = glwe_sh
    else:
        from .mesh import replicate

        glwe_sh = replicate(mesh, glwe.ndim)
        out_sh = glwe_sh
    f = jax.jit(
        external_product,
        static_argnums=(0, 1),
        in_shardings=(glwe_sh, key_sh),
        out_shardings=out_sh,
    )
    return f(conv, basis, glwe, key_ntt)
