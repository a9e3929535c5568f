"""Mesh sharding for multi-chip / multi-host TPU execution."""

from .mesh import make_mesh, residue_sharding, batch_sharding, replicate
from .sharded import (
    shard_dcrt_values,
    sharded_dcrt_forward32,
    sharded_dcrt_inverse32,
    sharded_external_product,
)

__all__ = [
    "make_mesh",
    "residue_sharding",
    "batch_sharding",
    "replicate",
    "shard_dcrt_values",
    "sharded_dcrt_forward32",
    "sharded_dcrt_inverse32",
    "sharded_external_product",
]
