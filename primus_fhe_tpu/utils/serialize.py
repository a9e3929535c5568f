"""Zero-copy byte round-trips for ciphertexts and parameter tables.

Reference: the ``impl_bytes_conversion!`` macro gives every container
``from_bytes``/``to_bytes`` via bytemuck casts
(``crates/primus_lattice/src/macros/mod.rs:39-97``).  Here the same role is
played by little-endian NumPy buffer views — every container is an array
(or a U64 pair), so serialization is a dtype-tagged byte cast.
"""

from __future__ import annotations

import numpy as np

from ..numeric.limb import U64, from_u64_pair, to_u64_pair


def u32_to_bytes(arr) -> bytes:
    """uint32 array -> little-endian bytes (shape-flattened)."""
    return np.ascontiguousarray(np.asarray(arr, dtype="<u4")).tobytes()


def u32_from_bytes(data: bytes, shape) -> np.ndarray:
    out = np.frombuffer(data, dtype="<u4").reshape(shape)
    return out.copy()


def u64_to_bytes(pair: U64) -> bytes:
    """U64 pair -> little-endian u64 bytes."""
    return np.ascontiguousarray(from_u64_pair(pair).astype("<u8")).tobytes()


def u64_from_bytes(data: bytes, shape) -> U64:
    arr = np.frombuffer(data, dtype="<u8").reshape(shape).copy()
    return to_u64_pair(arr)
