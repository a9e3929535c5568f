"""Concrete modulus records (reference: ``crates/primus_modulus/src/lib.rs:6-12``).

Each record is a NamedTuple pytree whose fields are jnp arrays, so a single
compiled kernel serves every modulus of the same width, and stacking records
along a leading axis yields the per-residue moduli of a DCRT table.

=====================  =======================================================
record                 reference analogue
=====================  =======================================================
``BarrettModulus32``   ``BarrettModulus<u32>`` — ``q < 2^31``, ratio
                       ``floor(2^64 / q)`` as two u32 limbs
                       (``src/barrett/mod.rs:25-139``)
``BarrettModulus64``   ``BarrettModulus<u64>`` — ``q < 2^62`` (lazy ``[0,4q)``
                       fits), ratio ``floor(2^128 / q)`` as two ``U64`` limbs
``NativeModulus32/64`` wrapping mod ``2^BITS`` (``src/native/mod.rs:19-53``)
``PowOf2Modulus32/64`` mask modulus (``src/power_of_two/mod.rs:12-79``)
=====================  =======================================================

``CompactModulus``/``UintModulus`` (add/sub-only and compare-subtract
fallback types) need no dedicated record here: the generic compare-subtract
ops in :mod:`.modops` accept a plain ``q`` array.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..numeric.limb import U64, to_u64_pair

_U32 = jnp.uint32


class BarrettModulus32(NamedTuple):
    """Barrett modulus for uint32 values, ``1 < q < 2^31``."""

    value: jnp.ndarray  # q
    ratio_lo: jnp.ndarray  # floor(2^64 / q) & 0xFFFFFFFF
    ratio_hi: jnp.ndarray  # floor(2^64 / q) >> 32


class BarrettModulus64(NamedTuple):
    """Barrett modulus for U64 values, ``1 < q < 2^62``."""

    value: U64  # q
    ratio0: U64  # floor(2^128 / q) low 64
    ratio1: U64  # floor(2^128 / q) high 64


class NativeModulus32(NamedTuple):
    """Implicit modulus 2^32 (wrapping uint32 arithmetic)."""


class NativeModulus64(NamedTuple):
    """Implicit modulus 2^64 (wrapping U64 arithmetic)."""


class PowOf2Modulus32(NamedTuple):
    """Modulus ``2^k`` with ``k <= 32``; stores the mask ``2^k - 1``."""

    mask: jnp.ndarray


class PowOf2Modulus64(NamedTuple):
    """Modulus ``2^k`` with ``k <= 64``; stores the mask as a U64."""

    mask: U64


def barrett32(q) -> BarrettModulus32:
    """Builds a :class:`BarrettModulus32` from host ints (scalar or array)."""
    qs = np.asarray(q, dtype=np.uint64)
    if np.any(qs <= 1) or np.any(qs >= 1 << 31):
        raise ValueError("BarrettModulus32 requires 1 < q < 2^31")
    flat = np.atleast_1d(qs)
    lo = np.empty(flat.shape, dtype=np.uint32)
    hi = np.empty(flat.shape, dtype=np.uint32)
    for i, qq in np.ndenumerate(flat):
        ratio = (1 << 64) // int(qq)
        lo[i] = ratio & 0xFFFFFFFF
        hi[i] = ratio >> 32
    if qs.ndim == 0:
        return BarrettModulus32(
            jnp.asarray(np.uint32(qs)), jnp.asarray(lo[0]), jnp.asarray(hi[0])
        )
    return BarrettModulus32(
        jnp.asarray(qs.astype(np.uint32)), jnp.asarray(lo), jnp.asarray(hi)
    )


def barrett64(q) -> BarrettModulus64:
    """Builds a :class:`BarrettModulus64` from host ints (scalar or array)."""
    arr = np.atleast_1d(np.asarray(q, dtype=np.uint64))
    scalar = np.asarray(q).ndim == 0
    if np.any(arr <= 1) or np.any(arr >= np.uint64(1) << np.uint64(62)):
        raise ValueError("BarrettModulus64 requires 1 < q < 2^62")
    r0 = np.empty(arr.shape, dtype=np.uint64)
    r1 = np.empty(arr.shape, dtype=np.uint64)
    for i, qq in np.ndenumerate(arr):
        ratio = (1 << 128) // int(qq)
        r0[i] = ratio & 0xFFFFFFFFFFFFFFFF
        r1[i] = ratio >> 64
    if scalar:
        arr, r0, r1 = arr[0], r0[0], r1[0]
    return BarrettModulus64(to_u64_pair(arr), to_u64_pair(r0), to_u64_pair(r1))


class CompactModulus32(NamedTuple):
    """Add/sub-only modulus ``q < 2^30`` (``src/compact/mod.rs:11-49``).

    Carries no Barrett ratio — use with the compare-subtract ops
    (:func:`~primus_fhe_tpu.modular.modops.add32` etc.) only.
    """

    value: jnp.ndarray


class CompactModulus64(NamedTuple):
    """Add/sub-only modulus ``q < 2^62`` (U64)."""

    value: U64


class UintModulus32(NamedTuple):
    """Compare-subtract fallback modulus, any ``q < 2^31``
    (``src/uint/mod.rs:11-43``); multiplication callers should prefer
    :class:`BarrettModulus32`."""

    value: jnp.ndarray


class UintModulus64(NamedTuple):
    """Compare-subtract fallback modulus, any ``q < 2^63`` (U64)."""

    value: U64


def compact32(q) -> CompactModulus32:
    qs = np.asarray(q, dtype=np.uint64)
    if np.any(qs >= 1 << 30):
        raise ValueError("CompactModulus32 requires q < 2^30")
    return CompactModulus32(jnp.asarray(qs.astype(np.uint32)))


def uint32_modulus(q) -> UintModulus32:
    qs = np.asarray(q, dtype=np.uint64)
    if np.any(qs >= 1 << 31):
        raise ValueError("UintModulus32 requires q < 2^31")
    return UintModulus32(jnp.asarray(qs.astype(np.uint32)))
