"""Shoup precomputed-multiplier factors.

Reference: ``crates/primus_factor/src/shoup_factor/mod.rs:104-143`` — a
factor stores ``(w, floor(w * B / q))`` and multiplies any ``y`` by ``w``
mod ``q`` with a single high-half product and a wrapping low-word combine:

    q_hat = hi(w_precon * y)
    r     = w * y - q * q_hat        (wrapping, r in [0, 2q))

Canonical results come from the min-trick ``reduce_once``.  Factor fields
are arrays: a root table is simply a ``ShoupFactor*`` whose fields carry the
table axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..numeric.limb import (
    U64,
    mulhi_u32,
    to_u64_pair,
    u64_mul_hi,
    u64_mul_lo,
    u64_sub,
)

_U32 = jnp.uint32


class ShoupFactor32(NamedTuple):
    """``(w, floor(w * 2^32 / q))`` for uint32 moduli ``q < 2^31``."""

    value: jnp.ndarray
    quotient: jnp.ndarray


class ShoupFactor64(NamedTuple):
    """``(w, floor(w * 2^64 / q))`` for U64 moduli ``q < 2^63``."""

    value: U64
    quotient: U64


def shoup32(w, q) -> ShoupFactor32:
    """Builds a :class:`ShoupFactor32` from host ints (scalar or array)."""
    scalar = np.asarray(w).ndim == 0 and np.asarray(q).ndim == 0
    w_arr = np.atleast_1d(np.asarray(w, dtype=np.uint64))
    q_arr = np.atleast_1d(np.asarray(q, dtype=np.uint64))
    wb, qb = np.broadcast_arrays(w_arr, q_arr)
    quot = np.empty(wb.shape, dtype=np.uint32)
    for i, _ in np.ndenumerate(quot):
        quot[i] = ((int(wb[i]) << 32) // int(qb[i])) & 0xFFFFFFFF
    if scalar:
        return ShoupFactor32(jnp.uint32(wb[0]), jnp.uint32(quot[0]))
    return ShoupFactor32(jnp.asarray(wb.astype(np.uint32)), jnp.asarray(quot))


def shoup64(w, q) -> ShoupFactor64:
    """Builds a :class:`ShoupFactor64` from host ints (scalar or array)."""
    w_arr = np.atleast_1d(np.asarray(w, dtype=np.uint64))
    q_arr = np.atleast_1d(np.asarray(q, dtype=np.uint64))
    quot = np.empty(np.broadcast_shapes(w_arr.shape, q_arr.shape), dtype=np.uint64)
    wb, qb = np.broadcast_arrays(w_arr, q_arr)
    for i, _ in np.ndenumerate(quot):
        quot[i] = ((int(wb[i]) << 64) // int(qb[i])) & 0xFFFFFFFFFFFFFFFF
    scalar = np.asarray(w).ndim == 0 and np.asarray(q).ndim == 0
    if scalar:
        return ShoupFactor64(to_u64_pair(w_arr[0]), to_u64_pair(quot[0]))
    return ShoupFactor64(to_u64_pair(np.asarray(wb)), to_u64_pair(quot))


# ---------------------------------------------------------------------------
# Factor multiplies (device)
# ---------------------------------------------------------------------------


def factor_mul_lazy32(y, factor: ShoupFactor32, q):
    """``y * w mod q`` in ``[0, 2q)`` — uint32 path."""
    y = jnp.asarray(y, dtype=_U32)
    q_hat = mulhi_u32(y, factor.quotient)
    return factor.value * y - q * q_hat


def factor_mul32(y, factor: ShoupFactor32, q):
    """``y * w mod q`` in ``[0, q)`` via the min-trick reduce_once."""
    r = factor_mul_lazy32(y, factor, q)
    return jnp.minimum(r, r - q)


def factor_mul_lazy64(y: U64, factor: ShoupFactor64, q: U64) -> U64:
    """``y * w mod q`` in ``[0, 2q)`` — U64 limb path."""
    q_hat = u64_mul_hi(y, factor.quotient)
    return u64_sub(u64_mul_lo(factor.value, y), u64_mul_lo(q, q_hat))


def factor_mul64(y: U64, factor: ShoupFactor64, q: U64) -> U64:
    """``y * w mod q`` in ``[0, q)``."""
    from ..numeric.limb import u64_min

    r = factor_mul_lazy64(y, factor, q)
    return u64_min(r, u64_sub(r, q))


class MultiplyFactor32(NamedTuple):
    """Generic precomputed multiplier (``primus_factor::MultiplyFactor``,
    ``src/mul_factor/mod.rs``): identical storage to :class:`ShoupFactor32`
    but without the ``q < 2^31`` canonical-result contract — callers manage
    the output range themselves via :func:`factor_mul_lazy32`."""

    value: jnp.ndarray
    quotient: jnp.ndarray


def multiply_factor32(w, q) -> MultiplyFactor32:
    f = shoup32(w, q)
    return MultiplyFactor32(f.value, f.quotient)
