"""Opt-in lazy-range contract checking at kernel boundaries.

The reference enforces its lazy-range invariants with a pervasive
``debug_assert!`` discipline (e.g.
``crates/primus_ntt/src/ntt/prime64/avx512/internal.rs:61-73``); release
builds compile the checks away.  The analogue here: every fused-kernel
entry point calls :func:`check_range_*` on its inputs, which is a no-op
unless the process runs with ``PRIMUS_DEBUG=1`` — then an ordered host
callback validates the actual device values and raises
:class:`RangeContractError` (surfacing as a loud ``JaxRuntimeError``
under jit) instead of letting an out-of-contract caller get silent wrong
answers.

The flag is read at **trace time**: zero overhead when off, and an
executable compiled while the flag was off is not retrofitted — enable
the env var before the first call (the test suite runs the checked cases
with fresh shapes so tracing happens under the flag).
"""

from __future__ import annotations

import os

import numpy as np


class RangeContractError(AssertionError):
    """A lazy-range invariant ([0, c*q)) was violated at a kernel boundary."""


def enabled() -> bool:
    return os.environ.get("PRIMUS_DEBUG") == "1"


def _fail(what: str, mx: int, bound: int):
    raise RangeContractError(
        f"{what}: max value {mx} breaks the [0, {bound}) range contract "
        f"(set by the lazy-reduction design; see CLAUDE.md invariants)"
    )


def check_range_u32(values, q, factor: int, what: str) -> None:
    """Assert every element of a uint32 array is ``< factor * q``
    (debug only).  ``q`` may be a Python int or a traced device scalar —
    the comparison runs host-side in the callback either way."""
    if not enabled():
        return
    import jax.numpy as jnp
    from jax.experimental import io_callback

    def cb(v, qv):
        bound = factor * int(qv)
        mx = int(np.asarray(v).max(initial=0))
        if mx >= bound:
            _fail(what, mx, bound)

    io_callback(cb, None, values, jnp.asarray(q), ordered=True)


def check_range_u64(values, q, factor: int, what: str) -> None:
    """Assert every element of a U64 pair is ``< factor * q`` (debug only).

    ``q`` may be a Python int or a U64 scalar pair."""
    if not enabled():
        return
    import jax.numpy as jnp
    from jax.experimental import io_callback

    if hasattr(q, "lo"):
        qlo, qhi = q.lo, q.hi
    else:
        qlo = jnp.uint32(int(q) & 0xFFFFFFFF)
        qhi = jnp.uint32(int(q) >> 32)

    def cb(lo, hi, ql, qh):
        bound = factor * ((int(qh) << 32) | int(ql))
        v = np.asarray(lo).astype(np.uint64) | (
            np.asarray(hi).astype(np.uint64) << np.uint64(32)
        )
        mx = int(v.max(initial=0))
        if mx >= bound:
            _fail(what, mx, bound)

    io_callback(cb, None, values.lo, values.hi, qlo, qhi, ordered=True)
