"""LWE samples: ``(..., n+1)`` arrays laid out ``|a (n)|b (1)|``.

Reference: ``crates/primus_lattice/src/lwe/single_message.rs`` and
``multiple_message.rs`` (``|a (n)|b (count)|``).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..modular import modops
from ..modular.modulus import BarrettModulus32

_U32 = jnp.uint32


def a(lwe, n: int):
    return lwe[..., :n]


def b(lwe, n: int):
    return lwe[..., n:]


def phase32(lwe, secret, m: BarrettModulus32):
    """Decryption phase ``b - <a, s> mod q`` (prime-q path)."""
    n = secret.shape[-1]
    dot = modops.dot32(lwe[..., :n], secret, m)
    return modops.sub32(lwe[..., n], dot, m.value)


def phase_torus32(lwe, secret):
    """Decryption phase ``b - <a, s> mod 2^32`` (TFHE torus path).

    Exact wrapping arithmetic — secret entries are small (binary/ternary as
    0/1/2^32-1), so plain u32 wrapping dot is the native-modulus dot.
    """
    n = secret.shape[-1]
    dot = jnp.sum(lwe[..., :n] * secret, axis=-1, dtype=_U32)
    return lwe[..., n] - dot


def add32(x, y, q):
    """Homomorphic addition of LWE samples mod prime q."""
    return modops.add32(x, y, q)


def add_torus(x, y):
    return x + y


def sub_torus(x, y):
    return x - y


def multi_msg_phase_torus32(lwe, secret, count: int):
    """Phases of a multi-message LWE ``|a (n)|b (count)|`` mod 2^32.

    Message ``j`` decrypts as ``b_j - <a, s_j-rotated>`` in the extracted
    convention; for the common trivial case (messages packed at rotations
    of one secret) callers supply the per-message secrets themselves — this
    helper computes ``b_j - <a, s>`` with a shared secret, matching
    ``MultiMsgLwe`` phase checks (multiple_message.rs:250-267).
    """
    n = secret.shape[-1]
    dot = jnp.sum(lwe[..., :n] * secret, axis=-1, dtype=_U32)
    return lwe[..., n : n + count] - dot[..., None]
