"""RLWE samples: ``(..., 2, N)`` arrays ``[a; b]`` over a prime modulus.

Reference: ``crates/primus_lattice/src/rlwe/coeff.rs`` — zero-sample
generation (a uniform, ``b = a*s + e`` via NTT, coeff.rs:92-121) and LWE
sample extraction (coeff.rs:58-264).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..distr.sampling import DiscreteGaussian, sample_uniform
from ..modular import modops
from ..modular.modulus import BarrettModulus32
from ..transforms.ntt import forward32, inverse32
from ..transforms.plan import NttPlan32

_U32 = jnp.uint32


@functools.partial(jax.jit, static_argnums=(2, 5))
def generate_random_zero_sample32(
    key,
    secret_ntt,  # (N,) secret key in NTT domain (bit-reversed)
    gaussian: DiscreteGaussian,
    plan: NttPlan32,
    m: BarrettModulus32,
    q: int,
):
    """RLWE encryption of zero: ``(a, a*s + e)`` (coeff.rs:92-121)."""
    n = plan.n
    ka, ke = jax.random.split(key)
    a = sample_uniform(ka, (n,), q)
    b = forward32(plan, a)
    b = modops.mul32(b, secret_ntt, m)
    b = inverse32(plan, b)
    e = gaussian.sample_mod(ke, (n,), q)
    b = modops.add32(b, e, m.value)
    return jnp.stack([a, b], axis=-2)


@functools.partial(jax.jit, static_argnums=(3, 6))
def encrypt32(key, message, secret_ntt, gaussian, plan, m, q: int):
    """RLWE encryption of a message polynomial (zero sample + m on b)."""
    ct = generate_random_zero_sample32(key, secret_ntt, gaussian, plan, m, q)
    b = modops.add32(ct[..., 1, :], message, m.value)
    return ct.at[..., 1, :].set(b)


@jax.jit
def phase32(rlwe, secret_ntt, plan: NttPlan32, m: BarrettModulus32):
    """``b - a*s`` — decryption phase via NTT."""
    a = rlwe[..., 0, :]
    b = rlwe[..., 1, :]
    fa = forward32(plan, a)
    prod = inverse32(plan, modops.mul32(fa, secret_ntt, m))
    return modops.sub32(b, prod, m.value)


# ---------------------------------------------------------------------------
# LWE sample extraction (coeff.rs:194-264)
# ---------------------------------------------------------------------------


def extract_lwe32(rlwe, q):
    """Extracts the LWE sample of coefficient 0.

    ``a'_0 = a_0``, ``a'_j = -a_{n-j}`` for j >= 1, ``b' = b_0``.
    """
    a = rlwe[..., 0, :]
    b = rlwe[..., 1, :]
    n = a.shape[-1]
    tail = modops.neg32(a[..., 1:][..., ::-1], q)
    return jnp.concatenate(
        [a[..., :1], tail, b[..., :1]], axis=-1
    )


def extract_lwe_with_index32(rlwe, index, q):
    """Extracts the LWE sample of coefficient ``index``
    (coeff.rs:194-229).

    ``index`` may be a Python int (static slicing, one program per index)
    or a TRACED value (runtime index, ONE compiled program — matching the
    reference's runtime-``index`` signature).  The traced path uses the
    identity ``extract_i(a, b) = extract_0(a*X^{-i}, b*X^{-i})``: the
    negacyclic rotation runs as bit-chain conditional static rolls, the
    same machinery as the blind-rotation accumulator
    (`boot/blind_rotate._rotate_glwe`), never a data-dependent gather.
    ``index`` broadcasts against the batch dims."""
    a = rlwe[..., 0, :]
    b = rlwe[..., 1, :]
    if isinstance(index, int):
        head = a[..., : index + 1][..., ::-1]
        tail = modops.neg32(a[..., index + 1 :][..., ::-1], q)
        return jnp.concatenate(
            [head, tail, b[..., index : index + 1]], axis=-1
        )
    from ..poly.poly import poly_rotate32

    d = -jnp.asarray(index, jnp.int32)
    ar = poly_rotate32(a, d, q)
    br = poly_rotate32(b, d, q)
    tail = modops.neg32(ar[..., 1:][..., ::-1], q)
    return jnp.concatenate([ar[..., :1], tail, br[..., :1]], axis=-1)


def extract_first_few_lwe32(rlwe, count: int, q):
    """Extracts a multi-message LWE: ``|a'(n)|b(count)|`` (coeff.rs:232)."""
    a = rlwe[..., 0, :]
    b = rlwe[..., 1, :]
    tail = modops.neg32(a[..., 1:][..., ::-1], q)
    return jnp.concatenate([a[..., :1], tail, b[..., :count]], axis=-1)


# ---------------------------------------------------------------------------
# Torus (mod 2^32) variants — wrapping arithmetic, no Barrett needed
# ---------------------------------------------------------------------------


def extract_lwe_torus32(rlwe):
    a = rlwe[..., 0, :]
    b = rlwe[..., 1, :]
    tail = jnp.zeros_like(a[..., 1:]) - a[..., 1:][..., ::-1]
    return jnp.concatenate([a[..., :1], tail, b[..., :1]], axis=-1)


def mul_ntt_polynomial32(rlwe, ntt_poly, plan: NttPlan32, m):
    """``NTT(self) * ntt_poly`` per component (coeff.rs:168-190) — returns
    the NTT-domain RLWE."""
    f = forward32(plan, rlwe)
    return modops.mul32(f, ntt_poly, m)
