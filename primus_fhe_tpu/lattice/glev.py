"""GLev / RLev / GGSW / RGSW construction over a prime modulus.

Reference containers: ``crates/primus_lattice/src/{glev,rlev,ggsw,rgsw}``.
Layouts (leading batch axes allowed):

- GLev ``(L, k+1, N)``  — level ``l`` is a GLWE of ``m * B^l * 2^drop``
- RLev = GLev with k=1 (``(L, 2, N)``)
- GGSW ``(k+1, L, k+1, N)`` — row ``r`` is a GLev "aimed" at component r
- RGSW = GGSW with k=1

These builders use the prime-q (Barrett-32) RLWE machinery; the torus
variants live in :mod:`.tfhe`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..decompose.primitive import ApproxSignedBasis32
from ..distr.sampling import DiscreteGaussian, sample_uniform
from ..modular import modops
from ..modular.modulus import BarrettModulus32
from ..transforms.ntt import forward32, inverse32
from ..transforms.plan import NttPlan32

_U32 = jnp.uint32


def _glwe_zero_sample32(key, secret_ntt, gaussian, plan, m, q: int):
    """GLWE(0) over prime q: ``(a_1..a_k, sum a_i s_i + e)``.

    ``secret_ntt``: (k, N) NTT-domain secret polys.
    """
    k, n = secret_ntt.shape
    ka, ke = jax.random.split(key)
    a = sample_uniform(ka, (k, n), q)
    fa = forward32(plan, a)
    prods = modops.mul32(fa, secret_ntt, m)
    # exact modular sum over k (terms canonical)
    b_ntt = prods[0]
    for i in range(1, k):
        b_ntt = modops.add32(b_ntt, prods[i], m.value)
    b = inverse32(plan, b_ntt)
    e = gaussian.sample_mod(ke, (n,), q)
    b = modops.add32(b, e, m.value)
    return jnp.concatenate([a, b[None]], axis=0)


def glev_encrypt32(
    key,
    message,  # (N,) canonical mod q
    secret_ntt,  # (k, N)
    basis: ApproxSignedBasis32,
    gaussian: DiscreteGaussian,
    plan: NttPlan32,
    m: BarrettModulus32,
    q: int,
):
    """GLev(m): level l = GLWE(0) + m * B^l * 2^drop on the body."""
    level = basis.decompose_length
    keys = jax.random.split(key, level)
    rows = []
    for l in range(level):
        z = _glwe_zero_sample32(keys[l], secret_ntt, gaussian, plan, m, q)
        scal = jnp.uint32(basis.scalars[l] % q)
        contrib = modops.mul32(message, jnp.broadcast_to(scal, message.shape), m)
        z = z.at[-1].set(modops.add32(z[-1], contrib, m.value))
        rows.append(z)
    return jnp.stack(rows)


def rlev_encrypt32(key, message, secret_ntt, basis, gaussian, plan, m, q):
    """RLev = GLev with a single mask polynomial (k = 1)."""
    assert secret_ntt.shape[0] == 1
    return glev_encrypt32(key, message, secret_ntt, basis, gaussian, plan, m, q)


def ggsw_encrypt32(
    key,
    message,  # (N,) canonical mod q
    secret_ntt,  # (k, N)
    basis: ApproxSignedBasis32,
    gaussian: DiscreteGaussian,
    plan: NttPlan32,
    m: BarrettModulus32,
    q: int,
):
    """GGSW(m): row r level l = GLWE(0) + m * B^l * 2^drop at component r."""
    k = secret_ntt.shape[0]
    level = basis.decompose_length
    keys = jax.random.split(key, (k + 1) * level)
    rows = []
    idx = 0
    for r in range(k + 1):
        for l in range(level):
            z = _glwe_zero_sample32(keys[idx], secret_ntt, gaussian, plan, m, q)
            idx += 1
            scal = jnp.uint32(basis.scalars[l] % q)
            contrib = modops.mul32(message, jnp.broadcast_to(scal, message.shape), m)
            z = z.at[r].set(modops.add32(z[r], contrib, m.value))
            rows.append(z)
    n = secret_ntt.shape[1]
    return jnp.stack(rows).reshape(k + 1, level, k + 1, n)


def rgsw_encrypt32(key, message, secret_ntt, basis, gaussian, plan, m, q):
    """RGSW = GGSW with k = 1 (``src/rgsw/mod.rs``)."""
    assert secret_ntt.shape[0] == 1
    return ggsw_encrypt32(key, message, secret_ntt, basis, gaussian, plan, m, q)


def glwe_phase32(glwe, secret_ntt, plan, m):
    """``b - sum a_i s_i`` mod q."""
    k = secret_ntt.shape[0]
    a = glwe[..., :k, :]
    b = glwe[..., k, :]
    fa = forward32(plan, a)
    prods = modops.mul32(fa, secret_ntt, m)
    acc = prods[..., 0, :]
    for i in range(1, k):
        acc = modops.add32(acc, prods[..., i, :], m.value)
    return modops.sub32(b, inverse32(plan, acc), m.value)
