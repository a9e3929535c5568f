"""GLWE -> GLWE key switching (torus 2^32, exact backend).

The polynomial analogue of :mod:`.keyswitch`: each input mask polynomial
is gadget-decomposed and multiplied against a GLev encryption of the
corresponding input-secret polynomial under the output key:

    KSK_i = GLev_{s_out}( s_in_i )            (i = 1..k_in)
    out   = (0, ..., b) - sum_i decomp(a_i) ⊡ KSK_i

Used for key rotation, dimension changes, and as the body of packing
key switches.  Shares the external-product MAC tail.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..decompose.primitive import ApproxSignedBasis32
from ..transforms.torus import TorusConvolver32
from .tfhe import _external_product_tail

_U32 = jnp.uint32


def make_glwe_keyswitch_key(
    key,
    secret_in,  # (k_in, N) torus polys
    secret_out,  # (k_out, N)
    basis: ApproxSignedBasis32,
    gaussian,
    conv: TorusConvolver32,
):
    """KSK ``(kp, k_in, L, k_out+1, N)`` NTT residues."""
    from .glwe import generate_random_zero_sample_torus

    k_in, n = secret_in.shape
    level = basis.decompose_length
    keys = jax.random.split(key, k_in * level)
    zs = jax.vmap(
        lambda kk: generate_random_zero_sample_torus(kk, secret_out, gaussian, conv)
    )(keys).reshape(k_in, level, secret_out.shape[0] + 1, n)
    import numpy as np

    scal = jnp.asarray(
        np.array([s & 0xFFFFFFFF for s in basis.scalars], dtype=np.uint32)
    )
    contrib = secret_in[:, None, :] * scal[None, :, None]  # (k_in, L, N)
    ksk_coeff = zs.at[:, :, -1, :].add(contrib)
    return conv.forward(ksk_coeff)  # (kp, k_in, L, k_out+1, N)


@functools.partial(jax.jit, static_argnums=(0, 1))
def glwe_key_switch(
    conv: TorusConvolver32,
    basis: ApproxSignedBasis32,
    glwe_in,  # (B..., k_in+1, N)
    ksk_ntt,  # (kp, k_in, L, k_out+1, N)
):
    """Switches ``(B..., k_in+1, N)`` to ``(B..., k_out+1, N)``."""
    kp, k_in, level, k_out1, n = ksk_ntt.shape
    batch = glwe_in.shape[:-2]
    a = glwe_in[..., :k_in, :]
    b = glwe_in[..., k_in, :]

    digits = basis.decompose(a)  # (L, B..., k_in, N)
    digits = jnp.moveaxis(digits, 0, -2)  # (B..., k_in, L, N)
    f = conv.forward(digits)  # (kp, B..., k_in, L, N)
    acc = _external_product_tail(conv, f, ksk_ntt, batch)  # (B..., k_out+1, N)

    out = jnp.zeros(batch + (k_out1, n), dtype=_U32)
    out = out.at[..., -1, :].set(b)
    return out - acc


# ---------------------------------------------------------------------------
# LWE -> RLWE packing key switch
# ---------------------------------------------------------------------------


def make_packing_keyswitch_key(
    key,
    lwe_secret,  # (n_lwe,) bits/values as uint32
    glwe_secret,  # (k_out, N)
    basis: ApproxSignedBasis32,
    gaussian,
    conv: TorusConvolver32,
):
    """Packing KSK: input dimension ``i`` keyed by the *constant* polynomial
    ``s_i`` — ``(kp, n_lwe, L, k_out+1, N)`` NTT residues."""
    n = glwe_secret.shape[1]
    s_in = jnp.zeros((lwe_secret.shape[0], n), dtype=_U32).at[:, 0].set(lwe_secret)
    return make_glwe_keyswitch_key(key, s_in, glwe_secret, basis, gaussian, conv)


def pack_lwes(
    conv: TorusConvolver32,
    basis: ApproxSignedBasis32,
    lwes,  # (count, n_lwe + 1) torus u32, count <= N
    pksk_ntt,
):
    """Packs ``count`` LWE samples into one GLWE encrypting
    ``sum_j m_j X^j`` (the standard functional packing key switch).

    Builds the mask polynomials ``a_i(X) = sum_j a_{j,i} X^j`` and the body
    ``b(X) = sum_j b_j X^j``, then runs the GLWE key switch.
    """
    kp, n_lwe, level, k_out1, n = pksk_ntt.shape
    count = lwes.shape[0]
    assert count <= n
    a_polys = jnp.zeros((n_lwe, n), dtype=_U32)
    a_polys = a_polys.at[:, :count].set(lwes[:, :n_lwe].T)
    b_poly = jnp.zeros((n,), dtype=_U32).at[:count].set(lwes[:, n_lwe])
    glwe_in = jnp.concatenate([a_polys, b_poly[None]], axis=0)
    return glwe_key_switch(conv, basis, glwe_in, pksk_ntt)
