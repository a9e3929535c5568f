"""Circuit bootstrapping: LWE(bit) -> GGSW(bit).

The composite that turns leveled TFHE into fully-composable circuits
(Chillotti et al.): for every gadget level, a programmable bootstrap
produces ``LWE(m * B^l * 2^drop)`` under the extracted key; private
functional key switches then place each level into the GGSW rows —
row ``j < k`` needs phase ``-s_j * m * B^l`` (function ``f_j(x) = s_j x``),
the body row needs phase ``m * B^l`` (function ``f(x) = -x``).

Private functional key switch (the generalization of the packing switch):

    sigma       = (s_ext_1 .. s_ext_n, -1)          extended secret
    K_{i,l}     = GLWE_s( f(sigma_i) * B^l * 2^drop )
    out         = sum_{i,l} decomp_l(c_i) * K_{i,l},  c = (a, b)
    phase(out) ~= f(sum a_i s_i - b) = f(-mu)

so ``f = s_j x`` yields ``-s_j mu`` and ``f = -x`` yields ``mu``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..decompose.primitive import ApproxSignedBasis32
from ..lattice.tfhe import _external_product_tail
from ..transforms.torus import TorusConvolver32
from .blind_rotate import bootstrap

_U32 = jnp.uint32


def make_private_functional_ksk(
    key,
    f_poly,  # (N,) torus poly: the function's coefficient vector
    ext_secret,  # (n_ext,) the extracted-key coefficients (u32)
    glwe_secret,  # (k, N)
    basis: ApproxSignedBasis32,
    gaussian,
    conv: TorusConvolver32,
):
    """KSK ``(kp, n_ext+1, L, k+1, N)``: entry (i, l) encrypts
    ``f_poly * sigma_i * B^l * 2^drop`` with ``sigma_{n_ext} = -1``."""
    from ..lattice.glwe import generate_random_zero_sample_torus

    n_ext = ext_secret.shape[0]
    n = glwe_secret.shape[1]
    level = basis.decompose_length
    keys = jax.random.split(key, (n_ext + 1) * level)
    zs = jax.vmap(
        lambda kk: generate_random_zero_sample_torus(kk, glwe_secret, gaussian, conv)
    )(keys).reshape(n_ext + 1, level, glwe_secret.shape[0] + 1, n)

    scal = jnp.asarray(
        np.array([s & 0xFFFFFFFF for s in basis.scalars], dtype=np.uint32)
    )  # (L,)
    sigma = jnp.concatenate(
        [ext_secret.astype(_U32), (jnp.zeros((1,), _U32) - 1)]
    )  # (n_ext+1,), -1 == 2^32-1
    # message[i, l] = f_poly * sigma_i * scal_l   (wrapping torus)
    msg = (
        f_poly[None, None, :] * sigma[:, None, None] * scal[None, :, None]
    )  # (n_ext+1, L, N)
    ksk_coeff = zs.at[:, :, -1, :].add(msg)
    return conv.forward(ksk_coeff)  # (kp, n_ext+1, L, k+1, N)


@functools.partial(jax.jit, static_argnums=(0, 1))
def private_functional_key_switch(
    conv: TorusConvolver32,
    basis: ApproxSignedBasis32,
    lwe,  # (n_ext + 1,) the full (a, b) vector
    ksk_ntt,  # (kp, n_ext+1, L, k+1, N)
):
    """``sum_{i,l} decomp_l(c_i) ⊡ K_{i,l}`` — returns a GLWE ``(k+1, N)``."""
    kp, n_ext1, level, k1, n = ksk_ntt.shape
    # treat the n_ext+1 scalars as "components": digits (n_ext+1, L)
    digits = basis.decompose(lwe)  # (L, n_ext+1)
    digits = jnp.moveaxis(digits, 0, -1)  # (n_ext+1, L)
    # a *constant* polynomial is constant across NTT slots, so lift the
    # scalar digits straight into the residue domain and broadcast — no
    # forward transforms needed.
    res = conv.lift(digits)  # (kp, n_ext+1, L) centered residues
    f = jnp.broadcast_to(res[..., None], res.shape + (n,))
    acc = _external_product_tail(conv, f, ksk_ntt, batch=())
    return acc


def circuit_bootstrap(
    conv_pbs: TorusConvolver32,
    basis_pbs: ApproxSignedBasis32,
    bsk_ntt,
    conv_ks: TorusConvolver32,
    basis_cb: ApproxSignedBasis32,
    basis_priv: ApproxSignedBasis32,
    priv_ksks,  # list of k+1 private KSKs (rows 0..k-1: f=s_j x; row k: f=-x)
    lwe_ct,  # (n_lwe + 1,) encrypting m in {0, 1} at 1/2 scaling (m * 2^31)
    log_n: int,
):
    """LWE(bit) -> GGSW(bit) ``(k+1, L_cb, k+1, N)`` coeff domain."""
    n = 1 << log_n
    level = basis_cb.decompose_length
    rows = [[] for _ in range(len(priv_ksks))]
    # shift phases off the sign-bucket boundaries: m/2 -> m/2 + 1/4,
    # so m=0 lands in the lower half and m=1 in the upper half.
    lin = lwe_ct.at[-1].add(_U32(1 << 30))
    for l in range(level):
        scalar_l = basis_cb.scalars[l] & 0xFFFFFFFF
        half = (scalar_l // 2) & 0xFFFFFFFF
        # v = -scalar/2: sign test gives -scalar/2 for m=0, +scalar/2 for
        # m=1 (upper half negates); adding scalar/2 yields {0, scalar}.
        test_poly = jnp.full(n, _U32(-half & 0xFFFFFFFF), dtype=_U32)
        big = bootstrap(conv_pbs, basis_pbs, bsk_ntt, lin, test_poly, log_n)
        big = big.at[-1].add(_U32(half))
        for j, ksk in enumerate(priv_ksks):
            rows[j].append(
                private_functional_key_switch(conv_ks, basis_priv, big, ksk)
            )
    stacked = jnp.stack([jnp.stack(r) for r in rows])  # (k+1, L_cb, k+1, N)
    return stacked
