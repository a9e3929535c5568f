"""Parameter-set context construction + key serialization round-trip."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from primus_fhe_tpu import params as P
from primus_fhe_tpu.boot.gates import TRUE_MU, nand_gate
from primus_fhe_tpu.lattice.lwe import phase_torus32


def _encrypt(key, bit, secret):
    from primus_fhe_tpu.boot.gates import FALSE_MU

    n = secret.shape[0]
    a = jax.random.bits(key, (n,), dtype=jnp.uint32)
    b = jnp.sum(a * secret, dtype=jnp.uint32) + jnp.uint32(TRUE_MU if bit else FALSE_MU)
    return jnp.concatenate([a, b[None]])


def _decrypt(ct, secret):
    ph = int(np.asarray(phase_torus32(ct, secret), dtype=np.uint32))
    return (ph - (1 << 32) if ph >= 1 << 31 else ph) > 0


def test_toy_context_end_to_end():
    ctx = P.make_context(jax.random.PRNGKey(1), P.TOY)
    key = jax.random.PRNGKey(2)
    c1 = _encrypt(jax.random.fold_in(key, 0), 1, ctx.lwe_secret)
    c2 = _encrypt(jax.random.fold_in(key, 1), 1, ctx.lwe_secret)
    out = nand_gate(
        ctx.conv, ctx.basis, ctx.bsk, ctx.ksk, ctx.ks_basis, c1, c2,
        ctx.params.log_n,
    )
    assert _decrypt(out, ctx.lwe_secret) is False  # NAND(T, T) = F


def test_key_serialization_roundtrip():
    ctx = P.make_context(jax.random.PRNGKey(3), P.TOY)
    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        P.save_keys(f.name, ctx)
        ctx2 = P.load_keys(f.name)
    assert ctx2.params == ctx.params
    assert (np.asarray(ctx2.bsk) == np.asarray(ctx.bsk)).all()
    assert (np.asarray(ctx2.ksk) == np.asarray(ctx.ksk)).all()
    # loaded keys still evaluate
    key = jax.random.PRNGKey(4)
    c1 = _encrypt(jax.random.fold_in(key, 0), 0, ctx2.lwe_secret)
    c2 = _encrypt(jax.random.fold_in(key, 1), 1, ctx2.lwe_secret)
    out = nand_gate(
        ctx2.conv, ctx2.basis, ctx2.bsk, ctx2.ksk, ctx2.ks_basis, c1, c2,
        ctx2.params.log_n,
    )
    assert _decrypt(out, ctx2.lwe_secret) is True  # NAND(F, T) = T


def test_make_context_bsk_uses_glwe_sigma():
    """Wide-LWE / narrow-GLWE profile (the estimator-validated shape):
    the bootstrap key must be encrypted at glwe_sigma.  Keying the bsk
    with this test's lwe_sigma=4e4 would put ~2^26.8 of blind-rotate
    noise on every output (vs ~2^24.8 legitimate total), so 64 samples
    against a 2^27 deviation bound separate the two cases cleanly."""
    import dataclasses

    from primus_fhe_tpu.boot import bootstrap as boot_fn

    p = dataclasses.replace(P.TOY, lwe_sigma=4.0e4, glwe_sigma=3.2)
    ctx = P.make_context(jax.random.PRNGKey(5), p)
    batch = 64
    key = jax.random.PRNGKey(6)
    mus = jnp.asarray(
        np.where(
            np.arange(batch) % 2 == 0, 1 << 29, (1 << 32) - (1 << 29)
        ).astype(np.uint32)
    )
    a = jax.random.bits(key, (batch, p.lwe_dim), dtype=jnp.uint32)
    b = jnp.sum(a * ctx.lwe_secret[None], axis=1, dtype=jnp.uint32) + mus
    cts = jnp.concatenate([a, b[:, None]], axis=1)
    test_poly = jnp.full(p.n, jnp.uint32(1 << 28), dtype=jnp.uint32)
    out = boot_fn(ctx.conv, ctx.basis, ctx.bsk, cts, test_poly, p.log_n)
    ph = np.asarray(
        phase_torus32(out, ctx.glwe_secret.reshape(-1))
    ).astype(np.int64)
    ph = np.where(ph >= 1 << 31, ph - (1 << 32), ph)
    assert ((ph > 0) == (np.arange(batch) % 2 == 0)).all()
    assert (np.abs(np.abs(ph) - (1 << 28)) < 1 << 27).all()
