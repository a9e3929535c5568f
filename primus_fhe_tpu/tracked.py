"""Noise-tracked ciphertexts: variance bookkeeping alongside values.

The reference has no noise subsystem (parameters are chosen offline); this
layer rides each LWE sample with a :class:`~primus_fhe_tpu.noise.NoiseEstimate`
so pipelines can assert decryption-failure margins *before* decrypting —
the production guardrail an FHE serving stack needs.  Linear ops propagate
variance exactly (independence heuristic); a bootstrap resets it to the
fresh-bootstrap value from the same formulas validated statistically in
``tests/test_tracked.py``.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from . import noise
from .params import TfheContext

_U32 = jnp.uint32


@dataclasses.dataclass
class TrackedLwe:
    """LWE sample ``(..., n+1)`` with its running noise estimate."""

    ct: jnp.ndarray
    noise: noise.NoiseEstimate

    def margin(self, message_bits: int) -> float:
        """Decryption-failure margin (>1 = safe) for the message space."""
        return self.noise.decryption_failure_margin(message_bits)


def encrypt_bit(ctx: TfheContext, key, bit) -> TrackedLwe:
    """Encrypts TRUE/FALSE (±1/8) under the LWE secret with fresh noise."""
    import jax

    p = ctx.params
    mu = (1 << 29) if bit else ((1 << 32) - (1 << 29))
    ka, ke = jax.random.split(key)
    a = jax.random.bits(ka, (p.lwe_dim,), dtype=_U32)
    e = ctx.gaussian.sample_torus32(ke, ())
    b = jnp.sum(a * ctx.lwe_secret, dtype=_U32) + _U32(mu) + e
    return TrackedLwe(jnp.concatenate([a, b[None]]), noise.fresh_lwe(p.lwe_sigma))


def trivial(ctx: TfheContext, mu: int) -> TrackedLwe:
    ct = jnp.zeros(ctx.params.lwe_dim + 1, dtype=_U32).at[-1].set(_U32(mu % (1 << 32)))
    return TrackedLwe(ct, noise.NoiseEstimate(0.0))


def add(a: TrackedLwe, b: TrackedLwe) -> TrackedLwe:
    return TrackedLwe(a.ct + b.ct, noise.add(a.noise, b.noise))


def sub(a: TrackedLwe, b: TrackedLwe) -> TrackedLwe:
    return TrackedLwe(a.ct - b.ct, noise.add(a.noise, b.noise))


def neg(a: TrackedLwe) -> TrackedLwe:
    return TrackedLwe(jnp.zeros_like(a.ct) - a.ct, a.noise)


def scalar_mul(a: TrackedLwe, c: int) -> TrackedLwe:
    return TrackedLwe(a.ct * _U32(c % (1 << 32)), noise.scalar_mul(a.noise, c))


def _fresh_bootstrap_noise(ctx: TfheContext) -> noise.NoiseEstimate:
    p = ctx.params
    br = noise.blind_rotate(
        p.lwe_dim, p.glwe_sigma, p.n, p.glwe_dim, p.level,
        p.log_basis, ctx.basis.drop_bits,
    )
    return noise.key_switch(
        br, p.lwe_sigma, p.glwe_dim * p.n, p.ks_level,
        p.ks_log_basis, ctx.ks_basis.drop_bits,
    )


def pre_rotation_noise(ctx: TfheContext, lin: noise.NoiseEstimate) -> noise.NoiseEstimate:
    """Noise entering the sign test: affine noise + modulus-switch rounding.

    This is the quantity whose 4-sigma tail must stay inside the half
    bucket (q/16 for the ±1/8 gate encoding) for the gate to be correct.
    """
    return noise.modulus_switch(lin, ctx.params.lwe_dim, ctx.params.log_n + 1)


def bootstrap(ctx: TfheContext, c: TrackedLwe, test_poly=None) -> TrackedLwe:
    """Sign bootstrap + key switch; output noise is input-independent."""
    from .boot.blind_rotate import bootstrap as _boot
    from .lattice.keyswitch import key_switch

    p = ctx.params
    tp = (
        test_poly
        if test_poly is not None
        else jnp.full(p.n, _U32(1 << 29), dtype=_U32)
    )
    big = _boot(ctx.conv, ctx.basis, ctx.bsk, c.ct, tp, p.log_n)
    out = key_switch(big, ctx.ksk, ctx.ks_basis)
    return TrackedLwe(out, _fresh_bootstrap_noise(ctx))


def gate(ctx: TfheContext, kind: str, a: TrackedLwe, b: TrackedLwe,
         min_margin: float = 1.0) -> TrackedLwe:
    """Tracked boolean gate; raises if the pre-rotation margin is unsafe.

    ``kind``: "nand" | "and" | "or".  The margin check uses the tracked
    input variances — the runtime guardrail offline parameter selection
    cannot give you.
    """
    offsets = {"nand": -(5 << 29), "and": -(1 << 29), "or": (1 << 29)}
    off = offsets[kind]
    lin = add(a, b)
    # the affine offset touches only the body coefficient (noise-free)
    lin_ct = lin.ct.at[..., -1].add(_U32(off % (1 << 32)))
    pre = pre_rotation_noise(ctx, lin.noise)
    margin = pre.decryption_failure_margin(message_bits=2)
    if margin < min_margin:
        raise ValueError(
            f"gate '{kind}' unsafe: pre-rotation margin {margin:.3f} < {min_margin}"
        )
    return bootstrap(ctx, TrackedLwe(lin_ct, pre))


def decrypt_phase(ctx: TfheContext, c: TrackedLwe):
    """Centered phase (int64) — for tests and measured-vs-predicted checks."""
    import numpy as np

    ct = np.asarray(c.ct)
    s = np.asarray(ctx.lwe_secret).astype(np.int64)
    ph = (ct[..., -1].astype(np.int64) - ct[..., :-1].astype(np.int64) @ s) % (1 << 32)
    return np.where(ph >= 1 << 31, ph - (1 << 32), ph)
