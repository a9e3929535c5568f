"""Noise-budget bookkeeping for ciphertext pipelines.

Neither the reference nor most primitive layers track noise; parameters
are chosen offline.  This module provides the standard variance
propagation formulas so users can validate parameter sets and assert
budgets in tests.  All variances are in squared torus units (2^32 scale
unless stated).  Formulas follow the usual TFHE analyses (independence
heuristics); the *exact* transform backend means no FFT term appears —
one source of noise fewer than f64-based implementations.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class NoiseEstimate:
    """Variance (torus^2 units) plus helpers."""

    variance: float

    @property
    def stddev(self) -> float:
        return math.sqrt(self.variance)

    def bits(self) -> float:
        """log2 of the ~4-sigma noise amplitude (failure ~6e-5)."""
        return math.log2(4.0 * self.stddev) if self.variance > 0 else 0.0

    def decryption_failure_margin(self, message_bits: int, torus_bits: int = 32) -> float:
        """Ratio of the half-bucket to 4-sigma noise (>1 means safe)."""
        half_bucket = 2.0 ** (torus_bits - message_bits - 2)
        return half_bucket / max(4.0 * self.stddev, 1e-30)


def fresh_lwe(sigma: float) -> NoiseEstimate:
    return NoiseEstimate(sigma * sigma)


def add(a: NoiseEstimate, b: NoiseEstimate) -> NoiseEstimate:
    return NoiseEstimate(a.variance + b.variance)


def scalar_mul(a: NoiseEstimate, c: int) -> NoiseEstimate:
    return NoiseEstimate(a.variance * c * c)


def external_product(
    input_noise: NoiseEstimate,
    key_sigma: float,
    n: int,
    k: int,
    level: int,
    log_basis: int,
    drop_bits: int,
) -> NoiseEstimate:
    """Noise after one exact external product.

    ``var_out = (k+1) * level * n * (B^2/12) * key_sigma^2     (gadget MAC)
              + input_noise                                     (carried)
              + (k+1) * n * eps^2 / 12 * |s|^2-ish              (drop error)``

    with ``eps = 2^drop_bits`` the gadget approximation step.  No FFT
    rounding term — the transform is exact.
    """
    b2 = float(1 << (2 * log_basis))
    gadget = (k + 1) * level * n * (b2 / 12.0) * key_sigma * key_sigma
    eps = float(1 << drop_bits) if drop_bits > 0 else 0.0
    # centered drop error per coefficient ~ U(-eps/2, eps/2); aggregated
    # against binary secret coefficients (E|s| = 1/2 per coeff).
    drop = (k + 1) * n * (eps * eps / 12.0) * 0.5
    return NoiseEstimate(input_noise.variance + gadget + drop)


def cmux(
    acc_noise: NoiseEstimate,
    key_sigma: float,
    n: int,
    k: int,
    level: int,
    log_basis: int,
    drop_bits: int,
) -> NoiseEstimate:
    """One blind-rotation CMux: the external product of the rotate-diff
    adds noise on top of the carried accumulator noise."""
    return external_product(acc_noise, key_sigma, n, k, level, log_basis, drop_bits)


def blind_rotate(
    n_lwe: int,
    key_sigma: float,
    n: int,
    k: int,
    level: int,
    log_basis: int,
    drop_bits: int,
) -> NoiseEstimate:
    """Noise of a freshly bootstrapped sample (before key switch)."""
    acc = NoiseEstimate(0.0)
    per_step = external_product(
        NoiseEstimate(0.0), key_sigma, n, k, level, log_basis, drop_bits
    )
    return NoiseEstimate(n_lwe * per_step.variance)


def key_switch(
    input_noise: NoiseEstimate,
    ks_sigma: float,
    n_in: int,
    level: int,
    log_basis: int,
    drop_bits: int,
) -> NoiseEstimate:
    """LWE->LWE key switch: ``n_in * level * B^2/12 * sigma^2`` + drop."""
    b2 = float(1 << (2 * log_basis))
    ks = n_in * level * (b2 / 12.0) * ks_sigma * ks_sigma
    eps = float(1 << drop_bits) if drop_bits > 0 else 0.0
    drop = n_in * (eps * eps / 12.0) * 0.5
    return NoiseEstimate(input_noise.variance + ks + drop)


def modulus_switch(input_noise: NoiseEstimate, n_lwe: int, log_2n: int) -> NoiseEstimate:
    """Rounding to Z_2N adds ~ (n_lwe+1)/48 * (2^32/2N)^2 of variance."""
    step = 2.0 ** (32 - log_2n)
    return NoiseEstimate(input_noise.variance + (n_lwe + 1) * step * step / 48.0)
