"""Noise-tracked ciphertexts: bookkeeping + statistical validation.

The tracker's predictions are validated against *measured* noise: many
fresh encryptions are pushed through a gate and the empirical phase error
is compared to the predicted standard deviation (within a generous but
meaningful band — the formulas use independence heuristics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primus_fhe_tpu import noise, tracked
from primus_fhe_tpu.params import TOY, make_context


@pytest.fixture(scope="module")
def ctx():
    return make_context(jax.random.PRNGKey(33), TOY)


def test_linear_ops_propagate_variance(ctx):
    key = jax.random.PRNGKey(0)
    a = tracked.encrypt_bit(ctx, jax.random.fold_in(key, 0), 1)
    b = tracked.encrypt_bit(ctx, jax.random.fold_in(key, 1), 0)
    s = tracked.add(a, b)
    assert s.noise.variance == pytest.approx(2 * TOY.lwe_sigma**2)
    d = tracked.sub(s, b)
    assert d.noise.variance == pytest.approx(3 * TOY.lwe_sigma**2)
    m = tracked.scalar_mul(a, 3)
    assert m.noise.variance == pytest.approx(9 * TOY.lwe_sigma**2)
    assert tracked.neg(a).noise.variance == a.noise.variance
    assert tracked.trivial(ctx, 123).noise.variance == 0.0


def test_gate_margin_guardrail(ctx):
    key = jax.random.PRNGKey(1)
    a = tracked.encrypt_bit(ctx, jax.random.fold_in(key, 0), 1)
    # Inflate the tracked variance past any safe margin: the gate must
    # refuse rather than silently risk a wrong output.
    bad = tracked.TrackedLwe(a.ct, noise.NoiseEstimate(2.0**58))
    with pytest.raises(ValueError, match="unsafe"):
        tracked.gate(ctx, "nand", bad, bad)


def test_gate_correct_and_noise_calibrated(ctx):
    """NAND truth + measured output noise within [0.2, 5]x of predicted."""
    key = jax.random.PRNGKey(2)
    outs = []
    expect_mu = []
    cases = [(0, 0, 1), (0, 1, 1), (1, 0, 1), (1, 1, 0)]
    reps = 6
    out_noise = None
    for r in range(reps):
        for i, (b1, b2, want) in enumerate(cases):
            k = jax.random.fold_in(key, 16 * r + i)
            c1 = tracked.encrypt_bit(ctx, jax.random.fold_in(k, 0), b1)
            c2 = tracked.encrypt_bit(ctx, jax.random.fold_in(k, 1), b2)
            out = tracked.gate(ctx, "nand", c1, c2)
            out_noise = out.noise
            ph = int(tracked.decrypt_phase(ctx, out))
            assert (ph > 0) == bool(want), (b1, b2, ph)
            outs.append(ph)
            expect_mu.append((1 << 29) if want else -(1 << 29))
    err = np.asarray(outs, dtype=np.float64) - np.asarray(expect_mu, dtype=np.float64)
    measured_std = float(np.std(err))
    predicted_std = out_noise.stddev
    assert 0.2 * predicted_std < measured_std < 5.0 * predicted_std, (
        measured_std,
        predicted_std,
    )


def test_margin_reporting(ctx):
    key = jax.random.PRNGKey(3)
    a = tracked.encrypt_bit(ctx, key, 1)
    out = tracked.bootstrap(ctx, a)
    assert out.margin(message_bits=2) > 1.0
    # pre-rotation noise is dominated by modulus-switch rounding on TOY
    pre = tracked.pre_rotation_noise(ctx, a.noise)
    assert pre.variance > a.noise.variance
