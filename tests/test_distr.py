"""Sampler distribution tests (reference pattern: primus_distr stats)."""

import jax
import jax.numpy as jnp
import numpy as np

from primus_fhe_tpu.distr import DiscreteGaussian, sample_binary, sample_ternary, sample_uniform
from primus_fhe_tpu.distr.sampling import sample_crt_gaussian, sample_crt_ternary
from primus_fhe_tpu.distr.stats import max_cdf_distance, sample_moments

KEY = jax.random.PRNGKey(123)


def test_binary():
    s = np.asarray(sample_binary(KEY, (20000,)))
    assert set(np.unique(s)) <= {0, 1}
    assert abs(s.mean() - 0.5) < 0.02


def test_ternary():
    q = 536813569
    s = np.asarray(sample_ternary(KEY, (20000,), q))
    vals, counts = np.unique(s, return_counts=True)
    assert set(vals) <= {0, 1, q - 1}
    freq = dict(zip(vals.tolist(), (counts / len(s)).tolist()))
    assert abs(freq.get(0, 0) - 0.5) < 0.02
    assert abs(freq.get(1, 0) - 0.25) < 0.02
    assert abs(freq.get(q - 1, 0) - 0.25) < 0.02


def test_uniform():
    q = 536813569
    s = np.asarray(sample_uniform(KEY, (20000,), q)).astype(np.float64)
    assert s.max() < q
    assert abs(s.mean() / q - 0.5) < 0.02


def test_gaussian_moments():
    g = DiscreteGaussian(3.2)
    s = np.asarray(g.sample_signed(KEY, (40000,)))
    mean, var = sample_moments(s)
    assert abs(mean) < 0.1
    assert abs(var - 3.2**2) < 0.5
    assert max_cdf_distance(s, 3.2, 20) < 0.02


def test_gaussian_mod_wrap():
    q = 536813569
    g = DiscreteGaussian(3.2)
    s = np.asarray(g.sample_mod(KEY, (1000,), q)).astype(np.int64)
    centered = np.where(s > q // 2, s - q, s)
    assert np.abs(centered).max() < 40


def test_gaussian_scalar_shape():
    g = DiscreteGaussian(3.2)
    s = g.sample_signed(KEY, ())
    assert s.shape == ()
    t = g.sample_torus32(KEY, ())
    assert t.shape == ()


def test_crt_replicated():
    moduli = jnp.asarray([536813569, 536608769], dtype=jnp.uint32)
    g = DiscreteGaussian(3.2)
    s = np.asarray(sample_crt_gaussian(KEY, (500,), moduli, g)).astype(np.int64)
    # same logical value in every slot: centered residues must agree
    c0 = np.where(s[0] > 536813569 // 2, s[0] - 536813569, s[0])
    c1 = np.where(s[1] > 536608769 // 2, s[1] - 536608769, s[1])
    assert (c0 == c1).all()
    t = np.asarray(sample_crt_ternary(KEY, (500,), moduli)).astype(np.int64)
    t0 = np.where(t[0] > 536813569 // 2, t[0] - 536813569, t[0])
    t1 = np.where(t[1] > 536608769 // 2, t[1] - 536608769, t[1])
    assert (t0 == t1).all()


# ---------------------------------------------------------------------------
# Large-sigma host samplers: Ziggurat + high-precision CDT + sigma dispatch
# (reference: discrete_gaussian/{ziggurat.rs:18, unix_cdt.rs:12, mod.rs:25-87})
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

from primus_fhe_tpu.distr import (  # noqa: E402
    DiscreteZiggurat,
    HighPrecisionCDT,
    make_discrete_gaussian,
)

N_STAT = 120000


@pytest.mark.parametrize("sigma", [3.2, 20.0, 100.0])
def test_ziggurat_ks(sigma):
    z = DiscreteZiggurat(sigma)
    s = z.sample_signed(np.random.default_rng(11), (N_STAT,))
    mean, var = sample_moments(s)
    assert abs(mean) < 5 * sigma / np.sqrt(N_STAT)
    assert abs(var - sigma**2) / sigma**2 < 0.03
    assert max_cdf_distance(s, sigma, int(6 * sigma)) < 0.008


@pytest.mark.parametrize("sigma", [3.2, 20.0])
def test_high_precision_cdt_ks(sigma):
    h = HighPrecisionCDT(sigma)
    s = h.sample_signed(np.random.default_rng(13), (N_STAT,))
    mean, var = sample_moments(s)
    assert abs(var - sigma**2) / sigma**2 < 0.03
    assert max_cdf_distance(s, sigma, int(6 * sigma)) < 0.008


@pytest.mark.slow
def test_cross_validation_cdt_ziggurat_hp():
    """Device CDT, host Ziggurat, and high-precision CDT draw from the
    same distribution at sigma=20 (three-way empirical CDF agreement)."""
    sigma = 20.0
    dev = np.asarray(DiscreteGaussian(sigma).sample_signed(KEY, (N_STAT,)))
    zig = DiscreteZiggurat(sigma).sample_signed(np.random.default_rng(17), (N_STAT,))
    hp = HighPrecisionCDT(sigma).sample_signed(np.random.default_rng(19), (N_STAT,))
    grid = np.arange(-120, 121)
    cdfs = [
        np.array([(np.asarray(s) <= x).mean() for x in grid])
        for s in (dev, zig, hp)
    ]
    for a in range(3):
        for b_ in range(a + 1, 3):
            assert np.abs(cdfs[a] - cdfs[b_]).max() < 0.01


def test_sigma_dispatch():
    assert isinstance(make_discrete_gaussian(3.2), DiscreteGaussian)
    assert isinstance(make_discrete_gaussian(20.0), DiscreteGaussian)
    assert isinstance(make_discrete_gaussian(20.5), DiscreteZiggurat)
    with pytest.raises(ValueError):
        make_discrete_gaussian(0.69)


def test_ziggurat_accepts_jax_key_and_wraps_mod():
    z = DiscreteZiggurat(30.0)
    s = z.sample_signed(KEY, (4000,))  # jax key accepted
    assert abs(float(np.var(s)) - 900.0) / 900.0 < 0.15
    q = (1 << 50) - 27
    w = z.sample_mod(np.random.default_rng(3), (4000,), q)
    w = np.array([int(v) for v in w.ravel()], dtype=object)
    assert ((0 <= w) & (w < q)).all()
    centered = np.where(w > q // 2, w - q, w)
    assert max(abs(int(c)) for c in centered) < 30 * 13
