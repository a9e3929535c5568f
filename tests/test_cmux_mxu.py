"""Differential tests for the single-kernel MXU CMux (ops/cmux_mxu.py).

Oracle = the composed rotate/external-product path (itself tested against
the reference semantics in test_external_product.py / test_bootstrap.py):
the MXU step must be BIT-EXACT — the CRT-NTT backend is exact integer
arithmetic, so any deviation is a bug, not drift.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from primus_fhe_tpu.boot.blind_rotate import _rotate_glwe
from primus_fhe_tpu.decompose import ApproxSignedBasis32
from primus_fhe_tpu.lattice import tfhe
from primus_fhe_tpu.lattice.tfhe import external_product
from primus_fhe_tpu.ops.cmux_mxu import (
    _exact_precon32,
    get_plan,
    mxu_cmux_step_nat,
    prepare_mxu_bsk,
)

LOG_N = 8
N = 1 << LOG_N
K, LB, LV = 1, 8, 2
K1 = K + 1


@pytest.fixture(scope="module")
def setup():
    basis = ApproxSignedBasis32(None, LB, reverse_length=LV)
    conv = tfhe.make_convolver(LOG_N, LV, K, LB)
    assert not conv.use_pallas  # CPU
    return basis, conv


def test_exact_precon32(setup):
    _, conv = setup
    p = conv.primes[0]
    rng = np.random.default_rng(0)
    w = rng.integers(0, p, size=512, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(_exact_precon32(jnp.asarray(w), p))
    want = ((w.astype(object) << 32) // p).astype(np.uint64).astype(np.uint32)
    assert (got == want).all()


def test_mxu_cmux_step_matches_composed(setup):
    basis, conv = setup
    rng = np.random.default_rng(1)
    bsz = 4
    acc = jnp.asarray(
        rng.integers(0, 1 << 32, size=(bsz, K1, N), dtype=np.uint64).astype(np.uint32)
    )
    degrees = jnp.asarray(rng.integers(0, 2 * N, size=bsz, dtype=np.int64), jnp.int32)
    # arbitrary coefficient-domain "GGSW row" tensor — CMux linearity does
    # not require a well-formed ciphertext, and random data exercises the
    # full value range
    ggsw = jnp.asarray(
        rng.integers(0, 1 << 32, size=(1, K1, LV, K1, N), dtype=np.uint64).astype(
            np.uint32
        )
    )

    # oracle: composed rotate -> external product -> add (per batch row)
    key_ntt = conv.forward(ggsw[0])  # (kp, k1, L, k1, n)
    deg_b = degrees[:, None]  # broadcast over k+1
    rotated = _rotate_glwe(acc, deg_b, N)
    delta = external_product(conv, basis, rotated - acc, key_ntt)
    want = np.asarray(acc + delta)

    # MXU path
    kv, kpre = prepare_mxu_bsk(conv, ggsw)
    plan = get_plan(conv.log_n, tuple(conv.primes), conv.product)
    crt = plan.crt_consts(conv.product)
    acc_nat = acc.reshape(bsz, K1, plan.A, plan.B)
    out = mxu_cmux_step_nat(
        plan, basis, crt, acc_nat, degrees, kv[0], kpre[0], K1, LV
    )
    got = np.asarray(out.reshape(bsz, K1, N))
    assert (got == want).all(), (
        np.argwhere(got != want)[:5],
        got[got != want][:5],
        want[got != want][:5],
    )


@pytest.mark.slow
def test_mxu_cmux_degree_zero_and_extremes(setup):
    basis, conv = setup
    rng = np.random.default_rng(2)
    bsz = 4
    acc = jnp.asarray(
        rng.integers(0, 1 << 32, size=(bsz, K1, N), dtype=np.uint64).astype(np.uint32)
    )
    # degree 0 (CMux is identity), 1, N (pure negation), 2N-1
    degrees = jnp.asarray([0, 1, N, 2 * N - 1], jnp.int32)
    ggsw = jnp.asarray(
        rng.integers(0, 1 << 32, size=(1, K1, LV, K1, N), dtype=np.uint64).astype(
            np.uint32
        )
    )
    key_ntt = conv.forward(ggsw[0])
    rotated = _rotate_glwe(acc, degrees[:, None], N)
    delta = external_product(conv, basis, rotated - acc, key_ntt)
    want = np.asarray(acc + delta)
    assert (np.asarray(acc)[0] == np.asarray(rotated)[0]).all()  # d=0

    kv, kpre = prepare_mxu_bsk(conv, ggsw)
    plan = get_plan(conv.log_n, tuple(conv.primes), conv.product)
    crt = plan.crt_consts(conv.product)
    out = mxu_cmux_step_nat(
        plan, basis, crt, acc.reshape(bsz, K1, plan.A, plan.B), degrees,
        kv[0], kpre[0], K1, LV,
    )
    assert (np.asarray(out.reshape(bsz, K1, N)) == want).all()


@pytest.mark.slow
def test_full_bootstrap_mxu_key(setup):
    """End-to-end: blind rotation with the MXU key pack must decrypt to
    the correct sign, and match the composed-path output bit-exactly."""
    import importlib

    br = importlib.import_module("primus_fhe_tpu.boot.blind_rotate")
    from primus_fhe_tpu.distr.sampling import DiscreteGaussian
    from primus_fhe_tpu.lattice.lwe import phase_torus32

    basis, conv = setup
    gauss = DiscreteGaussian(3.2)
    n_lwe, batch = 8, 4
    key = jax.random.PRNGKey(3)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lwe_s = (jax.random.bits(k1, (n_lwe,), dtype=jnp.uint32) & 1).astype(jnp.uint32)
    glwe_s = (jax.random.bits(k2, (K, N), dtype=jnp.uint32) & 1).astype(jnp.uint32)

    bsk_ref = br.make_bootstrap_key(k3, lwe_s, glwe_s, basis, gauss, conv)
    bsk_mxu = br.make_bootstrap_key_mxu(k3, lwe_s, glwe_s, basis, gauss, conv)

    test_poly = jnp.full(N, 1 << 28, dtype=jnp.uint32)
    mus = jnp.asarray(
        np.where(np.arange(batch) % 2 == 0, 1 << 29, (1 << 32) - (1 << 29)).astype(
            np.uint32
        )
    )
    a = jax.random.bits(k4, (batch, n_lwe), dtype=jnp.uint32)
    b = jnp.sum(a * lwe_s[None], axis=1, dtype=jnp.uint32) + mus
    ct = jnp.concatenate([a, b[:, None]], axis=1)

    out_ref = br.bootstrap(conv, basis, bsk_ref, ct, test_poly, LOG_N)
    out_mxu = br.bootstrap(conv, basis, bsk_mxu, ct, test_poly, LOG_N)
    assert (np.asarray(out_mxu) == np.asarray(out_ref)).all()

    ph = np.asarray(phase_torus32(out_mxu, glwe_s.reshape(-1))).astype(np.int64)
    ph = np.where(ph >= 1 << 31, ph - (1 << 32), ph)
    assert ((ph > 0) == (np.arange(batch) % 2 == 0)).all()


@pytest.mark.slow
@pytest.mark.parametrize("k,lb,lv", [(2, 8, 2), (1, 6, 3), (1, 7, 4)])
def test_mxu_cmux_other_shapes(k, lb, lv):
    """GLWE rank k=2 and other gadget bases/levels: same bit-exactness."""
    k1 = k + 1
    basis = ApproxSignedBasis32(None, lb, reverse_length=lv)
    conv = tfhe.make_convolver(LOG_N, lv, k, lb)
    rng = np.random.default_rng(10 * k + lv)
    bsz = 2
    acc = jnp.asarray(
        rng.integers(0, 1 << 32, size=(bsz, k1, N), dtype=np.uint64).astype(np.uint32)
    )
    degrees = jnp.asarray(rng.integers(0, 2 * N, size=bsz, dtype=np.int64), jnp.int32)
    ggsw = jnp.asarray(
        rng.integers(0, 1 << 32, size=(1, k1, lv, k1, N), dtype=np.uint64).astype(
            np.uint32
        )
    )
    key_ntt = conv.forward(ggsw[0])
    rotated = _rotate_glwe(acc, degrees[:, None], N)
    delta = external_product(conv, basis, rotated - acc, key_ntt)
    want = np.asarray(acc + delta)

    kv, kpre = prepare_mxu_bsk(conv, ggsw)
    plan = get_plan(conv.log_n, tuple(conv.primes), conv.product)
    crt = plan.crt_consts(conv.product)
    out = mxu_cmux_step_nat(
        plan, basis, crt, acc.reshape(bsz, k1, plan.A, plan.B), degrees,
        kv[0], kpre[0], k1, lv,
    )
    assert (np.asarray(out.reshape(bsz, k1, N)) == want).all()
