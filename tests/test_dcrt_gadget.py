"""DCRT gadget product tests (config-4 pipeline, RNS/62-bit path).

Model-based oracle: the gadget product ``glev(mu) * decompose(c)`` must
reconstruct ``mu * c`` modulo Q within the decomposition error, checked per
residue through exact Python CRT arithmetic.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from primus_fhe_tpu.decompose import BigUintApproxSignedBasis
from primus_fhe_tpu.golden import GoldenNtt, naive_negacyclic_mul
from primus_fhe_tpu.lattice.dcrt import add_dcrt_glev_mul_crt_poly, crt_glwe_mul_dcrt_ggsw
from primus_fhe_tpu.numeric import U64, from_u64_pair, to_u64_pair
from primus_fhe_tpu.rns import RNSBase64
from primus_fhe_tpu.transforms.dcrt import build_dcrt_plan64, dcrt_forward64, dcrt_inverse64

rng = random.Random(404)

LOG_N = 4
N = 1 << LOG_N
MODULI = [1125899906826241, 1125899906629633]  # 2x50-bit reference pair
LOG_BASIS = 20


@pytest.fixture(scope="module")
def setup():
    base = RNSBase64(MODULI)
    basis = BigUintApproxSignedBasis(base, LOG_BASIS)
    plan = build_dcrt_plan64(LOG_N, MODULI)
    return base, basis, plan


def _crt_poly(base, coeffs):
    """Host: list of ints mod Q -> U64 (n_mod, N) residues."""
    res = np.array(
        [[c % q for c in coeffs] for q in base.moduli_ints], dtype=np.uint64
    )
    return to_u64_pair(res)


def _from_crt(base, residues):
    """Device residues -> list of ints via python CRT."""
    r = from_u64_pair(residues)
    Q = base.q_product
    out = []
    for c in range(r.shape[1]):
        vals = [int(r[i, c]) for i in range(len(base.moduli_ints))]
        x = 0
        for v, q, p, ip in zip(
            vals, base.moduli_ints, base.punctured_ints, base.inv_punctured_ints
        ):
            x += (v * ip % q) * p
        out.append(x % Q)
    return out


def test_dcrt_ntt_roundtrip(setup):
    base, basis, plan = setup
    coeffs = [rng.randrange(base.q_product) for _ in range(N)]
    crt = _crt_poly(base, coeffs)
    back = dcrt_inverse64(plan, dcrt_forward64(plan, crt))
    assert _from_crt(base, back) == coeffs


def test_gadget_product_identity(setup):
    """glev = NTT(scalars) (trivial 'encryption' of mu=1): product must
    reconstruct c within the decomposition error bound."""
    base, basis, plan = setup
    Q = base.q_product
    level = basis.decompose_length
    n_mod = base.count

    # trivial GLev of mu=1 with k=0 (single component): row l encodes
    # scalar_l as a constant polynomial, in NTT domain.
    rows = []
    for l in range(level):
        poly = [basis.scalar_ints[l]] + [0] * (N - 1)
        rows.append(_crt_poly(base, poly))
    glev_coeff = U64(
        jnp.stack([r.lo[:, None, :] for r in rows]),
        jnp.stack([r.hi[:, None, :] for r in rows]),
    )  # (level, n_mod, 1, N)
    glev_ntt = U64(
        jnp.stack([dcrt_forward64(plan, U64(glev_coeff.lo[l], glev_coeff.hi[l])).lo for l in range(level)]),
        jnp.stack([dcrt_forward64(plan, U64(glev_coeff.lo[l], glev_coeff.hi[l])).hi for l in range(level)]),
    )

    coeffs = [rng.randrange(Q) for _ in range(N)]
    crt = _crt_poly(base, coeffs)

    acc = U64(
        jnp.zeros((n_mod, 1, N), dtype=jnp.uint32),
        jnp.zeros((n_mod, 1, N), dtype=jnp.uint32),
    )
    out = add_dcrt_glev_mul_crt_poly(acc, glev_ntt, crt, basis, plan, base)
    out_coeff = dcrt_inverse64(plan, out)
    got = _from_crt(base, U64(out_coeff.lo[:, 0, :], out_coeff.hi[:, 0, :]))

    bound = basis.approximate_error_bound * N  # conservative poly bound
    for g, c in zip(got, coeffs):
        d = (g - c) % Q
        dist = min(d, Q - d)
        assert dist <= bound, (g, c, dist)


def test_gadget_product_scalar_message(setup):
    """glev of mu=3: product reconstructs 3*c (mod Q) within error."""
    base, basis, plan = setup
    Q = base.q_product
    level = basis.decompose_length
    n_mod = base.count
    mu = 3

    rows = []
    for l in range(level):
        poly = [mu * basis.scalar_ints[l] % Q] + [0] * (N - 1)
        rows.append(_crt_poly(base, poly))
    glev_ntt_rows = [
        dcrt_forward64(plan, U64(r.lo[:, None, :], r.hi[:, None, :])) for r in rows
    ]
    glev_ntt = U64(
        jnp.stack([g.lo for g in glev_ntt_rows]),
        jnp.stack([g.hi for g in glev_ntt_rows]),
    )

    coeffs = [rng.randrange(Q) for _ in range(N)]
    crt = _crt_poly(base, coeffs)
    acc = U64(
        jnp.zeros((n_mod, 1, N), dtype=jnp.uint32),
        jnp.zeros((n_mod, 1, N), dtype=jnp.uint32),
    )
    out = add_dcrt_glev_mul_crt_poly(acc, glev_ntt, crt, basis, plan, base)
    out_coeff = dcrt_inverse64(plan, out)
    got = _from_crt(base, U64(out_coeff.lo[:, 0, :], out_coeff.hi[:, 0, :]))

    bound = basis.approximate_error_bound * N * mu
    for g, c in zip(got, coeffs):
        d = (g - mu * c) % Q
        dist = min(d, Q - d)
        assert dist <= bound, dist
