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

pytestmark = pytest.mark.slow

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


def test_dcrt_encrypted_external_product(setup):
    """Config-4 with real encryption: DcrtGgsw(mu) x encrypted CrtGlwe."""
    import jax

    from primus_fhe_tpu.distr.sampling import DiscreteGaussian
    from primus_fhe_tpu.lattice.dcrt import (
        dcrt_ggsw_encrypt,
        dcrt_glwe_phase,
        dcrt_glwe_zero_sample,
    )
    from primus_fhe_tpu.modular.modops import add64
    from primus_fhe_tpu.transforms.dcrt import dcrt_forward64

    base, basis, plan = setup
    Q = base.q_product
    n_mod = base.count
    K = 1
    gauss = DiscreteGaussian(3.2)
    key = jax.random.PRNGKey(1)
    ks, kg, ke = jax.random.split(key, 3)

    # binary secret, same poly under every modulus, NTT domain
    bits = np.asarray(
        jax.random.bits(ks, (K, N), dtype=jnp.uint32) & 1, dtype=np.uint64
    )
    secret_coeff = to_u64_pair(np.broadcast_to(bits[None], (n_mod, K, N)).copy())
    secret_ntt = dcrt_forward64(plan, secret_coeff)

    # encrypt a message poly with delta = Q // 2^12 scaling
    delta = Q >> 12
    msg = [rng.randrange(8) for _ in range(N)]
    ct = dcrt_glwe_zero_sample(ke, secret_ntt, gauss, plan, base)
    enc_msg = _crt_poly(base, [m * delta % Q for m in msg])
    msg_ntt = dcrt_forward64(plan, U64(enc_msg.lo[:, None], enc_msg.hi[:, None]))
    from primus_fhe_tpu.lattice.dcrt import _m_bc

    ct = U64(
        ct.lo.at[:, K].set(add64(U64(ct.lo[:, K], ct.hi[:, K]), U64(msg_ntt.lo[:, 0], msg_ntt.hi[:, 0]), _m_bc(base, 1).value).lo),
        ct.hi.at[:, K].set(add64(U64(ct.lo[:, K], ct.hi[:, K]), U64(msg_ntt.lo[:, 0], msg_ntt.hi[:, 0]), _m_bc(base, 1).value).hi),
    )

    # encrypt/decrypt sanity
    ph = dcrt_glwe_phase(ct, secret_ntt, plan, base)
    vals = _from_crt(base, ph)
    for v, m in zip(vals, msg):
        d = (v - m * delta) % Q
        assert min(d, Q - d) < 1 << 12

    # GGSW(2) x ct  ->  phase ~ 2 * msg * delta
    ggsw = dcrt_ggsw_encrypt(kg, 2, secret_ntt, basis, gauss, plan, base)
    ct_coeff = dcrt_inverse64(plan, ct)
    out = crt_glwe_mul_dcrt_ggsw(ct_coeff, ggsw, basis, plan, base)
    ph2 = dcrt_glwe_phase(out, secret_ntt, plan, base)
    vals2 = _from_crt(base, ph2)
    bound = delta >> 2
    for v, m in zip(vals2, msg):
        d = (v - 2 * m * delta) % Q
        assert min(d, Q - d) < bound, (v, m)


def test_dcrt_pointwise_and_butterfly(setup):
    """dcrt_glwe_mul_poly and the CMux-shaped butterfly (dcrt.rs:108-150)."""
    from primus_fhe_tpu.lattice.dcrt import dcrt_glwe_butterfly_mul, dcrt_glwe_mul_poly

    base, basis, plan = setup
    Q = base.q_product
    n_mod = base.count
    nprng = np.random.default_rng(3)
    a = to_u64_pair(nprng.integers(0, base.moduli_ints[1], (n_mod, 1, N), dtype=np.uint64))
    rhs = to_u64_pair(nprng.integers(0, base.moduli_ints[1], (n_mod, 1, N), dtype=np.uint64))
    poly = to_u64_pair(nprng.integers(0, base.moduli_ints[1], (n_mod, N), dtype=np.uint64))

    prod = dcrt_glwe_mul_poly(a, poly, base)
    for mi, q in enumerate(base.moduli_ints):
        expect = (
            from_u64_pair(U64(a.lo[mi, 0], a.hi[mi, 0])).astype(object)
            * from_u64_pair(U64(poly.lo[mi], poly.hi[mi])).astype(object)
        ) % q
        got = from_u64_pair(U64(prod.lo[mi, 0], prod.hi[mi, 0])).astype(object)
        assert (got == expect).all()

    s, d = dcrt_glwe_butterfly_mul(a, rhs, poly, base)
    for mi, q in enumerate(base.moduli_ints):
        av = from_u64_pair(U64(a.lo[mi, 0], a.hi[mi, 0])).astype(object)
        rv = from_u64_pair(U64(rhs.lo[mi, 0], rhs.hi[mi, 0])).astype(object)
        pv = from_u64_pair(U64(poly.lo[mi], poly.hi[mi])).astype(object)
        assert (from_u64_pair(U64(s.lo[mi, 0], s.hi[mi, 0])).astype(object) == (av + rv) % q).all()
        assert (from_u64_pair(U64(d.lo[mi, 0], d.hi[mi, 0])).astype(object) == ((av - rv) % q) * pv % q).all()
