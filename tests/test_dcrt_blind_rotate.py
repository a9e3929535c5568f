"""RNS-path blind rotation: trivial (noise-free) keys, exact rotation check.

With trivial GGSW(s_i) keys, the accumulator after blind rotation must be
exactly ``v * X^{-b + sum a_i s_i}`` in the RNS ring — checked coefficient
by coefficient through CRT recomposition.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from primus_fhe_tpu.boot.dcrt_blind_rotate import dcrt_blind_rotate
from primus_fhe_tpu.decompose import BigUintApproxSignedBasis
from primus_fhe_tpu.numeric import U64, from_u64_pair, to_u64_pair
from primus_fhe_tpu.rns import RNSBase64
from primus_fhe_tpu.transforms.dcrt import (
    build_dcrt_plan64,
    dcrt_forward64,
    dcrt_inverse64,
)

pytestmark = pytest.mark.slow

rng = random.Random(77)

LOG_N = 4
N = 1 << LOG_N
MODULI = [1125899906826241, 1125899906629633]
N_LWE = 4
K1 = 2  # k + 1 with k = 1


@pytest.fixture(scope="module")
def setup():
    base = RNSBase64(MODULI)
    basis = BigUintApproxSignedBasis(base, 20)
    plan = build_dcrt_plan64(LOG_N, MODULI)
    return base, basis, plan


def _crt(base, coeffs):
    res = np.array([[c % q for c in coeffs] for q in base.moduli_ints], dtype=np.uint64)
    return to_u64_pair(res)


def _uncrt(base, residues):
    r = from_u64_pair(residues)
    Q = base.q_product
    out = []
    for c in range(r.shape[-1]):
        x = 0
        for v, q, p, ip in zip(
            [int(r[i, c]) for i in range(len(base.moduli_ints))],
            base.moduli_ints, base.punctured_ints, base.inv_punctured_ints,
        ):
            x += (v * ip % q) * p
        out.append(x % Q)
    return out


def _trivial_ggsw(base, basis, plan, bit):
    """Noise-free DcrtGgsw(bit): row r level l = bit * scalar_l at comp r."""
    level = basis.decompose_length
    rows_lo, rows_hi = [], []
    for r in range(K1):
        lev_lo, lev_hi = [], []
        for l in range(level):
            glwe = np.zeros((len(MODULI), K1, N), dtype=np.uint64)
            if bit:
                for mi, q in enumerate(base.moduli_ints):
                    glwe[mi, r, 0] = basis.scalar_ints[l] % q
            u = to_u64_pair(glwe)
            f = dcrt_forward64(plan, u)
            lev_lo.append(f.lo)
            lev_hi.append(f.hi)
        rows_lo.append(np.stack(lev_lo))
        rows_hi.append(np.stack(lev_hi))
    return U64(jnp.asarray(np.stack(rows_lo)), jnp.asarray(np.stack(rows_hi)))


def test_dcrt_blind_rotate_exact(setup):
    base, basis, plan = setup
    Q = base.q_product
    secret = [rng.randrange(2) for _ in range(N_LWE)]
    a = [rng.randrange(2 * N) for _ in range(N_LWE)]
    b = rng.randrange(2 * N)

    bsk_rows = [_trivial_ggsw(base, basis, plan, s) for s in secret]
    bsk = U64(
        jnp.stack([g.lo for g in bsk_rows]), jnp.stack([g.hi for g in bsk_rows])
    )  # (n_lwe, k1, L, n_mod, k1, N)

    # test vector v on the body component, mask = 0
    v = [rng.randrange(Q) for _ in range(N)]
    acc0_coeff = np.zeros((len(MODULI), K1, N), dtype=np.uint64)
    for mi, q in enumerate(base.moduli_ints):
        acc0_coeff[mi, 1] = [c % q for c in v]
    acc0 = dcrt_forward64(plan, to_u64_pair(acc0_coeff))

    lwe = jnp.asarray(np.array(a + [b], dtype=np.int32))
    out = dcrt_blind_rotate(plan, basis, base, bsk, lwe, acc0)
    out_coeff = dcrt_inverse64(plan, out)

    # expected: v * X^{-b + sum a_i s_i} mod (X^N + 1), exact (trivial keys
    # mean the only deviation is the gadget drop error, which is 0 here
    # because decompose_length covers all bits when drop_bits = 0).
    rot = (-b + sum(ai * si for ai, si in zip(a, secret))) % (2 * N)
    expect = [0] * N
    for j, c in enumerate(v):
        k = (j + rot) % (2 * N)
        if k < N:
            expect[k] = (expect[k] + c) % Q
        else:
            expect[k - N] = (expect[k - N] - c) % Q

    got_body = _uncrt(base, U64(out_coeff.lo[:, 1, :], out_coeff.hi[:, 1, :]))
    bound = basis.approximate_error_bound * N * (N_LWE + 1) * 4
    for g, e in zip(got_body, expect):
        d = (g - e) % Q
        assert min(d, Q - d) <= bound, (g, e)
    # mask component stays ~0
    got_mask = _uncrt(base, U64(out_coeff.lo[:, 0, :], out_coeff.hi[:, 0, :]))
    for g in got_mask:
        d = g % Q
        assert min(d, Q - d) <= bound


def test_dcrt_blind_rotate_encrypted_keys(setup):
    """Config-5 on the RNS path with a *noisy, encrypted* bootstrap key."""
    import jax

    from primus_fhe_tpu.distr.sampling import DiscreteGaussian
    from primus_fhe_tpu.lattice.dcrt import dcrt_ggsw_encrypt, dcrt_glwe_phase

    base, basis, plan = setup
    Q = base.q_product
    n_mod = base.count
    gauss = DiscreteGaussian(3.2)
    key = jax.random.PRNGKey(55)
    ks, kg = jax.random.split(key)

    # GLWE secret (binary, same poly mod every modulus), NTT domain
    bits = np.asarray(jax.random.bits(ks, (1, N), dtype=jnp.uint32) & 1, dtype=np.uint64)
    secret_ntt = dcrt_forward64(
        plan, to_u64_pair(np.broadcast_to(bits[None], (n_mod, 1, N)).copy())
    )

    lwe_secret = [1, 0, 1, 1]
    bsk_rows = []
    for i, s in enumerate(lwe_secret):
        bsk_rows.append(
            dcrt_ggsw_encrypt(
                jax.random.fold_in(kg, i), s, secret_ntt, basis, gauss, plan, base
            )
        )
    bsk = U64(
        jnp.stack([g.lo for g in bsk_rows]), jnp.stack([g.hi for g in bsk_rows])
    )

    a = [3, 7, 12, 30]
    b = 5
    delta = Q >> 8
    v = [(j + 1) * delta % Q for j in range(N)]
    acc0_coeff = np.zeros((n_mod, K1, N), dtype=np.uint64)
    for mi, q in enumerate(base.moduli_ints):
        acc0_coeff[mi, 1] = [c % q for c in v]
    acc0 = dcrt_forward64(plan, to_u64_pair(acc0_coeff))

    lwe = jnp.asarray(np.array(a + [b], dtype=np.int32))
    out = dcrt_blind_rotate(plan, basis, base, bsk, lwe, acc0)
    ph = dcrt_glwe_phase(out, secret_ntt, plan, base)
    got = _uncrt(base, ph)

    rot = (-b + sum(ai * si for ai, si in zip(a, lwe_secret))) % (2 * N)
    expect = [0] * N
    for j, c in enumerate(v):
        k = (j + rot) % (2 * N)
        if k < N:
            expect[k] = (expect[k] + c) % Q
        else:
            expect[k - N] = (expect[k - N] - c) % Q
    # noisy keys: phase must land within a small fraction of delta
    for g, e in zip(got, expect):
        d = (g - e) % Q
        assert min(d, Q - d) < delta // 4, (g, e)


def test_dcrt_blind_rotate_batched_matches_single(setup):
    """The natively-batched rotation (batch inside the residue-major
    layout, one fused NTT per modulus per step) must agree bit-exactly
    with per-ciphertext rotations."""
    from primus_fhe_tpu.boot.dcrt_blind_rotate import dcrt_blind_rotate_batched

    base, basis, plan = setup
    B = 3
    secret = [rng.randrange(2) for _ in range(N_LWE)]
    bsk_rows = [_trivial_ggsw(base, basis, plan, s) for s in secret]
    bsk = U64(
        jnp.stack([g.lo for g in bsk_rows]), jnp.stack([g.hi for g in bsk_rows])
    )

    lwes = np.array(
        [[rng.randrange(2 * N) for _ in range(N_LWE + 1)] for _ in range(B)],
        dtype=np.int32,
    )
    accs = np.array(
        [
            [
                [[rng.randrange(q) for _ in range(N)] for _ in range(K1)]
                for q in base.moduli_ints
            ]
            for _ in range(B)
        ],
        dtype=np.uint64,
    )
    acc0 = to_u64_pair(accs)  # (B, n_mod, k1, N), already "NTT domain" data

    batched = dcrt_blind_rotate_batched(
        plan, basis, base, bsk, jnp.asarray(lwes), acc0
    )
    for i in range(B):
        single = dcrt_blind_rotate(
            plan,
            basis,
            base,
            bsk,
            jnp.asarray(lwes[i]),
            U64(acc0.lo[i], acc0.hi[i]),
        )
        got = from_u64_pair(U64(batched.lo[i], batched.hi[i]))
        want = from_u64_pair(single)
        assert (got == want).all(), i
