"""Tests: FFT float backend, key switching, GLev/GGSW prime-q grid, NTRU,
serialization, LWE extraction, poly ops."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from primus_fhe_tpu.decompose import ApproxSignedBasis32
from primus_fhe_tpu.distr.sampling import DiscreteGaussian
from primus_fhe_tpu.golden import GoldenNtt, naive_negacyclic_mul
from primus_fhe_tpu.lattice import glev as glev_mod
from primus_fhe_tpu.lattice import keyswitch, ntru, rlwe
from primus_fhe_tpu.lattice.lwe import phase32, phase_torus32
from primus_fhe_tpu.modular import barrett32, shoup32
from primus_fhe_tpu.transforms import build_plan32, forward32
from primus_fhe_tpu.transforms.fft import Complex128FftTable
from primus_fhe_tpu.utils.serialize import (
    u32_from_bytes,
    u32_to_bytes,
    u64_from_bytes,
    u64_to_bytes,
)

rng = random.Random(31415)
Q = 536813569
LOG_N = 5
N = 1 << LOG_N


def _centered(x, modulus=1 << 32):
    x = np.asarray(x).astype(np.int64)
    return np.where(x >= modulus // 2, x - modulus, x)


# ---------------------------------------------------------------------------
# float FFT backend vs naive negacyclic (negacyclic.rs pattern)
# ---------------------------------------------------------------------------


def test_fft_negacyclic_vs_naive():
    t = Complex128FftTable(LOG_N)
    a = np.array([rng.getrandbits(16) for _ in range(N)], dtype=np.uint32)
    b = np.array([rng.getrandbits(12) for _ in range(N)], dtype=np.uint32)
    got = t.negacyclic_mul(a, b)
    # exact (small values, no rounding loss)
    M = 1 << 32

    def signed(x):
        return int(x) - M if x >= M // 2 else int(x)

    expect = np.zeros(N, dtype=np.int64)
    for i in range(N):
        for j in range(N):
            k = i + j
            v = signed(a[i]) * signed(b[j])
            if k < N:
                expect[k] += v
            else:
                expect[k - N] -= v
    assert (got.astype(np.int64) == expect % M).all()


def test_fft_roundtrip():
    t = Complex128FftTable(6)
    a = np.array([rng.getrandbits(32) for _ in range(64)], dtype=np.uint32)
    back = t.inverse_torus(t.forward_torus(a))
    assert (back == a).all()


def test_fft_matches_exact_convolver():
    from primus_fhe_tpu.transforms.torus import TorusConvolver32

    conv = TorusConvolver32(5, bound_bits=45)
    t = Complex128FftTable(5)
    a = np.array([rng.getrandbits(12) for _ in range(N)], dtype=np.uint32)
    b = np.array([rng.getrandbits(12) for _ in range(N)], dtype=np.uint32)
    exact = np.asarray(conv.negacyclic_mul(jnp.asarray(a), jnp.asarray(b)))
    floaty = t.negacyclic_mul(a, b)
    assert (exact == floaty).all()  # small values: float path is exact too


# ---------------------------------------------------------------------------
# key switching
# ---------------------------------------------------------------------------


def test_key_switch_torus():
    n_in, n_out = 16, 12
    basis = ApproxSignedBasis32(None, 8, reverse_length=3)
    gauss = DiscreteGaussian(3.2)
    key = jax.random.PRNGKey(9)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s_in = (jax.random.bits(k1, (n_in,), dtype=jnp.uint32) & 1).astype(jnp.uint32)
    s_out = (jax.random.bits(k2, (n_out,), dtype=jnp.uint32) & 1).astype(jnp.uint32)
    ksk = keyswitch.make_keyswitch_key(k3, s_in, s_out, basis, gauss)
    assert ksk.shape == (n_in, 3, n_out + 1)

    mu = jnp.uint32(1 << 28)
    a = jax.random.bits(k4, (n_in,), dtype=jnp.uint32)
    b = jnp.sum(a * s_in, dtype=jnp.uint32) + mu
    ct = jnp.concatenate([a, b[None]])
    out = keyswitch.key_switch(ct, ksk, basis)
    assert out.shape == (n_out + 1,)
    ph = _centered(phase_torus32(out, s_out) - mu)
    # error: n_in*(drop error * 1 + level * noise) — well below 2^24
    assert abs(int(ph)) < 1 << 24, ph


# ---------------------------------------------------------------------------
# GLev / GGSW over prime q
# ---------------------------------------------------------------------------


def test_glev_encrypt_phase():
    plan = build_plan32(LOG_N, Q)
    m = barrett32(Q)
    basis = ApproxSignedBasis32(Q, 6, reverse_length=3)
    gauss = DiscreteGaussian(3.2)
    key = jax.random.PRNGKey(21)
    k1, k2 = jax.random.split(key)
    secret = (jax.random.bits(k1, (2, N), dtype=jnp.uint32) & 1).astype(jnp.uint32)
    secret_ntt = forward32(plan, secret)
    msg = jnp.asarray(
        np.array([rng.randrange(64) for _ in range(N)], dtype=np.uint32)
    )
    glev = glev_mod.glev_encrypt32(k2, msg, secret_ntt, basis, gauss, plan, m, Q)
    assert glev.shape == (3, 3, N)
    for l in range(3):
        ph = np.asarray(glev_mod.glwe_phase32(glev[l], secret_ntt, plan, m))
        expect = np.asarray(msg).astype(object) * (basis.scalars[l] % Q) % Q
        err = (ph.astype(object) - expect) % Q
        err = np.array([min(int(e), Q - int(e)) for e in err])
        assert err.max() < 40, (l, err.max())


def test_ggsw_encrypt_shape_and_body_row():
    plan = build_plan32(4, Q)
    n = 16
    m = barrett32(Q)
    basis = ApproxSignedBasis32(Q, 6, reverse_length=2)
    gauss = DiscreteGaussian(3.2)
    key = jax.random.PRNGKey(22)
    k1, k2 = jax.random.split(key)
    secret = (jax.random.bits(k1, (1, n), dtype=jnp.uint32) & 1).astype(jnp.uint32)
    secret_ntt = forward32(plan, secret)
    msg = jnp.zeros(n, dtype=jnp.uint32).at[0].set(1)
    ggsw = glev_mod.rgsw_encrypt32(k2, msg, secret_ntt, basis, gauss, plan, m, Q)
    assert ggsw.shape == (2, 2, 2, n)
    # body row (r = k) phases like a GLev
    for l in range(2):
        ph = np.asarray(glev_mod.glwe_phase32(ggsw[1, l], secret_ntt, plan, m))
        expect = np.zeros(n, dtype=np.int64)
        expect[0] = basis.scalars[l] % Q
        err = (ph.astype(np.int64) - expect) % Q
        err = np.minimum(err, Q - err)
        assert err.max() < 40


# ---------------------------------------------------------------------------
# NTRU polynomial mechanics
# ---------------------------------------------------------------------------


def test_ntru_ops():
    plan = build_plan32(LOG_N, Q)
    m = barrett32(Q)
    h = jnp.asarray(np.array([rng.randrange(Q) for _ in range(N)], dtype=np.uint32))
    f = jnp.asarray(np.array([rng.randrange(Q) for _ in range(N)], dtype=np.uint32))
    # roundtrip
    assert (np.asarray(ntru.from_ntt(ntru.to_ntt(h, plan), plan)) == np.asarray(h)).all()
    # phase = h * f via NTT equals naive negacyclic product
    f_ntt = forward32(plan, f)
    prod = np.asarray(ntru.ntru_phase(h, f_ntt, plan, m))
    expect = naive_negacyclic_mul(
        [int(x) for x in np.asarray(h)], [int(x) for x in np.asarray(f)], Q
    )
    assert prod.astype(object).tolist() == expect
    # scalar and factor multiply agree
    w = 12345
    sf = shoup32(w, Q)
    a1 = np.asarray(ntru.mul_scalar(h, w, m))
    a2 = np.asarray(ntru.mul_factor(h, sf, jnp.uint32(Q)))
    assert (a1 == a2).all()


# ---------------------------------------------------------------------------
# serialization
# ---------------------------------------------------------------------------


def test_serialize_roundtrip():
    from primus_fhe_tpu.numeric import to_u64_pair, from_u64_pair

    a32 = np.array([[rng.getrandbits(32) for _ in range(7)] for _ in range(3)], dtype=np.uint32)
    assert (u32_from_bytes(u32_to_bytes(a32), a32.shape) == a32).all()
    a64 = np.array([rng.getrandbits(64) for _ in range(11)], dtype=np.uint64)
    pair = to_u64_pair(a64)
    back = u64_from_bytes(u64_to_bytes(pair), a64.shape)
    assert (from_u64_pair(back) == a64).all()


# ---------------------------------------------------------------------------
# LWE extraction over prime q (rlwe/coeff.rs:194-264)
# ---------------------------------------------------------------------------


def test_extract_lwe_prime_q():
    plan = build_plan32(LOG_N, Q)
    m = barrett32(Q)
    gauss = DiscreteGaussian(3.2)
    key = jax.random.PRNGKey(77)
    k1, k2 = jax.random.split(key)
    secret = (jax.random.bits(k1, (1, N), dtype=jnp.uint32) & 1).astype(jnp.uint32)
    secret_ntt = forward32(plan, secret)
    msg = jnp.asarray(np.array([rng.randrange(64) for _ in range(N)], dtype=np.uint32))
    ct = rlwe.encrypt32(k2, msg, secret_ntt[0], gauss, plan, m, Q)
    # full RLWE phase
    ph = np.asarray(rlwe.phase32(ct, secret_ntt[0], plan, m))
    err0 = [min((int(p) - int(mu)) % Q, (int(mu) - int(p)) % Q) for p, mu in zip(ph, np.asarray(msg))]
    assert max(err0) < 40
    # extracted LWE phase at index 0 and at index 3
    lwe0 = rlwe.extract_lwe32(ct, jnp.uint32(Q))
    p0 = int(phase32(lwe0, secret[0], m))
    assert min((p0 - int(msg[0])) % Q, (int(msg[0]) - p0) % Q) < 40
    lwe3 = rlwe.extract_lwe_with_index32(ct, 3, jnp.uint32(Q))
    p3 = int(phase32(lwe3, secret[0], m))
    assert min((p3 - int(msg[3])) % Q, (int(msg[3]) - p3) % Q) < 40
    # multi-message extraction
    mm = rlwe.extract_first_few_lwe32(ct, 4, jnp.uint32(Q))
    assert mm.shape == (N + 4,)


def test_extract_lwe_traced_index_matches_static():
    """Traced-index extraction (ONE compiled program, runtime index —
    rlwe/coeff.rs:194-229's runtime signature) equals the static-slice
    variant bit-for-bit at every index."""
    key = jax.random.PRNGKey(3)
    ct = jax.random.randint(key, (2, N), 0, Q).astype(jnp.uint32)

    extract = jax.jit(
        lambda c, i: rlwe.extract_lwe_with_index32(c, i, jnp.uint32(Q))
    )
    for index in (0, 1, 3, N // 2, N - 1):
        static = rlwe.extract_lwe_with_index32(ct, index, jnp.uint32(Q))
        traced = extract(ct, jnp.int32(index))
        assert np.array_equal(np.asarray(static), np.asarray(traced)), index

    # batched ciphertexts with per-row indices in one call
    cts = jax.random.randint(jax.random.PRNGKey(4), (3, 2, N), 0, Q).astype(
        jnp.uint32
    )
    idx = jnp.asarray([1, 5, N - 2], jnp.int32)
    batched = jax.jit(
        lambda c, i: rlwe.extract_lwe_with_index32(c, i, jnp.uint32(Q))
    )(cts, idx)
    for r, index in enumerate((1, 5, N - 2)):
        want = rlwe.extract_lwe_with_index32(cts[r], index, jnp.uint32(Q))
        assert np.array_equal(np.asarray(batched[r]), np.asarray(want)), index


# ---------------------------------------------------------------------------
# poly module
# ---------------------------------------------------------------------------


def test_poly_ops():
    from primus_fhe_tpu.poly import (
        poly_add32,
        poly_evaluate32,
        poly_mul_monomial32,
        poly_neg32,
        poly_sub32,
    )

    m = barrett32(Q)
    a = np.array([rng.randrange(Q) for _ in range(N)], dtype=np.uint32)
    b = np.array([rng.randrange(Q) for _ in range(N)], dtype=np.uint32)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    qj = jnp.uint32(Q)
    assert (
        np.asarray(poly_add32(ja, jb, qj)).astype(np.int64)
        == (a.astype(np.int64) + b) % Q
    ).all()
    # monomial multiply vs naive
    for d in (0, 1, 5, N - 1, N, 2 * N - 1):
        got = np.asarray(poly_mul_monomial32(ja, jnp.int32(d), qj))
        mono = [0] * N
        mono[d % (2 * N) % N] = 1 if (d % (2 * N)) < N else Q - 1
        expect = naive_negacyclic_mul([int(x) for x in a], mono, Q)
        assert got.astype(object).tolist() == expect, d
    # Horner evaluation
    x = 12345
    got = int(poly_evaluate32(ja, jnp.uint32(x), m))
    expect = sum(int(c) * pow(x, i, Q) for i, c in enumerate(a)) % Q
    assert got == expect


def test_poly_mul_monomial64():
    from primus_fhe_tpu.numeric import from_u64_pair, to_u64_pair
    from primus_fhe_tpu.poly.poly import poly_mul_monomial64

    q = 1125899906826241
    n = 16
    a = np.array([rng.randrange(q) for _ in range(n)], dtype=np.uint64)
    uq = to_u64_pair(np.uint64(q))
    for d in (0, 3, n, 2 * n - 1):
        got = from_u64_pair(poly_mul_monomial64(to_u64_pair(a), jnp.int32(d), uq))
        mono = [0] * n
        dd = d % (2 * n)
        mono[dd % n] = 1 if dd < n else q - 1
        expect = naive_negacyclic_mul([int(x) for x in a], mono, q)
        assert got.astype(object).tolist() == expect, d
