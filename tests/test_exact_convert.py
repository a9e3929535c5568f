"""Exact RNS base conversion (HPS with integer fixed-point alpha)."""

import random

import jax.numpy as jnp
import numpy as np

from primus_fhe_tpu.rns import BaseConverter32, RNSBase32

rng = random.Random(808)

MOD_IN = [536813569, 536608769, 536543233]
MOD_OUT = [1073682433]


def test_exact_convert_is_exact():
    in_base = RNSBase32(MOD_IN)
    out_base = RNSBase32(MOD_OUT)
    conv = BaseConverter32(in_base, out_base)
    Q = in_base.q_product
    # keep values away from multiples of Q/2 by margin >> k*2^-34*Q
    vals = [rng.randrange(Q // 16, 7 * Q // 16) for _ in range(64)]
    arr = jnp.asarray(np.array([[v % q for v in vals] for q in MOD_IN], dtype=np.uint32))
    out = np.asarray(conv.exact_convert(arr))
    p = MOD_OUT[0]
    expect = [v % p for v in vals]
    assert out[0].astype(object).tolist() == expect


def test_exact_convert_centered_near_q():
    """Values near Q convert as negative representatives (V - Q mod p),
    matching the reference's f64 rounding semantics."""
    in_base = RNSBase32(MOD_IN)
    out_base = RNSBase32(MOD_OUT)
    conv = BaseConverter32(in_base, out_base)
    Q = in_base.q_product
    p = MOD_OUT[0]
    vals = [Q - 1 - rng.randrange(1000) for _ in range(16)]
    arr = jnp.asarray(np.array([[v % q for v in vals] for q in MOD_IN], dtype=np.uint32))
    out = np.asarray(conv.exact_convert(arr))[0]
    assert out.astype(object).tolist() == [(v - Q) % p for v in vals]


def test_exact_vs_fast_slack():
    in_base = RNSBase32(MOD_IN)
    out_base = RNSBase32(MOD_OUT)
    conv = BaseConverter32(in_base, out_base)
    Q = in_base.q_product
    p = MOD_OUT[0]
    vals = [rng.randrange(Q // 8, 3 * Q // 8) for _ in range(32)]
    arr = jnp.asarray(np.array([[v % q for v in vals] for q in MOD_IN], dtype=np.uint32))
    fast = np.asarray(conv.fast_convert(arr))[0]
    exact = np.asarray(conv.exact_convert(arr))[0]
    k = in_base.count
    for f, e, v in zip(fast, exact, vals):
        assert int(e) == v % p
        # fast result is exact + alpha*Q for some alpha in [0, k)
        assert any((int(e) + a * Q) % p == int(f) for a in range(k))


def test_exact_convert64():
    from primus_fhe_tpu.numeric import from_u64_pair, to_u64_pair
    from primus_fhe_tpu.rns import BaseConverter64, RNSBase64

    mod_in = [1125899906826241, 1125899906629633]
    mod_out = [1152921504606830593]
    in_base = RNSBase64(mod_in)
    out_base = RNSBase64(mod_out)
    conv = BaseConverter64(in_base, out_base)
    Q = in_base.q_product
    p = mod_out[0]
    vals = [rng.randrange(Q // 16, 7 * Q // 16) for _ in range(32)]
    arr = to_u64_pair(
        np.array([[v % q for v in vals] for q in mod_in], dtype=np.uint64)
    )
    out = from_u64_pair(conv.exact_convert(arr))[0]
    assert out.astype(object).tolist() == [v % p for v in vals]
