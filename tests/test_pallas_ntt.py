"""Pallas fused-NTT kernel differential tests (interpret mode on CPU).

The kernel is the production TPU path; interpret mode executes the same
program semantics on CPU, so bit-equality with the jnp reference here plus
the on-TPU equality check in bench runs covers both worlds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primus_fhe_tpu.numeric import from_u64_pair, to_u64_pair
from primus_fhe_tpu.ops.ntt_pallas import (
    PallasNttPlan64,
    pallas_forward64,
    pallas_inverse64,
)
from primus_fhe_tpu.transforms import build_plan64, forward64, inverse64

pytestmark = pytest.mark.slow

Q = 1125899906826241
rng = np.random.default_rng(0xABC)


@pytest.mark.parametrize("log_n", [5, 8])
def test_pallas_forward_matches_jnp(log_n):
    n = 1 << log_n
    pp = PallasNttPlan64(log_n, Q)
    jp = build_plan64(log_n, Q)
    data = to_u64_pair(rng.integers(0, Q, (4, n), dtype=np.uint64))
    got = from_u64_pair(pallas_forward64(pp, data, 1, 4))
    ref = from_u64_pair(forward64(jp, data))
    assert (got == ref).all()


@pytest.mark.parametrize(
    "q",
    [
        1125899906826241,  # 50-bit Solinas 2^50-2^14+1: shift q*qhat, full defer
        562949953392641,  # 50-bit non-Solinas: generic mul, full defer
        1152921504606830593,  # 60-bit Solinas: no fwd defer, partial inv defer
    ],
)
@pytest.mark.parametrize("log_n", [6, 9])
def test_pallas_prime_tiers_roundtrip(q, log_n):
    """Covers the Solinas/generic multiply paths and the deferred-reduction
    gating tiers (full / none / partial) against the jnp reference."""
    n = 1 << log_n
    pp = PallasNttPlan64(log_n, q)
    jp = build_plan64(log_n, q)
    data = to_u64_pair(rng.integers(0, q, (3, n), dtype=np.uint64))
    got = from_u64_pair(pallas_forward64(pp, data, 1, 2))
    ref = from_u64_pair(forward64(jp, data))
    assert (got == ref).all()
    lazy = from_u64_pair(pallas_forward64(pp, data, 4, 2))
    assert ((lazy.astype(object) % q) == ref.astype(object)).all()
    assert (lazy.astype(object) < 4 * q).all()
    fwd = forward64(jp, data)
    got_i = from_u64_pair(pallas_inverse64(pp, fwd, 1, 2))
    ref_i = from_u64_pair(inverse64(jp, fwd))
    assert (got_i == ref_i).all()
    lazy_i = from_u64_pair(pallas_inverse64(pp, fwd, 2, 2))
    assert ((lazy_i.astype(object) % q) == ref_i.astype(object)).all()
    assert (lazy_i.astype(object) < 2 * q).all()


def test_pallas_inverse_and_roundtrip():
    log_n = 8
    n = 1 << log_n
    pp = PallasNttPlan64(log_n, Q)
    jp = build_plan64(log_n, Q)
    data = to_u64_pair(rng.integers(0, Q, (2, n), dtype=np.uint64))
    fwd = forward64(jp, data)
    got = from_u64_pair(pallas_inverse64(pp, fwd, 1, 2))
    ref = from_u64_pair(inverse64(jp, fwd))
    assert (got == ref).all()
    back = from_u64_pair(pallas_inverse64(pp, pallas_forward64(pp, data, 1, 2), 1, 2))
    assert (back == from_u64_pair(data)).all()


def test_pallas_lazy_contract():
    log_n = 6
    pp = PallasNttPlan64(log_n, Q)
    jp = build_plan64(log_n, Q)
    data = to_u64_pair(rng.integers(0, Q, (2, 64), dtype=np.uint64))
    lazy = from_u64_pair(pallas_forward64(pp, data, 4, 2))
    strict = from_u64_pair(forward64(jp, data))
    assert ((lazy.astype(object) % Q) == strict.astype(object)).all()
    assert (lazy.astype(object) < 4 * Q).all()


def test_pallas_odd_batch_fallback():
    log_n = 6
    pp = PallasNttPlan64(log_n, Q)
    jp = build_plan64(log_n, Q)
    data = to_u64_pair(rng.integers(0, Q, (3, 64), dtype=np.uint64))
    got = from_u64_pair(pallas_forward64(pp, data, 1, 2))
    ref = from_u64_pair(forward64(jp, data))
    assert (got == ref).all()


def test_pallas_rotate_matches_jnp():
    import jax.numpy as jnp

    from primus_fhe_tpu.boot.blind_rotate import _rotate_glwe
    from primus_fhe_tpu.ops.rotate_pallas import pallas_rotate

    n = 64
    rng2 = np.random.default_rng(5)
    v = jnp.asarray(rng2.integers(0, 1 << 32, (3, 2, n), dtype=np.uint64).astype(np.uint32))
    degrees = jnp.asarray([0, 7, 2 * n - 1], dtype=jnp.int32)
    got = np.asarray(pallas_rotate(v, degrees, n))
    for i, d in enumerate([0, 7, 2 * n - 1]):
        expect = np.asarray(_rotate_glwe(v[i], jnp.int32(d), n))
        assert (got[i] == expect).all(), d
    # subtract variant
    got_d = np.asarray(pallas_rotate(v, degrees, n, subtract=True))
    for i, d in enumerate([0, 7, 2 * n - 1]):
        expect = np.asarray(_rotate_glwe(v[i], jnp.int32(d), n)) - np.asarray(v[i])
        assert (got_d[i] == expect).all(), d


@pytest.mark.parametrize("q", [536813569, 1073692673])  # reference u32 primes
@pytest.mark.parametrize("log_n", [6, 9])
def test_pallas32_matches_jnp(q, log_n):
    from primus_fhe_tpu.ops.ntt_pallas import (
        PallasNttPlan32,
        pallas_forward32,
        pallas_inverse32,
    )
    from primus_fhe_tpu.transforms import build_plan32, forward32, inverse32

    n = 1 << log_n
    pp = PallasNttPlan32(log_n, q)
    jp = build_plan32(log_n, q)
    data = np.asarray(rng.integers(0, q, (3, n), dtype=np.uint64), dtype=np.uint32)
    import jax.numpy as jnp

    data = jnp.asarray(data)
    got = np.asarray(pallas_forward32(pp, data, 1, 2))
    ref = np.asarray(forward32(jp, data))
    assert (got == ref).all()
    lazy = np.asarray(pallas_forward32(pp, data, 4, 2)).astype(np.int64)
    assert ((lazy % q) == ref.astype(np.int64)).all()
    assert (lazy < 4 * q).all()
    fwd = forward32(jp, data)
    got_i = np.asarray(pallas_inverse32(pp, fwd, 1, 2))
    ref_i = np.asarray(inverse32(jp, fwd))
    assert (got_i == ref_i).all()


class TestStageKernels:
    """Partial-transform entry points (coeff-sharded local stages): the
    final log_w forward stages / first log_w inverse stages over sliced
    per-lane tables equal the corresponding stages of a full transform."""

    def test_stages_forward32_equals_full_kernel_tail(self):
        from primus_fhe_tpu.ops.ntt_pallas import (
            PallasNttPlan32,
            pallas_forward32,
            pallas_stages_forward32,
        )

        q, log_n = 536813569, 8
        n = 1 << log_n
        plan = PallasNttPlan32(log_n, q)
        rng = np.random.default_rng(5)
        vals = jnp.asarray(rng.integers(0, q, (4, n), dtype=np.uint64).astype(np.uint32))
        # log_w = log_n: the "partial" kernel covering all stages IS the
        # full forward (same tables, same out_factor semantics).
        out = pallas_stages_forward32(log_n, q, plan.fwd_w, plan.fwd_p, vals, 1)
        ref = pallas_forward32(plan, vals, 1)
        assert (np.asarray(out) == np.asarray(ref)).all()

    def test_stages_inverse32_then_jnp_tail_roundtrips(self):
        from primus_fhe_tpu.ops.ntt_pallas import (
            PallasNttPlan32,
            pallas_forward32,
            pallas_stages_inverse32,
        )
        from primus_fhe_tpu.numeric.limb import mulhi_u32

        q, log_n = 536813569, 8
        n = 1 << log_n
        log_w = log_n - 2  # emulate a 4-shard split on one device
        w = 1 << log_w
        plan = PallasNttPlan32(log_n, q)
        rng = np.random.default_rng(6)
        vals = jnp.asarray(rng.integers(0, q, (2, n), dtype=np.uint64).astype(np.uint32))
        f = pallas_forward32(plan, vals, 1)  # bit-reversed, [0, q)

        from primus_fhe_tpu.parallel.coeff_sharded import (
            build_expanded_inverse_tables32,
        )

        inv_w_t, inv_p_t = build_expanded_inverse_tables32(log_n, q)
        # local stages per shard: reshape (b, 4, w) -> (4b, w), sliced tables
        shards = jnp.reshape(f, (-1, w))
        tab_w = inv_w_t[:log_w].reshape(log_w, 4, w)
        tab_p = inv_p_t[:log_w].reshape(log_w, 4, w)
        outs = []
        for s in range(4):
            part = pallas_stages_inverse32(
                log_w, q, tab_w[:, s], tab_p[:, s], shards[s::4], 16
            )
            outs.append(part)
        v = jnp.stack(outs, axis=1).reshape(-1, n)  # interleave shards back
        # exchange stages in jnp (the coeff_sharded formulation, unsharded)
        qc = np.uint32(q)
        tqc = np.uint32(2 * q)
        iota = jax.lax.broadcasted_iota(jnp.uint32, (1, n), 1)
        for s in range(log_w, log_n):
            t = 1 << s
            last = s == log_n - 1
            is_x = (iota & t) == 0
            ww = inv_w_t[s][None]
            wp = inv_p_t[s][None]
            r_m = jnp.roll(v, -t, -1)
            r_p = jnp.roll(v, t, -1)
            x = jnp.where(is_x, v, r_p)
            y = jnp.where(is_x, r_m, v)
            sxy = x + y
            tx = jnp.where(sxy >= tqc, sxy - tqc, sxy)
            dd = x + tqc - y
            mm_in = jnp.where(is_x, tx, dd) if last else dd
            mm = ww * mm_in - qc * mulhi_u32(mm_in, wp)
            v = mm if last else jnp.where(is_x, tx, mm)
        v = jnp.where(v >= qc, v - qc, v)
        assert (np.asarray(v) == np.asarray(vals)).all()
