#!/usr/bin/env python
"""Secondary benchmark: bootstrap throughput/latency artifact (multi-row).

Config-5 (BASELINE.json): the full blind-rotation pipeline — modulus
switch, n_lwe CMux external products (exact CRT-NTT backend), sample
extraction — on one chip.  Rows written to ``BENCH_BOOT_r{PRIMUS_ROUND}.json``:

1. TFHE gate bootstrap at the repo's own estimator-validated 128-bit
   profile (``params.py`` BOOLEAN_128: N=2048, n_lwe=630, L=3, B=2^7 —
   dims read from the profile so the rows track it), batch 64 — the
   flagship user-felt number;
2. the same profile at batch 1 — single-gate latency (ms);
3. the round-3/4-comparable light config (n_lwe=512, L=2, B=2^8),
   batch 64 — round-over-round progress tracking;
4. NTRU blind-rotate us/CMux at the legacy 2^30-tier config (round-4
   comparable);
5. NTRU end-to-end NAND gates/s at the named NTRU_128 profile
   (``params.py``: FINAL geometry, N=1024, q~2^20, dims read from the
   profile), correctness-checked over the full truth table.

Timing uses the difference-of-workloads discipline (two rep counts,
min-per-size, constant dispatch/fetch overhead cancels — CLAUDE.md).
Not the driver headline (that is bench.py); run manually.
``scratch/row_b128.py`` (B128_BATCH=128/256) appends peak-throughput
rows at larger batches, and ``scratch/row_tfhe_lib.py`` the legacy
TFHE-lib-geometry round-over-round row.
"""

import json
import os
import sys
import time

import numpy as np


def _diff_time(run_once, fetch, r1=2, r2=10, tries=3):
    """(T(r2)-T(r1))/(r2-r1) with per-size minima (CLAUDE.md protocol)."""

    def reps(r):
        t0 = time.perf_counter()
        out = None
        for _ in range(r):
            out = run_once()
        fetch(out)
        return time.perf_counter() - t0

    _ = reps(r1)  # warm
    tas, tbs = [], []
    for _ in range(tries):
        tas.append(reps(r1))
        tbs.append(reps(r2))
    return max(min(tbs) - min(tas), 1e-9) / (r2 - r1)


def tfhe_row(name, log_n, k, lb, lv, n_lwe, batch, use_mxu, shared=None):
    """One TFHE gate-bootstrap row; returns (record, shared_keys)."""
    import jax
    import jax.numpy as jnp

    from primus_fhe_tpu.boot import bootstrap, make_bootstrap_key
    from primus_fhe_tpu.decompose import ApproxSignedBasis32
    from primus_fhe_tpu.distr.sampling import DiscreteGaussian
    from primus_fhe_tpu.lattice import tfhe
    from primus_fhe_tpu.lattice.lwe import phase_torus32

    n = 1 << log_n
    if shared is None:
        basis = ApproxSignedBasis32(None, lb, reverse_length=lv)
        conv = tfhe.make_convolver(log_n, lv, k, lb)
        gauss = DiscreteGaussian(3.2)
        key = jax.random.PRNGKey(0)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        lwe_secret = (jax.random.bits(k1, (n_lwe,), dtype=jnp.uint32) & 1).astype(
            jnp.uint32
        )
        glwe_secret = (jax.random.bits(k2, (k, n), dtype=jnp.uint32) & 1).astype(
            jnp.uint32
        )
        t0 = time.perf_counter()
        if use_mxu:
            from primus_fhe_tpu.boot.blind_rotate import make_bootstrap_key_mxu

            bsk = make_bootstrap_key_mxu(
                k3, lwe_secret, glwe_secret, basis, gauss, conv
            )
        else:
            bsk = make_bootstrap_key(k3, lwe_secret, glwe_secret, basis, gauss, conv)
        jax.block_until_ready(bsk)
        print(
            f"[bench_boot] {name}: bsk built in {time.perf_counter()-t0:.1f}s "
            f"primes={conv.primes} path={'mxu' if use_mxu else 'ref'}",
            file=sys.stderr,
        )
        shared = (basis, conv, bsk, lwe_secret, glwe_secret, k4)
    basis, conv, bsk, lwe_secret, glwe_secret, k4 = shared

    test_poly = jnp.full(n, 1 << 28, dtype=jnp.uint32)
    mus = jnp.asarray(
        np.where(
            np.arange(batch) % 2 == 0, 1 << 29, (1 << 32) - (1 << 29)
        ).astype(np.uint32)
    )
    a_part = jax.random.bits(k4, (batch, n_lwe), dtype=jnp.uint32)
    b_part = jnp.sum(a_part * lwe_secret[None], axis=1, dtype=jnp.uint32) + mus
    cts = jnp.concatenate([a_part, b_part[:, None]], axis=1)

    run = jax.jit(lambda c: bootstrap(conv, basis, bsk, c, test_poly, log_n))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(cts))
    compile_s = time.perf_counter() - t0

    dt = _diff_time(
        lambda: run(cts), lambda o: float(jnp.sum(o, dtype=jnp.uint32))
    )
    rate = batch / dt

    ph = np.asarray(phase_torus32(out, glwe_secret.reshape(-1))).astype(np.int64)
    ph = np.where(ph >= 1 << 31, ph - (1 << 32), ph)
    expect_pos = np.arange(batch) % 2 == 0
    ok = ((ph > 0) == expect_pos).all() and (
        np.abs(np.abs(ph) - (1 << 28)) < 1 << 26
    ).all()
    print(
        f"[bench_boot] {name}: compile={compile_s:.1f}s step={dt*1e3:.2f}ms "
        f"({rate:.0f}/s) sign={'OK' if ok else 'FAIL'}",
        file=sys.stderr,
    )
    if not ok:
        raise SystemExit(f"bootstrap output incorrect ({name})")
    record = {
        "config": name,
        "metric": (
            f"batched gate bootstraps/s (N={n}, n_lwe={n_lwe}, L={lv}, "
            f"B=2^{lb}, batch={batch})"
        ),
        "value": rate,
        "unit": "bootstraps/s",
        "latency_ms_per_batch": dt * 1e3,
        "platform": jax.devices()[0].platform,
        "device": jax.devices()[0].device_kind,
        "sign_check": "ok",
        "path": "cmux-mxu" if use_mxu else "cmux-fused-vpu",
    }
    return record, shared


def ntru_cmux_row(use_mxu):
    """Round-4-comparable NTRU blind-rotate us/CMux (legacy 2^30 tier)."""
    import jax
    import jax.numpy as jnp

    from primus_fhe_tpu.boot import ntru_blind_rotate as nb
    from primus_fhe_tpu.distr.sampling import DiscreteGaussian
    from primus_fhe_tpu.utils.primes import next_ntt_prime

    log_n = int(os.environ.get("NTRU_LOG_N", 10))
    n = 1 << log_n
    q = next_ntt_prime(30, log_n)
    lv = int(os.environ.get("NTRU_LEVEL", 3))
    n_lwe = int(os.environ.get("NTRU_NLWE", 512))
    batch = int(os.environ.get("NTRU_BATCH", 16))

    gauss = DiscreteGaussian(3.2)
    ctx = nb.NtruContext(log_n, q, 10, lv)
    kk = jax.random.split(jax.random.PRNGKey(5), 3)
    sk = nb.ntru_keygen(kk[0], ctx)
    secret = (jax.random.bits(kk[1], (n_lwe,), dtype=jnp.uint32) & 1).astype(
        jnp.uint32
    )
    nt_mxu = use_mxu and log_n >= 8
    if nt_mxu:
        evk = nb.make_ntru_bootstrap_key_mxu(kk[2], ctx, sk, secret, gauss)
    else:
        evk = nb.make_ntru_bootstrap_key(kk[2], ctx, sk, secret, gauss)
    test_poly = nb.ntru_test_polynomial(n, q, ctx.delta)
    rng = np.random.default_rng(11)
    lwe = jnp.asarray(
        rng.integers(0, 2 * n, size=(batch, n_lwe + 1), dtype=np.int64)
    ).astype(jnp.int32)

    run = jax.jit(lambda c: nb.ntru_blind_rotate(ctx, evk, c, test_poly))
    _ = jax.block_until_ready(run(lwe))
    dt = _diff_time(lambda: run(lwe), lambda o: float(jnp.sum(o, dtype=jnp.uint32)))
    ms_per_cmux = dt / (batch * n_lwe) * 1e3
    print(
        f"[bench_boot] ntru cmux: {dt*1e3:.1f}ms/batch "
        f"{ms_per_cmux*1e3:.3f}us/CMux",
        file=sys.stderr,
    )
    return {
        "config": "ntru-cmux-legacy",
        "metric": (
            f"NTRU blind-rotate CMux (N={n}, q=2^30 tier, L={lv}, "
            f"n_lwe={n_lwe}, batch={batch})"
        ),
        "value": ms_per_cmux,
        "unit": "ms/CMux",
        "rotations_per_s": batch / dt,
        "platform": jax.devices()[0].platform,
        "device": jax.devices()[0].device_kind,
        "path": "ntru-cmux-mxu" if nt_mxu else "ntru-pallas",
    }


def ntru_gate_row(use_mxu, batch=16):
    """End-to-end NTRU NAND gates/s at the named NTRU_128 profile."""
    import jax
    import jax.numpy as jnp

    from primus_fhe_tpu.boot import ntru_blind_rotate as nb
    from primus_fhe_tpu.boot.ntru_gates import (
        false_mu,
        ntru_nand,
        true_mu,
    )
    from primus_fhe_tpu.distr.sampling import DiscreteGaussian, sample_uniform
    from primus_fhe_tpu.params import NTRU_128, make_ntru_context

    p = NTRU_128
    ctx, ks_basis = make_ntru_context(p)
    gauss = DiscreteGaussian(p.sigma)
    key = jax.random.PRNGKey(21)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    sk = nb.ntru_keygen(k1, ctx)
    s = (jax.random.bits(k2, (p.lwe_dim,), dtype=jnp.uint32) & 1).astype(jnp.uint32)
    t0 = time.perf_counter()
    if use_mxu and p.log_n >= 8:
        evk = nb.make_ntru_bootstrap_key_mxu(k3, ctx, sk, s, gauss)
        path = "ntru-cmux-mxu"
    else:
        evk = nb.make_ntru_bootstrap_key(k3, ctx, sk, s, gauss)
        path = "ntru-pallas"
    # ksk rows are LWE samples under s: their noise must carry the LWE
    # layer's security on its own (params.py NtruParams.lwe_sigma)
    ksk = nb.make_ntru_keyswitch_key(
        k4, ctx, sk, s, ks_basis, DiscreteGaussian(p.lwe_sigma)
    )
    jax.block_until_ready(ksk)
    print(
        f"[bench_boot] NTRU_128: q={p.q} evk+ksk built in "
        f"{time.perf_counter()-t0:.1f}s",
        file=sys.stderr,
    )

    # batch of NAND inputs cycling the truth table
    tv, fv = true_mu(ctx), false_mu(ctx)
    xs = np.arange(batch) % 2
    ys = (np.arange(batch) // 2) % 2
    sv = np.asarray(s).astype(np.int64)

    # fresh encryptions carry the profile's lwe_sigma (>= the ks floor;
    # the key-generation sigma alone would leave fresh cts ~2^65-weak)
    enc_gauss = DiscreteGaussian(p.lwe_sigma)

    def enc(k, mu):
        ka, ke = jax.random.split(k)
        a = sample_uniform(ka, (p.lwe_dim,), ctx.q_int)
        e = enc_gauss.sample_mod(ke, (), ctx.q_int)
        b = (
            int(np.asarray(a, dtype=np.int64) @ sv) + int(mu) + int(e)
        ) % ctx.q_int
        return jnp.concatenate([a, jnp.asarray([b], dtype=jnp.uint32)])

    keys = jax.random.split(k5, 2 * batch)
    c1 = jnp.stack([enc(keys[i], tv if xs[i] else fv) for i in range(batch)])
    c2 = jnp.stack(
        [enc(keys[batch + i], tv if ys[i] else fv) for i in range(batch)]
    )

    run = jax.jit(lambda a, b: ntru_nand(ctx, evk, ksk, ks_basis, a, b))
    out = jax.block_until_ready(run(c1, c2))
    dt = _diff_time(
        lambda: run(c1, c2), lambda o: float(jnp.sum(o, dtype=jnp.uint32))
    )

    # decrypt and check the full truth table
    outs = np.asarray(out).astype(np.int64)
    ok = True
    for i in range(batch):
        ph = (int(outs[i, -1]) - int(outs[i, :-1] @ sv)) % ctx.q_int
        phc = ph - ctx.q_int if ph > ctx.q_int // 2 else ph
        want = 1 - (int(xs[i]) & int(ys[i]))
        got = 1 if phc > 0 else 0
        if got != want or abs(abs(phc) - tv) >= tv // 2:
            ok = False
            print(f"[bench_boot] NTRU gate MISMATCH at {i}: {phc}", file=sys.stderr)
    print(
        f"[bench_boot] NTRU_128 NAND: {dt*1e3:.1f}ms/batch "
        f"({batch/dt:.0f} gates/s) truth-table {'OK' if ok else 'FAIL'}",
        file=sys.stderr,
    )
    if not ok:
        raise SystemExit("NTRU gate output incorrect")
    return {
        "config": "ntru-128-nand",
        "metric": (
            f"NTRU NAND gates/s at NTRU_128 (N={1 << p.log_n}, q={p.q} "
            f"(~2^{p.q_bits}), n_lwe={p.lwe_dim}, B=2^{p.log_basis}, "
            f"L={p.level}, ks 2^{p.ks_log_basis}x{p.ks_level}, batch={batch})"
        ),
        "value": batch / dt,
        "unit": "gates/s",
        "latency_ms_per_batch": dt * 1e3,
        "truth_table_check": "ok",
        "platform": jax.devices()[0].platform,
        "device": jax.devices()[0].device_kind,
        "path": path,
    }


def main():
    import jax

    use_mxu = (
        os.environ.get("BOOT_PATH", "mxu") == "mxu"
        and jax.default_backend() == "tpu"
    )
    rows = []

    # 1+2: the estimator-validated 128-bit profile (batch 64) +
    # single-gate latency (batch 1); dims come from params.BOOLEAN_128
    from primus_fhe_tpu.params import BOOLEAN_128 as BP

    rec, shared = tfhe_row(
        "std128-b64", BP.log_n, BP.glwe_dim, BP.log_basis, BP.level,
        BP.lwe_dim, 64, use_mxu,
    )
    rows.append(rec)
    rec1, _ = tfhe_row(
        "std128-b1", BP.log_n, BP.glwe_dim, BP.log_basis, BP.level,
        BP.lwe_dim, 1, use_mxu, shared=shared,
    )
    rec1["metric"] = rec1["metric"].replace("batched gate bootstraps/s",
                                            "single-gate bootstrap latency")
    rows.append(rec1)

    # 3: round-3/4-comparable light config
    rec, _ = tfhe_row("light-b64", 10, 1, 8, 2, 512, 64, use_mxu)
    rows.append(rec)

    # 4: NTRU us/CMux (round-4 comparable)
    rows.append(ntru_cmux_row(use_mxu))

    # 5: NTRU_128 end-to-end NAND gates
    rows.append(ntru_gate_row(use_mxu))

    for r in rows:
        print(json.dumps(r))
    rnd = os.environ.get("PRIMUS_ROUND", "05")
    with open(f"BENCH_BOOT_r{rnd}.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
