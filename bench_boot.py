#!/usr/bin/env python
"""Secondary benchmark: batched TFHE gate-bootstrap throughput.

Config-5 (BASELINE.json): the full blind-rotation pipeline — modulus
switch, n_lwe CMux external products (exact CRT-NTT backend), sample
extraction — over a batch of LWE ciphertexts on one chip.

Prints one JSON line (bootstraps/s plus the parameter set) and writes the
same record to ``BENCH_BOOT_r{PRIMUS_ROUND}.json`` so round-over-round
bootstrap progress is verifiable from artifacts, not doc claims.
Timing uses the same difference-of-workloads discipline as ``bench.py``
(two rep counts, constant dispatch/fetch overhead cancels).
Not the driver headline (that is bench.py); run manually.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from primus_fhe_tpu.boot import blind_rotate, bootstrap, make_bootstrap_key
    from primus_fhe_tpu.decompose import ApproxSignedBasis32
    from primus_fhe_tpu.distr.sampling import DiscreteGaussian
    from primus_fhe_tpu.lattice import tfhe

    import os
    LOG_N = int(os.environ.get("BOOT_LOG_N", 10))
    K, LB = 1, 8
    LV = int(os.environ.get("BOOT_LEVEL", 2))
    N = 1 << LOG_N
    N_LWE = int(os.environ.get("BOOT_NLWE", 512))
    BATCH = int(os.environ.get('BOOT_BATCH', 64))

    basis = ApproxSignedBasis32(None, LB, reverse_length=LV)
    conv = tfhe.make_convolver(LOG_N, LV, K, LB)
    gauss = DiscreteGaussian(3.2)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lwe_secret = (jax.random.bits(k1, (N_LWE,), dtype=jnp.uint32) & 1).astype(jnp.uint32)
    glwe_secret = (jax.random.bits(k2, (K, N), dtype=jnp.uint32) & 1).astype(jnp.uint32)

    # default path on TPU: the single-kernel MXU CMux (ops/cmux_mxu.py);
    # BOOT_PATH=ref forces the round-3 VPU-butterfly fused step
    use_mxu = (
        os.environ.get("BOOT_PATH", "mxu") == "mxu"
        and jax.default_backend() == "tpu"
        and LOG_N >= 8
    )
    t0 = time.perf_counter()
    if use_mxu:
        from primus_fhe_tpu.boot.blind_rotate import make_bootstrap_key_mxu

        bsk = make_bootstrap_key_mxu(k3, lwe_secret, glwe_secret, basis, gauss, conv)
        shape = bsk[0].shape
    else:
        bsk = make_bootstrap_key(k3, lwe_secret, glwe_secret, basis, gauss, conv)
        shape = bsk.shape
    jax.block_until_ready(bsk)
    print(f"[bench_boot] bsk {shape} built in {time.perf_counter()-t0:.1f}s "
          f"primes={conv.primes} pallas={conv.use_pallas} path={'mxu' if use_mxu else 'ref'}",
          file=sys.stderr)

    test_poly = jnp.full(N, 1 << 28, dtype=jnp.uint32)
    # half the batch encrypts +1/8, half -1/8 so output signs are checkable
    import numpy as _np

    mus = jnp.asarray(
        _np.where(_np.arange(BATCH) % 2 == 0, 1 << 29, (1 << 32) - (1 << 29)).astype(
            _np.uint32
        )
    )
    a_part = jax.random.bits(k4, (BATCH, N_LWE), dtype=jnp.uint32)
    b_part = jnp.sum(a_part * lwe_secret[None], axis=1, dtype=jnp.uint32) + mus
    cts = jnp.concatenate([a_part, b_part[:, None]], axis=1)

    run = jax.jit(lambda c: bootstrap(conv, basis, bsk, c, test_poly, LOG_N))

    t0 = time.perf_counter()
    out = run(cts)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    # difference-of-workloads timing: issue r async dispatches, fetch one
    # checksum; (T(r2) - T(r1)) / (r2 - r1) cancels the constant
    # dispatch/fetch overhead of the remote device.
    def run_reps(r):
        t0 = time.perf_counter()
        for _ in range(r):
            out = run(cts)
        _ = float(jnp.sum(out, dtype=jnp.uint32))
        return time.perf_counter() - t0

    # min-per-size difference: robust to one-sided tunnel hiccups (a slow
    # r1 run would otherwise collapse a paired difference to the floor)
    r1, r2 = 2, 10
    _ = run_reps(r1)  # warm
    tas, tbs = [], []
    for _i in range(3):
        tas.append(run_reps(r1))
        tbs.append(run_reps(r2))
    dt = max(min(tbs) - min(tas), 1e-9) / (r2 - r1)
    rate = BATCH / dt

    # correctness: decrypted phases must carry the input signs
    from primus_fhe_tpu.lattice.lwe import phase_torus32

    ph = np.asarray(phase_torus32(out, glwe_secret.reshape(-1))).astype(np.int64)
    ph = np.where(ph >= 1 << 31, ph - (1 << 32), ph)
    expect_pos = np.arange(BATCH) % 2 == 0
    ok = ((ph > 0) == expect_pos).all() and (np.abs(np.abs(ph) - (1 << 28)) < 1 << 26).all()
    print(f"[bench_boot] output sign check: {'OK' if ok else 'FAIL'}", file=sys.stderr)
    if not ok:
        raise SystemExit("bootstrap output incorrect")
    print(f"[bench_boot] compile={compile_s:.1f}s step={dt*1e3:.1f}ms", file=sys.stderr)
    record = {
        "metric": f"batched gate bootstraps/s (N={N}, n_lwe={N_LWE}, L={LV}, B=2^{LB}, batch={BATCH})",
        "value": rate,
        "unit": "bootstraps/s",
        "vs_baseline": None,
        "platform": jax.devices()[0].platform,
        "device": jax.devices()[0].device_kind,
        "sign_check": "ok",
        "path": "cmux-mxu" if use_mxu else "cmux-fused-vpu",
    }
    print(json.dumps(record))

    # --- NTRU (NGS/FINAL) blind rotation: ms per CMux step ---------------
    from primus_fhe_tpu.boot import ntru_blind_rotate as nb
    from primus_fhe_tpu.utils.primes import next_ntt_prime

    NT_LOG_N = int(os.environ.get("NTRU_LOG_N", 10))
    NT_N = 1 << NT_LOG_N
    NT_Q = next_ntt_prime(30, NT_LOG_N)
    NT_L = int(os.environ.get("NTRU_LEVEL", 3))
    NT_NLWE = int(os.environ.get("NTRU_NLWE", 512))
    NT_BATCH = int(os.environ.get("NTRU_BATCH", 16))

    ctx = nb.NtruContext(NT_LOG_N, NT_Q, 10, NT_L)
    kk = jax.random.split(jax.random.PRNGKey(5), 3)
    sk = nb.ntru_keygen(kk[0], ctx)
    nt_secret = (jax.random.bits(kk[1], (NT_NLWE,), dtype=jnp.uint32) & 1).astype(
        jnp.uint32
    )
    nt_mxu = use_mxu and NT_LOG_N >= 8
    if nt_mxu:
        evk = nb.make_ntru_bootstrap_key_mxu(kk[2], ctx, sk, nt_secret, gauss)
    else:
        evk = nb.make_ntru_bootstrap_key(kk[2], ctx, sk, nt_secret, gauss)
    test_poly = nb.ntru_test_polynomial(NT_N, NT_Q, ctx.delta)
    rng = np.random.default_rng(11)
    lwe = jnp.asarray(
        rng.integers(0, 2 * NT_N, size=(NT_BATCH, NT_NLWE + 1), dtype=np.int64)
    ).astype(jnp.int32)

    nt_run = jax.jit(lambda c: nb.ntru_blind_rotate(ctx, evk, c, test_poly))
    _ = jax.block_until_ready(nt_run(lwe))

    def nt_reps(r):
        t0 = time.perf_counter()
        out = None
        for _ in range(r):
            out = nt_run(lwe)
        _ = float(jnp.sum(out, dtype=jnp.uint32))
        return time.perf_counter() - t0

    tas, tbs = [], []
    for _i in range(3):
        tas.append(nt_reps(r1))
        tbs.append(nt_reps(r2))
    nt_dt = max(min(tbs) - min(tas), 1e-9) / (r2 - r1)
    ms_per_cmux = nt_dt / (NT_BATCH * NT_NLWE) * 1e3
    nt_record = {
        "metric": (
            f"NTRU blind-rotate CMux (N={NT_N}, q=2^30 tier, L={NT_L}, "
            f"n_lwe={NT_NLWE}, batch={NT_BATCH})"
        ),
        "value": ms_per_cmux,
        "unit": "ms/CMux",
        "rotations_per_s": NT_BATCH / nt_dt,
        "platform": jax.devices()[0].platform,
        "device": jax.devices()[0].device_kind,
        "path": "ntru-cmux-mxu" if nt_mxu else "ntru-pallas",
    }
    print(json.dumps(nt_record))
    print(
        f"[bench_boot] ntru blind rotate: {nt_dt*1e3:.1f}ms/batch, "
        f"{ms_per_cmux*1e3:.2f}us/CMux",
        file=sys.stderr,
    )

    rnd = os.environ.get("PRIMUS_ROUND", "03")
    with open(f"BENCH_BOOT_r{rnd}.json", "w") as f:
        json.dump([record, nt_record], f, indent=1)


if __name__ == "__main__":
    main()
