#!/usr/bin/env python
"""Secondary benchmark: batched DCRT (RNS) CMux throughput on one chip.

The config-5 RNS-bootstrap inner loop: one CMux = monomial rotate +
NTT-domain diff + full gadget product (compose -> multi-limb signed
decompose -> centered respread -> per-modulus NTT -> pointwise MAC).
N=1024, 2x50-bit moduli, L=4 multi-limb levels, batch of ciphertexts —
the shape VERDICT r1 measured at 0.30 ms/CMux (one ciphertext at a time).

Prints one JSON line: CMux/s (batch-aggregate) plus ms per CMux-step.
Not the driver headline (that is bench.py); run manually.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from primus_fhe_tpu.boot.dcrt_blind_rotate import dcrt_blind_rotate_batched
    from primus_fhe_tpu.decompose import BigUintApproxSignedBasis
    from primus_fhe_tpu.numeric import U64, to_u64_pair
    from primus_fhe_tpu.rns import RNSBase64
    from primus_fhe_tpu.transforms.dcrt import build_dcrt_plan64, dcrt_forward64

    import os

    LOG_N = int(os.environ.get("DCRT_LOG_N", 10))
    N = 1 << LOG_N
    MODULI = [1125899906826241, 1125899906629633]  # 2x50-bit
    N_LWE = int(os.environ.get("DCRT_NLWE", 16))  # steps per rotation
    BATCH = int(os.environ.get("DCRT_BATCH", 16))
    K1 = 2

    base = RNSBase64(MODULI)
    basis = BigUintApproxSignedBasis(base, 25)  # L=4 over ~100-bit Q
    plan = build_dcrt_plan64(LOG_N, MODULI)
    level = basis.decompose_length
    print(
        f"[bench_dcrt] N={N} moduli={len(MODULI)}x50-bit L={level} "
        f"n_lwe={N_LWE} batch={BATCH}",
        file=sys.stderr,
    )

    rng = np.random.default_rng(3)
    # random (well-formed range) bootstrap key material and accumulators —
    # throughput does not depend on key semantics, only shapes/ranges.
    q0 = min(MODULI)
    bsk_np = rng.integers(
        0, q0, size=(N_LWE, K1, level, len(MODULI), K1, N), dtype=np.uint64
    )
    bsk = to_u64_pair(bsk_np)
    acc_np = rng.integers(0, q0, size=(BATCH, len(MODULI), K1, N), dtype=np.uint64)
    acc0 = to_u64_pair(acc_np)
    lwe = jnp.asarray(
        rng.integers(0, 2 * N, size=(BATCH, N_LWE + 1)).astype(np.int32)
    )

    @jax.jit
    def run(lwe, acc):
        out = dcrt_blind_rotate_batched(plan, basis, base, bsk, lwe, acc)
        return jnp.sum(out.lo ^ out.hi, dtype=jnp.uint32)

    t0 = time.perf_counter()
    _ = float(run(lwe, acc0))
    print(f"[bench_dcrt] compile+first {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    best = None
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(run(lwe, acc0))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    cmux = N_LWE * BATCH
    ms_per_step = best / N_LWE * 1e3
    record = {
        "metric": f"DCRT CMux/s (N={N}, 2x50-bit, L={level}, batch={BATCH})",
        "value": cmux / best,
        "unit": "cmux/s",
        "ms_per_batched_step": ms_per_step,
        "ms_per_cmux": best / cmux * 1e3,
    }
    print(json.dumps(record))
    import os

    rnd = os.environ.get("PRIMUS_ROUND", "03")
    with open(f"BENCH_DCRT_r{rnd}.json", "w") as f:
        json.dump(record, f, indent=1)


if __name__ == "__main__":
    main()
