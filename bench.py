#!/usr/bin/env python
"""Benchmark: n=4096 62-bit-tier negacyclic NTT throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "modmul/s", "vs_baseline": N}

The metric is NTT-equivalent modular multiplies per second (each radix-2
Harvey butterfly = one Shoup modmul, n/2*log2(n) per transform), the
BASELINE.json north-star unit; baseline target is 1e9 modmul/s/chip.

Runs on whatever JAX platform the environment provides (TPU under the
driver; CPU as a fallback).  Uses the 50-bit reference bench prime
q=1125899906826241 (crates/primus_ntt/benches/bench_u64.rs:8).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from primus_fhe_tpu.numeric import to_u64_pair
    from primus_fhe_tpu.transforms import build_plan64, forward64

    log_n = 12
    n = 1 << log_n
    q = 1125899906826241  # 50-bit reference bench prime
    batch = 64

    rng = np.random.default_rng(7)
    data = to_u64_pair(rng.integers(0, q, size=(batch, n), dtype=np.uint64))

    # Preferred paths, fastest first: the fused MXU four-step kernel (int8
    # systolic-array matmuls; ops/ntt_mxu.py), then the fused VPU butterfly
    # kernel (ops/ntt_pallas.py).  Falls back to the jnp/XLA reference path
    # off-TPU or if neither kernel compiles in this environment.
    fwd_step = None
    if jax.default_backend() == "tpu":
        candidates = []
        try:
            from primus_fhe_tpu.ops.ntt_mxu import MxuNttPlan64, mxu_fused_forward64

            mplan = MxuNttPlan64(log_n, q)
            candidates.append(
                ("mxu", lambda _, v: mxu_fused_forward64(mplan, v, 4, 4))
            )
        except Exception as e:  # pragma: no cover - environment dependent
            print(f"[bench] mxu plan unavailable ({e!r})", file=sys.stderr)
        try:
            from primus_fhe_tpu.ops.ntt_pallas import (
                PallasNttPlan64,
                pallas_forward64,
            )

            pplan = PallasNttPlan64(log_n, q)
            candidates.append(
                ("pallas", lambda _, v: pallas_forward64(pplan, v, 4, 16))
            )
        except Exception as e:  # pragma: no cover - environment dependent
            print(f"[bench] pallas plan unavailable ({e!r})", file=sys.stderr)
        for name, step in candidates:
            try:
                probe = jax.jit(lambda v, step=step: step(None, v))(data)
                jax.block_until_ready(probe)
                fwd_step = step
                print(f"[bench] path={name}", file=sys.stderr)
                break
            except Exception as e:  # pragma: no cover - environment dependent
                print(f"[bench] {name} path unavailable ({e!r})", file=sys.stderr)
    if fwd_step is None:
        jplan = build_plan64(log_n, q)

        def fwd_step(_, v):
            return forward64(jplan, v, out_factor=4)

    # Chain transforms inside one executable via fori_loop (no overlap
    # hiding, no dispatch overhead) and return a checksum scalar whose
    # host fetch forces full device execution — robust against async
    # runtimes where block_until_ready returns early.
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("reps",))
    def chained(v, reps):
        def body(_, v):
            return fwd_step(None, v)

        v = jax.lax.fori_loop(0, reps, body, v)
        return jnp.sum(v.lo ^ v.hi, dtype=jnp.uint32)

    # The remote-device runtime has multi-second fixed dispatch/fetch
    # latency, so throughput is measured from the *difference* between two
    # workload sizes, cancelling the constant overhead.
    r1, r2 = 64, 2048
    _ = float(chained(data, r1))  # warmup/compile small
    _ = float(chained(data, r2))  # warmup/compile large
    t0 = time.perf_counter()
    _ = float(chained(data, r1))
    t1 = time.perf_counter()
    _ = float(chained(data, r2))
    t2 = time.perf_counter()
    dt = max((t2 - t1) - (t1 - t0), 1e-9)
    reps_total = r2 - r1
    print(
        f"[bench] t(r1={r1})={t1-t0:.3f}s t(r2={r2})={t2-t1:.3f}s",
        file=sys.stderr,
    )

    ntts = reps_total * batch
    modmuls = ntts * (n // 2) * log_n
    rate = modmuls / dt
    print(
        f"[bench] platform={jax.devices()[0].platform} device={jax.devices()[0].device_kind} "
        f"ntts/s={ntts/dt:.1f} time={dt:.3f}s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "n=4096 50-bit NTT-equivalent modmuls/s/chip",
                "value": rate,
                "unit": "modmul/s",
                "vs_baseline": rate / 1e9,
            }
        )
    )


if __name__ == "__main__":
    main()
