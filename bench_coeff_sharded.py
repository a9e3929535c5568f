#!/usr/bin/env python
"""Coefficient-sharded NTT round-trip timing on the virtual CPU mesh.

First perf datapoint for SURVEY.md §5 scaling axis (b): forward+inverse
u32 NTT with the coefficient axis sharded over D virtual CPU devices,
each measurement pinned to exactly D physical cores (the bench_scaling.py
protocol — device count == core count, so efficiency is per-device-
resource-normalized).  The exchange stages cost 2·log2(D) ppermutes per
transform; on real ICI those ride dedicated links, on CPU they are
memcpys, so treat the absolute numbers as machinery validation and the
D-scaling trend as the datapoint.

Prints one JSON line: transforms/s at each mesh size + efficiency.
"""

import json
import os
import subprocess
import sys
import time

LOG_N = 12  # headline size; 2-adic valuation of Q-1 caps n at 2^12
Q = 536813569
BATCH = 8


def worker(n_dev: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}"
    )
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from jax.sharding import NamedSharding, PartitionSpec as P

    from primus_fhe_tpu.parallel.coeff_sharded import (
        build_expanded_inverse_tables32,
        build_expanded_tables32,
        coeff_sharded_forward32,
        coeff_sharded_inverse32,
    )
    from primus_fhe_tpu.parallel.mesh import make_mesh
    from primus_fhe_tpu.transforms import build_plan32, forward32, inverse32

    n = 1 << LOG_N
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.integers(0, Q, (BATCH, n), dtype=np.uint64).astype(np.uint32))

    if n_dev == 1:
        plan = build_plan32(LOG_N, Q)

        def step(v):
            return inverse32(plan, forward32(plan, v))

        run = jax.jit(step)
        out = run(vals)
    else:
        mesh = make_mesh(n_dev, residue=n_dev)
        ftab = build_expanded_tables32(LOG_N, Q)
        itab = build_expanded_inverse_tables32(LOG_N, Q)
        sh = NamedSharding(mesh, P(None, "residue"))
        vals = jax.device_put(vals, sh)

        def run(v):
            f = coeff_sharded_forward32(
                mesh, "residue", LOG_N, Q, v, tables=ftab, local_impl="jnp"
            )
            return coeff_sharded_inverse32(
                mesh, "residue", LOG_N, Q, f, tables=itab, local_impl="jnp"
            )

        out = run(vals)
    jax.block_until_ready(out)
    reps = 10
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(vals)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        best = dt if best is None else min(best, dt)
    print(f"RESULT {BATCH / best}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return

    ncores = os.cpu_count() or 1
    n_hi = max(2, min(8, ncores))

    def run(n: int) -> float:
        cores = ",".join(str(c) for c in range(n))
        cmd = [
            "taskset", "-c", cores, sys.executable, os.path.abspath(__file__),
            "--worker", str(n),
        ]
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=1200, check=True
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                return float(line.split()[1])
        raise RuntimeError(f"no RESULT: {out.stdout!r} {out.stderr[-500:]!r}")

    r1 = run(1)
    rn = run(n_hi)
    eff = rn / (r1 * n_hi)
    print(
        json.dumps(
            {
                "metric": f"coeff-sharded n=2^{LOG_N} u32 NTT round trip, "
                f"1 -> {n_hi} pinned virtual devices",
                "roundtrips_per_s_1dev": r1,
                f"roundtrips_per_s_{n_hi}dev": rn,
                "scaling_efficiency": eff,
                "note": "strong scaling, fixed batch; exchange stages are "
                "2*log2(D) ppermutes/transform (memcpy on CPU, ICI on TPU)",
            }
        )
    )


if __name__ == "__main__":
    main()
