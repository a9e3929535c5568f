#!/usr/bin/env python
"""Scaling-efficiency benchmark on a virtual device mesh (CPU).

Real multi-chip hardware is unavailable in this environment (one TPU chip
behind a tunnel), so scaling is measured on virtual CPU devices.  The r1
version was confounded: XLA's intra-op thread pool let the 1-device run
use every core, so adding devices showed no gain.  This version pins each
measurement to exactly one physical core per device with ``taskset``
(device count == core count in both runs), giving an honest per-device-
resource-normalized efficiency.  The machine has few cores, so the mesh
is small (1 -> nproc devices); the collective *structure* at any mesh size
is pinned separately by tests/test_collectives_hlo.py.

Workload: the production-dim sharded batched DCRT blind-rotation step from
``__graft_entry__.make_sharded_rotation_step`` (residue + batch axes).
"""

import json
import os
import subprocess
import sys
import time


def worker(n_dev: int) -> None:
    """Measure rotation-step throughput on ``n_dev`` virtual devices
    (invoked pinned to ``n_dev`` cores); prints one float to stdout."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import make_sharded_rotation_step

    # fixed TOTAL work: the batch does not grow with the mesh, so the
    # n-device run does 1/n of the per-device work (strong scaling).
    # Batch (data-parallel) sharding is the production-dominant axis; the
    # residue axis's collective structure is pinned by the HLO tests.
    step, (lwe, acc, bsk), _ = make_sharded_rotation_step(
        n_dev, log_n=10, n_lwe=4, batch=8, residue=1
    )
    out = step(lwe, acc, bsk)
    jax.block_until_ready(out)
    reps = 3
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = step(lwe, acc, bsk)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        best = dt if best is None else min(best, dt)
    print(f"RESULT {1.0 / best}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return

    ncores = os.cpu_count() or 1
    n_dev = max(2, min(8, ncores))

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
        raise RuntimeError(f"no RESULT in worker output: {out.stdout!r} {out.stderr[-500:]!r}")

    r1 = run(1)
    rn = run(n_dev)
    eff = rn / (r1 * n_dev)
    print(
        f"[scaling] 1 device/1 core: {r1:.2f} steps/s; "
        f"{n_dev} devices/{n_dev} cores: {rn:.2f} steps/s; "
        f"efficiency {eff:.2%}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"sharded DCRT rotation-step scaling efficiency "
                    f"(1 -> {n_dev} virtual CPU devices, 1 core each)"
                ),
                "value": eff,
                "unit": "parallel efficiency",
                "vs_baseline": eff / 0.8,
            }
        )
    )


if __name__ == "__main__":
    main()
