#!/usr/bin/env python
"""Sharded DCRT gadget product: auto-SPMD vs explicit overlapped shard_map.

Production dims (N=1024, two 50-bit residues, L=4 gadget, k+1=2), residue
axis sharded over D pinned virtual CPU devices.  The auto-SPMD path lets
the partitioner place the CRT-compose collective (all-gather + replicated
compose); the overlap path (parallel/overlap.py) splits compose compute
across devices and issues one psum per component ahead of the level
loops.  On CPU the collectives are memcpys, so the delta measured here is
the compose-compute split + collective shape; the scheduling overlap
itself only materializes on TPU's async collectives.

Prints one JSON line with both step times and the speedup.
"""

import json
import os
import subprocess
import sys
import time

MODULI = [1125899906826241, 1125899906629633]
LOG_N = 10
K1 = 2
LOG_BASIS = 25


def worker(n_dev: int, mode: str) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}"
    )
    import jax
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from primus_fhe_tpu.decompose import BigUintApproxSignedBasis
    from primus_fhe_tpu.numeric import to_u64_pair
    from primus_fhe_tpu.parallel.mesh import make_mesh
    from primus_fhe_tpu.rns import RNSBase64
    from primus_fhe_tpu.transforms.dcrt import build_dcrt_plan64

    n = 1 << LOG_N
    base = RNSBase64(MODULI)
    basis = BigUintApproxSignedBasis(base, LOG_BASIS)
    plan = build_dcrt_plan64(LOG_N, MODULI)
    level = basis.decompose_length
    rng = np.random.default_rng(0)
    glwe = to_u64_pair(
        rng.integers(0, min(MODULI), size=(2, K1, n), dtype=np.uint64)
    )
    ggsw = to_u64_pair(
        rng.integers(0, min(MODULI), size=(K1, level, 2, K1, n), dtype=np.uint64)
    )
    mesh = make_mesh(n_dev, residue=n_dev)

    if mode == "overlap":
        from primus_fhe_tpu.parallel.overlap import (
            make_sharded_gadget_product,
            shard_gadget_inputs,
        )

        fn = make_sharded_gadget_product(mesh, "residue", basis, plan, base)
        sg, sk = shard_gadget_inputs(mesh, "residue", glwe, ggsw)

        def step():
            return fn(sg, sk)

    else:  # auto-SPMD
        from jax.sharding import NamedSharding, PartitionSpec as P

        from primus_fhe_tpu.lattice.dcrt import crt_glwe_mul_dcrt_ggsw

        sh_g = NamedSharding(mesh, P("residue", None, None))
        sh_k = NamedSharding(mesh, P(None, None, "residue", None, None))
        sg = jax.tree.map(lambda x: jax.device_put(x, sh_g), glwe)
        sk = jax.tree.map(lambda x: jax.device_put(x, sh_k), ggsw)
        mono = plan.monomial_base
        sh_plan = jax.tree.map(
            lambda x: NamedSharding(
                mesh,
                P(None) if x is mono
                else P("residue", *([None] * (x.ndim - 1))),
            ),
            plan,
        )
        f = jax.jit(
            crt_glwe_mul_dcrt_ggsw,
            static_argnums=(2, 4),
            in_shardings=(sh_g, sh_k, sh_plan),
            out_shardings=sh_g,
        )

        def step():
            return f(sg, sk, basis, plan, base)

    out = step()
    jax.block_until_ready(out)
    reps = 10
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = step()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        best = dt if best is None else min(best, dt)
    print(f"RESULT {best}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
        return

    ncores = os.cpu_count() or 1
    n_dev = max(2, min(len(MODULI), ncores))

    def run(mode: str) -> float:
        cores = ",".join(str(c) for c in range(n_dev))
        cmd = [
            "taskset", "-c", cores, sys.executable, os.path.abspath(__file__),
            "--worker", str(n_dev), mode,
        ]
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=1200, check=True
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                return float(line.split()[1])
        raise RuntimeError(f"no RESULT: {out.stdout!r} {out.stderr[-500:]!r}")

    t_auto = run("auto")
    t_over = run("overlap")
    print(
        json.dumps(
            {
                "metric": f"sharded DCRT gadget product step, N=2^{LOG_N}, "
                f"2x50-bit, L=4, {n_dev} pinned devices",
                "auto_spmd_s": t_auto,
                "overlap_s": t_over,
                "speedup": t_auto / t_over,
            }
        )
    )


if __name__ == "__main__":
    main()
