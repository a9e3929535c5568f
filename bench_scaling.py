#!/usr/bin/env python
"""Scaling-efficiency benchmark on a virtual device mesh (CPU).

Real multi-chip hardware is unavailable in this environment (one TPU chip
behind a tunnel), so scaling is demonstrated on the virtual 8-device CPU
mesh: the same SPMD programs the driver dry-runs (`__graft_entry__`).
Measures batched-external-product throughput at 1 device vs N devices and
reports parallel efficiency.  On a real pod slice the identical code paths
shard over ICI (residue axis) and DCN (batch axis).
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from primus_fhe_tpu.decompose import ApproxSignedBasis32
    from primus_fhe_tpu.lattice import tfhe
    from primus_fhe_tpu.parallel.mesh import make_mesh

    # Virtual devices beyond the physical core count show no speedup (they
    # timeshare cores); measure scaling up to the physical parallelism.
    n_dev = max(2, min(len(jax.devices()), os.cpu_count() or 2))
    log_n, k, lb, lv = 8, 1, 8, 3
    n = 1 << log_n
    batch = 32
    basis = ApproxSignedBasis32(None, lb, reverse_length=lv)
    conv = tfhe.make_convolver(log_n, lv, k, lb)
    rng = np.random.default_rng(0)
    glwe = jnp.asarray(
        rng.integers(0, 1 << 32, (batch, k + 1, n), dtype=np.uint64).astype(np.uint32)
    )
    key_ntt = jnp.asarray(
        rng.integers(0, 1 << 20, (conv.count, k + 1, lv, k + 1, n), dtype=np.uint64).astype(np.uint32)
    )

    def timed(mesh_devices):
        mesh = make_mesh(mesh_devices, residue=1)
        g_sh = NamedSharding(mesh, P("batch", None, None))
        k_sh = NamedSharding(mesh, P(None, None, None, None, None))
        gs = jax.device_put(glwe, g_sh)
        ks = jax.device_put(key_ntt, k_sh)
        f = jax.jit(
            lambda g, kk: tfhe.external_product(conv, basis, g, kk),
            out_shardings=g_sh,
        )
        out = f(gs, ks)
        jax.block_until_ready(out)
        reps = 8
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(gs, ks)
        jax.block_until_ready(out)
        return reps * batch / (time.perf_counter() - t0)

    r1 = timed(1)
    rn = timed(n_dev)
    eff = rn / (r1 * n_dev)
    print(
        f"[scaling] 1-device: {r1:.1f} ext-products/s; {n_dev}-device: {rn:.1f}; "
        f"efficiency {eff:.2%}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"external-product batch scaling efficiency (1 -> {n_dev} virtual CPU devices, {os.cpu_count()} cores)",
                "value": eff,
                "unit": "parallel efficiency",
                "vs_baseline": eff / 0.8,
            }
        )
    )


if __name__ == "__main__":
    main()
