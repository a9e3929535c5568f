#!/usr/bin/env python
"""Single-chip bench: sharded-formulation local compute vs the unsharded
fast tier (round-3 verdict item 3's acceptance check).

Runs the sharded four-step's LOCAL pipeline (pass-1 kernel -> transpose ->
pass-2 kernel; at d=1 the all-to-all is absent, everything else is exactly
the per-device work) against ``mxu8_fused_forward64`` on the same
workload.  Target: ratio <= 1.2x (the gap is the extra HBM round trip at
the transpose, which real multi-chip runs pay anyway as the all-to-all).

Writes ``BENCH_SHARDED_MXU_r{PRIMUS_ROUND}.json``.
"""

import json
import os
import sys
import time

import numpy as np


def timeit_pair(fa, fb, r1=16, r2=96, tries=6):
    """Interleaved difference-of-workloads timing of two pipelines: both
    see the same tunnel hiccups, minima per (fn, size) are differenced."""
    for f in (fa, fb):
        _ = f(r1)
        _ = f(r2)
    m = {k: [] for k in ("a1", "a2", "b1", "b2")}
    for _i in range(tries):
        for key, f, r in (("a1", fa, r1), ("a2", fa, r2),
                          ("b1", fb, r1), ("b2", fb, r2)):
            t0 = time.perf_counter()
            _ = f(r)
            m[key].append(time.perf_counter() - t0)
    da = max(min(m["a2"]) - min(m["a1"]), 1e-9) / (r2 - r1)
    db = max(min(m["b2"]) - min(m["b1"]), 1e-9) / (r2 - r1)
    return da, db


def main():
    import jax
    import jax.numpy as jnp

    from primus_fhe_tpu.numeric.limb import U64, to_u64_pair
    from primus_fhe_tpu.ops.ntt_mxu8 import Mxu8NttPlan64, mxu8_fused_forward64
    from primus_fhe_tpu.parallel.coeff_sharded_mxu import (
        _k1_forward,
        _k2_forward,
        get_sharded_plan,
        to_coeff_layout,
    )

    records = []
    for log_n, batch in ((12, 64), (10, 64)):
        n = 1 << log_n
        q = 1125899906826241
        rng = np.random.default_rng(0)
        x = to_u64_pair(rng.integers(0, q, size=(batch, n), dtype=np.uint64))
        plan = Mxu8NttPlan64(log_n, q)
        sp = get_sharded_plan(log_n, q, batch)
        A, B = sp.A, sp.B
        xc = to_coeff_layout(x, A, B)
        tabs = tuple(jnp.asarray(t) for t in sp.k1_tabs)

        fused = jax.jit(lambda v: mxu8_fused_forward64(plan, v, 1).lo)

        @jax.jit
        def sharded_local(vlo, vhi):
            slo, shi = _k1_forward(sp, vlo.reshape(A, B * batch),
                                   vhi.reshape(A, B * batch), tabs)
            slo = jnp.transpose(slo.reshape(A, B, batch), (0, 2, 1))
            shi = jnp.transpose(shi.reshape(A, B, batch), (0, 2, 1))
            olo, _ = _k2_forward(sp, slo.reshape(A * batch, B),
                                 shi.reshape(A * batch, B), 1)
            return olo

        # correctness guard on-device
        got = sharded_local(xc.lo, xc.hi)
        want = fused(x)
        g = np.asarray(got).reshape(A, batch, B).transpose(1, 0, 2).reshape(batch, n)
        assert (g == np.asarray(want)).all(), "sharded local != fused"

        def reps_fused(r):
            o = None
            for _ in range(r):
                o = fused(x)
            return float(jnp.sum(o, dtype=jnp.uint32))

        def reps_sharded(r):
            o = None
            for _ in range(r):
                o = sharded_local(xc.lo, xc.hi)
            return float(jnp.sum(o, dtype=jnp.uint32))

        dt_f, dt_s = timeit_pair(reps_fused, reps_sharded)
        ratio = dt_s / dt_f
        rec = {
            "metric": f"sharded-formulation local fwd vs fused fwd (n={n}, "
                      f"50-bit, batch={batch})",
            "fused_s": dt_f,
            "sharded_local_s": dt_s,
            "ratio": ratio,
            "target": "<= 1.2",
            "platform": jax.devices()[0].platform,
            "device": jax.devices()[0].device_kind,
        }
        records.append(rec)
        print(json.dumps(rec))

    rnd = os.environ.get("PRIMUS_ROUND", "04")
    with open(f"BENCH_SHARDED_MXU_r{rnd}.json", "w") as f:
        json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
