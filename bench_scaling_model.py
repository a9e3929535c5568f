#!/usr/bin/env python
"""Modeled multi-chip scaling efficiency at 8 devices (the ≥80% north star).

Real multi-chip hardware is unavailable here (one chip behind a tunnel),
so this produces the strongest available substitute, per the round-2
verdict: an analytic bytes-over-ICI model whose inputs are all measured
or compiler-derived, not guessed:

1. **Collective bytes, d=8** — the production-dim sharded blind-rotation
   step (``__graft_entry__.make_sharded_rotation_step``: N=1024, 2x50-bit,
   L=4, batch=16, mesh = residue(2) x batch(4)) is compiled for 8 virtual
   devices and every collective in the optimized HLO is tallied with its
   shape, dtype and group size.  Per-device wire bytes use the standard
   ring costs: all-reduce 2(g-1)/g * S, all-gather / reduce-scatter
   (g-1)/g * S, collective-permute / all-to-all S.
2. **Compute time, 1 chip** — the SAME step (unsharded) is timed on the
   real TPU chip with the difference-of-workloads protocol; per-device
   compute at d=8 is T1/8 (strong scaling; per-device shard = 1/8 of the
   batch x residue work, all of it collective-free per the HLO structure
   tests).
3. **ICI time** — per-device bytes / 45 GB/s (one v5e ICI link per axis
   neighbor, one-direction; residue partners are 1 hop on a pod slice).
   Reported both fully exposed (worst case) and overlapped with the
   measured d=2 overlap factor from bench_overlap.py's scheduling
   (collectives issued before level compute).

   modeled efficiency = T_comp/8 / (T_comp/8 + T_ici_exposed)

Writes ``SCALING_MODEL_r{PRIMUS_ROUND}.json`` with the full derivation.
"""

import json
import os
import re
import subprocess
import sys
import time

ICI_BYTES_PER_S = 45e9  # v5e ICI, one link one-way
DTYPE_BYTES = {
    "u8": 1, "s8": 1, "pred": 1, "u16": 2, "s16": 2, "bf16": 2, "f16": 2,
    "u32": 4, "s32": 4, "f32": 4, "u64": 8, "s64": 8, "f64": 8,
}

_OP = re.compile(
    r"=\s+(\([^)]*\)|\w+\[[\d,]*\][^ ]*)\s+"
    r"(all-reduce|all-gather|all-to-all|collective-permute|reduce-scatter)"
    r"(?:-start)?\("
)
_SHAPE = re.compile(r"(\w+)\[([\d,]*)\]")
_GROUPS = re.compile(r"replica_groups=\{\{([^}]*)\}")


def collect_hlo_bytes(n_devices: int, residue: int = 2) -> dict:
    """Run a subprocess that compiles the production step on ``n_devices``
    virtual CPU devices with a ``residue x (n_devices/residue)`` mesh and
    prints the optimized HLO; parse collective wire bytes."""
    code = f"""
import os, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count={n_devices}"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})
from __graft_entry__ import make_sharded_rotation_step
step, (lwe, acc, bsk), _ = make_sharded_rotation_step(
    {n_devices}, log_n=10, n_lwe=4, batch=16, residue={residue})
txt = step.lower(lwe, acc, bsk).compile().as_text()
print("<<<HLO>>>")
print(txt)
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1500, check=True,
    )
    txt = out.stdout.split("<<<HLO>>>", 1)[1]
    return parse_collective_bytes(txt)


def parse_collective_bytes(txt: str, scan_trips: int = 4) -> dict:
    """Tally per-device collective wire bytes from optimized-HLO text.
    ``scan_trips`` multiplies collectives inside while bodies (the scan
    over LWE positions prints its body once)."""
    per_line = []
    for line in txt.splitlines():
        m = _OP.search(line)
        if not m:
            continue
        shapes, kind = m.group(1), m.group(2)
        size = 0
        for dtype, dims in _SHAPE.findall(shapes):
            if dtype not in DTYPE_BYTES:
                continue
            s = DTYPE_BYTES[dtype]
            for d in dims.split(","):
                if d:
                    s *= int(d)
            size += s
        if not size:
            continue
        gm = _GROUPS.search(line)
        g = len(gm.group(1).split(",")) if gm else 2
        # collectives inside the scan over LWE positions run once per
        # iteration; the HLO prints the while body once
        trips = scan_trips if "while" in line else 1
        # shard-level tensor size S is the op's result size on one device;
        # ring costs per device:
        if kind == "all-reduce":
            wire = 2 * (g - 1) / g * size
        elif kind in ("all-gather",):
            wire = (g - 1) / g * size  # result is the gathered tensor
        elif kind == "reduce-scatter":
            wire = (g - 1) * size  # result is the scattered shard
        else:  # collective-permute / all-to-all: send one shard
            wire = size
        per_line.append(
            {"kind": kind, "bytes": size, "group": g, "trips": trips,
             "wire": wire * trips}
        )
    agg: dict = {}
    for r in per_line:
        a = agg.setdefault(r["kind"], {"count": 0, "wire_bytes": 0.0})
        a["count"] += 1
        a["wire_bytes"] += r["wire"]
    return {"ops": per_line, "by_kind": agg,
            "total_wire_bytes": sum(r["wire"] for r in per_line)}


def measure_single_chip_step() -> float:
    """Seconds per unsharded production step on the local backend (the
    real TPU chip under the session env)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from primus_fhe_tpu.boot.dcrt_blind_rotate import dcrt_blind_rotate_batched
    from primus_fhe_tpu.decompose import BigUintApproxSignedBasis
    from primus_fhe_tpu.numeric import to_u64_pair
    from primus_fhe_tpu.rns import RNSBase64
    from primus_fhe_tpu.transforms.dcrt import build_dcrt_plan64

    log_n, n_lwe, batch = 10, 4, 16
    n = 1 << log_n
    moduli = [1125899906826241, 1125899906629633]
    base = RNSBase64(moduli)
    basis = BigUintApproxSignedBasis(base, 25)
    plan = build_dcrt_plan64(log_n, moduli)
    level = basis.decompose_length
    k1 = 2
    rng = np.random.default_rng(1)
    q0 = min(moduli)
    bsk = to_u64_pair(rng.integers(
        0, q0, size=(n_lwe, k1, level, len(moduli), k1, n), dtype=np.uint64))
    acc = to_u64_pair(rng.integers(
        0, q0, size=(batch, len(moduli), k1, n), dtype=np.uint64))
    lwe = jnp.asarray(
        rng.integers(0, 2 * n, size=(batch, n_lwe + 1)).astype(np.int32))

    step = jax.jit(lambda l, a, b: dcrt_blind_rotate_batched(
        plan, basis, base, b, l, a))
    out = step(lwe, acc, bsk)
    jax.block_until_ready(out)

    def reps(r):
        t0 = time.perf_counter()
        o = None
        for _ in range(r):
            o = step(lwe, acc, bsk)
        jax.block_until_ready(o)
        return time.perf_counter() - t0

    r1, r2 = 2, 8
    _ = reps(r1)
    tas, tbs = [], []
    for _ in range(3):
        tas.append(reps(r1))
        tbs.append(reps(r2))
    return max(min(tbs) - min(tas), 1e-9) / (r2 - r1)


def main():
    import jax

    n_dev = 8
    hlo = collect_hlo_bytes(n_dev, residue=2)
    # mesh-shape contrast: the batch axis must be collective-free (pure
    # data parallel); the residue axis carries the CRT-compose traffic
    hlo_dp = collect_hlo_bytes(n_dev, residue=1)
    t1 = measure_single_chip_step()
    backend = jax.default_backend()

    wire = hlo["total_wire_bytes"]
    t_comm = wire / ICI_BYTES_PER_S
    t_comp = t1 / n_dev
    eff_exposed = t_comp / (t_comp + t_comm)
    # measured overlap factor at d=2 (bench_overlap.py): the explicit
    # schedule issues all compose psums before level compute, hiding part
    # of the collective time behind it; 1.40x step win corresponds to
    # ~0.29 of the combined time hidden.  Apply conservatively to comm.
    overlap_hidden = float(os.environ.get("OVERLAP_HIDDEN_FRACTION", 0.29))
    eff_overlap = t_comp / (t_comp + t_comm * (1 - overlap_hidden))

    record = {
        "metric": (
            "modeled scaling efficiency at 8 devices "
            "(production blind-rotation step, residue x batch mesh)"
        ),
        "value": eff_overlap,
        "value_fully_exposed": eff_exposed,
        "unit": "parallel efficiency (modeled)",
        "vs_baseline": eff_overlap / 0.8,
        "derivation": {
            "t_single_chip_step_s": t1,
            "t_single_chip_backend": backend,
            "t_compute_per_device_s": t_comp,
            "collectives_by_kind": hlo["by_kind"],
            "total_wire_bytes_per_device": wire,
            "ici_bytes_per_s_assumed": ICI_BYTES_PER_S,
            "t_comm_exposed_s": t_comm,
            "overlap_hidden_fraction_from_d2_measurement": overlap_hidden,
            "collective_count": sum(
                v["count"] for v in hlo["by_kind"].values()
            ),
            "mesh_contrast": {
                "residue2_batch4_wire_bytes": wire,
                "residue1_batch8_wire_bytes": hlo_dp["total_wire_bytes"],
                "note": (
                    "the batch (data-parallel) axis is collective-free; "
                    "all step traffic is residue-axis CRT compose"
                ),
            },
        },
    }
    print(json.dumps({k: v for k, v in record.items()
                      if k != "derivation"}))
    print(json.dumps(record["derivation"], indent=1), file=sys.stderr)
    rnd = os.environ.get("PRIMUS_ROUND", "03")
    with open(f"SCALING_MODEL_r{rnd}.json", "w") as f:
        json.dump(record, f, indent=1)


if __name__ == "__main__":
    main()
