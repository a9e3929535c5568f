#!/usr/bin/env python
"""Modeled multi-chip scaling efficiency curves (the ≥80% north star).

Real multi-chip hardware is unavailable here (one chip behind a tunnel),
so this produces the strongest available substitute: an analytic
bytes-over-ICI model whose inputs are all measured or compiler-derived,
not guessed — hardened per the round-3 verdict:

1. **Collective bytes** — the production-dim sharded blind-rotation step
   (``__graft_entry__.make_sharded_rotation_step``: N=1024, 2x50-bit RNS
   residues, L=4, batch=16, **n_lwe=128 compiled for real** — the
   full-length ``lax.scan`` is in the optimized HLO, no extrapolation)
   is compiled for each device count d in {2, 4, 8, 16} at TWO mesh
   shapes (residue=2 x batch=d/2, and the pure-data-parallel residue=1 x
   batch=d), and every collective in the optimized HLO is tallied with
   its shape, dtype, and group size.  Ring costs per device: all-reduce
   2(g-1)/g*S, all-gather (g-1)/g*S, reduce-scatter (g-1)*S_shard,
   permute/all-to-all S.
2. **Compute time, 1 chip** — the SAME step is timed on the real TPU at
   two scan lengths; the difference isolates seconds per CMux trip
   (dispatch constants cancel).  Per-device compute at d = t_trip/d
   (strong scaling over the residue x batch shards, collective-free per
   the HLO structure tests).
3. **Wire time** — per-device bytes / link bandwidth.  ICI sensitivity
   band {22.5, 45, 90} GB/s; overlap fraction measured at d=8 with the
   ACTUAL explicit program (wire-ablated A/B plus a standalone
   collective loop — see measure_overlap_d8).  The pessimistic corner
   (22.5 GB/s, zero overlap) is reported explicitly.
4. **Multi-host (DCN) term** — with the (batch outer, residue inner)
   mesh, the residue all-reduce groups (size 2) are intra-host on any
   sane placement, and the batch axis is collective-free, so ZERO step
   bytes cross DCN; the model also prices the adversarial placement
   (residue partners split across hosts, every wire byte on DCN at
   25 GB/s) so the claim is falsifiable rather than silent.

   efficiency(d) = t_comp(d) / (t_comp(d) + t_wire_exposed(d))

Writes ``SCALING_MODEL_r{PRIMUS_ROUND}.json`` with curves + derivation.
"""

import json
import os
import re
import subprocess
import sys
import time

ICI_BYTES_PER_S = 45e9  # v5e ICI, one link one-way (center of the band)
ICI_BAND = (22.5e9, 45e9, 90e9)
DCN_BYTES_PER_S = 25e9
N_LWE = 128
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


def collect_hlo_bytes(n_devices: int, residue: int, program: str = "explicit") -> dict:
    """Compile the production step (n_lwe=128 scan) on ``n_devices``
    virtual CPU devices with a ``residue x (n_devices/residue)`` mesh;
    parse per-device collective wire bytes from the optimized HLO.
    ``program``: "explicit" (the shard_map step — split-limb compose
    psums, sharded compose compute) or "autospmd" (GSPMD partitioning —
    packed all-gather + REPLICATED compose compute)."""
    code = f"""
import os, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count={n_devices}"
if {program!r} == "autospmd":
    os.environ["PRIMUS_DRYRUN_AUTOSPMD"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})
from __graft_entry__ import make_sharded_rotation_step
step, (lwe, acc, bsk), _ = make_sharded_rotation_step(
    {n_devices}, log_n=10, n_lwe={N_LWE}, batch=16, residue={residue})
txt = step.lower(lwe, acc, bsk).compile().as_text()
print("<<<HLO>>>")
print(txt)
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1500, check=True,
    )
    txt = out.stdout.split("<<<HLO>>>", 1)[1]
    return parse_collective_bytes(txt, scan_trips=N_LWE)


def parse_collective_bytes(txt: str, scan_trips: int = N_LWE) -> dict:
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
        trips = scan_trips if "while" in line else 1
        if kind == "all-reduce":
            wire = 2 * (g - 1) / g * size
        elif kind == "all-gather":
            wire = (g - 1) / g * size
        elif kind == "reduce-scatter":
            wire = (g - 1) * size
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


def measure_trip_seconds() -> tuple[float, str]:
    """Seconds per CMux trip of the unsharded production step on the
    local backend (real TPU under the session env): difference of two
    scan lengths cancels dispatch/fetch constants."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from primus_fhe_tpu.boot.dcrt_blind_rotate import dcrt_blind_rotate_batched
    from primus_fhe_tpu.decompose import BigUintApproxSignedBasis
    from primus_fhe_tpu.numeric import to_u64_pair
    from primus_fhe_tpu.rns import RNSBase64
    from primus_fhe_tpu.transforms.dcrt import build_dcrt_plan64

    log_n, batch = 10, 16
    n = 1 << log_n
    moduli = [1125899906826241, 1125899906629633]
    base = RNSBase64(moduli)
    basis = BigUintApproxSignedBasis(base, 25)
    plan = build_dcrt_plan64(log_n, moduli)
    level = basis.decompose_length
    k1 = 2
    rng = np.random.default_rng(1)
    q0 = min(moduli)
    acc = to_u64_pair(rng.integers(
        0, q0, size=(batch, len(moduli), k1, n), dtype=np.uint64))

    def make(n_lwe):
        bsk = to_u64_pair(rng.integers(
            0, q0, size=(n_lwe, k1, level, len(moduli), k1, n),
            dtype=np.uint64))
        lwe = jnp.asarray(
            rng.integers(0, 2 * n, size=(batch, n_lwe + 1)).astype(np.int32))
        step = jax.jit(lambda l, a, b: dcrt_blind_rotate_batched(
            plan, basis, base, b, l, a))
        jax.block_until_ready(step(lwe, acc, bsk))

        def reps(r):
            t0 = time.perf_counter()
            o = None
            for _ in range(r):
                o = step(lwe, acc, bsk)
            jax.block_until_ready(o)
            return time.perf_counter() - t0

        return reps

    short, long_ = make(4), make(16)
    _ = short(2), long_(2)
    ts, tl = [], []
    for _i in range(3):
        ts.append(short(6))
        tl.append(long_(6))
    # 6 reps x (16-4) extra trips
    t_trip = max(min(tl) - min(ts), 1e-9) / (6 * 12)
    import jax as _j

    return t_trip, _j.default_backend()


def measure_overlap_d8(n_devices=8, residue=2, n_lwe=16) -> dict:
    """Overlap fraction measured at d=8 with the ACTUAL explicit program
    (round-4 verdict item: no more d=2 extrapolation).

    Three timings on the same 8-virtual-CPU-device mesh:
      t_full    — the explicit sharded rotation step as compiled;
      t_ablated — identical program with the compose wire ablated
                  (PRIMUS_ABLATE_COMPOSE=1: scatter -> static slice,
                  gather -> local tile; every local op kept);
      t_coll    — a standalone loop of the same psum_scatter+all_gather
                  payloads on the same mesh.
    exposed = (t_full - t_ablated) / t_coll; hidden = 1 - exposed.
    CPU collectives are memcpys, so this measures the SCHEDULER's
    ability to hide the collective behind the level compute — the same
    mechanism that hides ICI DMAs on TPU — not ICI itself; the model
    also always reports the zero-overlap rows.
    """
    def run(env_extra, mode):
        code = f"""
import os, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count={n_devices}"
{env_extra}
import jax, time
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})
import jax.numpy as jnp
if {mode!r} == "coll":
    import numpy as np
    from primus_fhe_tpu.parallel.mesh import make_mesh
    from jax.sharding import PartitionSpec as P
    mesh = make_mesh({n_devices}, residue={residue})
    x = jnp.asarray(np.random.randint(0, 1 << 29, size=({n_devices}, 4, 1024, 4), dtype=np.int64).astype(np.uint32))
    def body(x):
        for _ in range({n_lwe} * 2):  # k1=2 composes per trip
            s = jax.lax.psum_scatter(x, "residue", scatter_dimension=2, tiled=True)
            x = jax.lax.all_gather(s, "residue", axis=2, tiled=True)
        return x
    fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=P("batch"), out_specs=P("batch"), check_vma=False))
    out = jax.block_until_ready(fn(x))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5): out = fn(x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 5
        best = dt if best is None else min(best, dt)
    print("RESULT", best)
else:
    from __graft_entry__ import make_sharded_rotation_step
    step, (lwe, acc, bsk), _ = make_sharded_rotation_step(
        {n_devices}, log_n=10, n_lwe={n_lwe}, batch=16, residue={residue})
    out = jax.block_until_ready(step(lwe, acc, bsk))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5): out = step(lwe, acc, bsk)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 5
        best = dt if best is None else min(best, dt)
    print("RESULT", best)
"""
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=1500,
                             check=True)
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                return float(line.split()[1])
        raise RuntimeError(out.stdout + out.stderr[-500:])

    t_full = run("", "full")
    t_abl = run('os.environ["PRIMUS_ABLATE_COMPOSE"] = "1"', "full")
    t_coll = run("", "coll")
    delta = t_full - t_abl
    # Conclusive only when the collective share is resolvable: on this
    # host the standalone collectives are a sub-percent sliver of the
    # CPU step, far below run-to-run noise — then NO overlap credit is
    # claimed (hidden=None) and the model's headline stays zero-overlap.
    conclusive = t_coll > 0.02 * t_full and delta > 0
    exposed = max(delta, 0.0) / max(t_coll, 1e-12)
    hidden = min(max(1.0 - exposed, 0.0), 1.0) if conclusive else None
    print(f"[scaling_model] d=8 overlap: full={t_full*1e3:.1f}ms "
          f"ablated={t_abl*1e3:.1f}ms coll={t_coll*1e3:.1f}ms "
          f"conclusive={conclusive} hidden={hidden}", file=sys.stderr)
    return {"t_full_s": t_full, "t_ablated_s": t_abl,
            "t_collective_standalone_s": t_coll,
            "conclusive": conclusive,
            "note": ("collective share below host noise floor; no "
                     "overlap credit claimed" if not conclusive else
                     "measured at d=8 with the explicit program"),
            "hidden_fraction": hidden}


def main():
    t_trip, backend = measure_trip_seconds()
    print(f"[scaling_model] t_trip={t_trip*1e6:.1f} us backend={backend}",
          file=sys.stderr)

    if "OVERLAP_HIDDEN_FRACTION" in os.environ:
        overlap_meas = float(os.environ["OVERLAP_HIDDEN_FRACTION"])
        overlap_src = {"source": "env override", "hidden_fraction": overlap_meas}
    else:
        overlap_src = measure_overlap_d8()
        overlap_meas = overlap_src["hidden_fraction"]
    claim_overlap = overlap_meas is not None
    curves = []
    for d in (2, 4, 8, 16):
        for residue, program in ((2, "explicit"), (2, "autospmd"), (1, "explicit")):
            if residue > d:
                continue
            hlo = collect_hlo_bytes(d, residue, program)
            wire = hlo["total_wire_bytes"]
            t_comp = N_LWE * t_trip / d
            cell = {
                "devices": d,
                "program": program,
                "mesh": {"residue": residue, "batch": d // residue},
                "wire_bytes_per_device": wire,
                "collectives_by_kind": hlo["by_kind"],
                "efficiency": {},
            }
            ov_rows = [("no_overlap", 0.0)]
            if claim_overlap:
                ov_rows.append(("measured_overlap", overlap_meas))
            else:
                # continuity with the r3/r4 sensitivity band; clearly a
                # hypothesis, never the headline
                ov_rows.append(("hypothetical_overlap29", 0.29))
            for ici in ICI_BAND:
                for ov_name, ov in ov_rows:
                    t_wire = wire / ici * (1 - ov)
                    cell["efficiency"][f"ici_{ici/1e9:g}GBps_{ov_name}"] = (
                        t_comp / (t_comp + t_wire)
                    )
            # adversarial multi-host placement: every wire byte on DCN
            t_dcn = wire / DCN_BYTES_PER_S
            cell["efficiency"]["adversarial_all_DCN_25GBps_no_overlap"] = (
                t_comp / (t_comp + t_dcn)
            )
            curves.append(cell)
            print(f"[scaling_model] d={d} residue={residue} {program} "
                  f"wire={wire/1e6:.2f}MB/dev "
                  f"eff(center)={cell['efficiency']['ici_45GBps_no_overlap']:.3f}",
                  file=sys.stderr)

    # headline: d=8, residue=2, the EXPLICIT production program
    pick = next(c for c in curves
                if c["devices"] == 8 and c["mesh"]["residue"] == 2
                and c["program"] == "explicit")
    # headline: zero-overlap credit unless the d=8 overlap measurement
    # was conclusive (the >=80% north star must hold EXPOSED)
    eff_headline = pick["efficiency"][
        "ici_45GBps_measured_overlap" if claim_overlap
        else "ici_45GBps_no_overlap"
    ]
    eff_worst = min(
        v for c in curves
        if c["mesh"]["residue"] == 2 and c["program"] == "explicit"
        for k, v in c["efficiency"].items()
        if "adversarial" not in k and "hypothetical" not in k
    )
    eff_worst_corner = pick["efficiency"]["ici_22.5GBps_no_overlap"]

    record = {
        "metric": (
            "modeled scaling efficiency (production blind-rotation step, "
            "n_lwe=128 scan compiled, residue x batch mesh, d=2..16)"
        ),
        "value": eff_headline,
        "value_pessimistic_corner_d8": eff_worst_corner,
        "value_worst_in_band_all_d": eff_worst,
        "unit": "parallel efficiency (modeled)",
        "vs_baseline": eff_headline / 0.8,
        "derivation": {
            "t_trip_single_chip_s": t_trip,
            "t_single_chip_backend": backend,
            "n_lwe_compiled": N_LWE,
            "ici_band_bytes_per_s": list(ICI_BAND),
            "dcn_bytes_per_s": DCN_BYTES_PER_S,
            "overlap_hidden_fraction_measured_d8": overlap_src,
            "program_note": (
                "explicit = the shard_map production step (sharded "
                "compose compute; round-5 packed-floor compose: W-bit "
                "limb reduce-scatter at the packed size + packed-word "
                "all-gather); autospmd = GSPMD partitioning of the same "
                "math (packed gather, REPLICATED compose compute)."
            ),
            "multi_host_note": (
                "batch axis is collective-free and residue groups have "
                "size 2: any placement keeping residue pairs intra-host "
                "sends ZERO step bytes over DCN; the adversarial_all_DCN "
                "rows price the opposite placement"
            ),
            "curves": curves,
        },
    }
    print(json.dumps({k: v for k, v in record.items() if k != "derivation"}))
    rnd = os.environ.get("PRIMUS_ROUND", "04")
    with open(f"SCALING_MODEL_r{rnd}.json", "w") as f:
        json.dump(record, f, indent=1)


if __name__ == "__main__":
    main()
