"""Refresh the ntru-128-nand row in BENCH_BOOT_r05.json (fresh-noise
fix: encryptions at the profile's lwe_sigma).  Run alone."""

import json
import sys

sys.path.insert(0, "/root/repo")

from bench_boot import ntru_gate_row  # noqa: E402

rec = ntru_gate_row(True)
print(json.dumps(rec))
path = "/root/repo/BENCH_BOOT_r05.json"
rows = json.load(open(path))
rows = [r for r in rows if r["config"] != rec["config"]] + [rec]
with open(path, "w") as f:
    json.dump(rows, f, indent=1)
