"""Peak-throughput probe: BOOLEAN_128 flagship row at batch 128/256.

Appends rows to BENCH_BOOT_r05.json if they beat the batch-64 flagship
per-gate throughput.  Run alone (one TPU process at a time)."""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

from bench_boot import tfhe_row  # noqa: E402
from primus_fhe_tpu.params import BOOLEAN_128 as BP  # noqa: E402

batch = int(os.environ.get("B128_BATCH", "128"))
rec, _ = tfhe_row(
    f"std128-b{batch}", BP.log_n, BP.glwe_dim, BP.log_basis, BP.level,
    BP.lwe_dim, batch, True,
)
print(json.dumps(rec))
path = "/root/repo/BENCH_BOOT_r05.json"
rows = json.load(open(path))
rows = [r for r in rows if r["config"] != rec["config"]] + [rec]
with open(path, "w") as f:
    json.dump(rows, f, indent=1)
