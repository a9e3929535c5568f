"""Append the legacy TFHE-lib-geometry flagship row (round-over-round
comparable with BENCH_BOOT_r04's std128 row) to BENCH_BOOT_r05.json."""

import json
import sys

sys.path.insert(0, "/root/repo")

from bench_boot import tfhe_row  # noqa: E402
from primus_fhe_tpu.params import BOOLEAN_TFHE_LIB as BP  # noqa: E402

rec, _ = tfhe_row(
    "tfhe-lib-b64", BP.log_n, BP.glwe_dim, BP.log_basis, BP.level,
    BP.lwe_dim, 64, True,
)
rec["note"] = (
    "legacy TFHE-lib geometry (~2^98 core-SVP today, see params.py); "
    "round-over-round comparable with BENCH_BOOT_r04 std128-b64"
)
path = "/root/repo/BENCH_BOOT_r05.json"
rows = json.load(open(path))
rows = [r for r in rows if r["config"] != "tfhe-lib-b64"] + [rec]
with open(path, "w") as f:
    json.dump(rows, f, indent=1)
print(json.dumps(rec))
