"""Sweep CMUX_MXU_TILE for the N=2048 BOOLEAN_128 flagship row.

Run ONCE PER TILE in a fresh process (the tile is read at trace time and
burned into the jit cache — CLAUDE.md round-5 lesson):

    CMUX_MXU_TILE=8 python -c "import sys; sys.path.insert(0,'.'); \
        exec(open('scratch/sweep_cmux2048.py').read())"
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from bench_boot import tfhe_row  # noqa: E402
from primus_fhe_tpu.params import BOOLEAN_128 as BP  # noqa: E402

rec, _ = tfhe_row(
    f"std128-b64-tile{os.environ.get('CMUX_MXU_TILE', '16')}",
    BP.log_n, BP.glwe_dim, BP.log_basis, BP.level, BP.lwe_dim, 64, True,
)
print(rec)
