"""Bisect the TPU-only exactness failure in the reworked fused kernel."""

import sys

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from primus_fhe_tpu.golden.model import GoldenNtt
from primus_fhe_tpu.numeric import from_u64_pair, to_u64_pair
from primus_fhe_tpu.ops.ntt_mxu import (
    MxuNttPlan64,
    mxu_forward64,
    mxu_fused_forward64,
    mxu_fused_inverse64,
)


def check(name, got, exp):
    bad = got != exp
    n_bad = int(bad.sum())
    print(f"{name}: mismatches={n_bad}/{got.size}", flush=True)
    if n_bad:
        idx = np.argwhere(bad)[:4]
        for i in idx:
            i = tuple(i)
            print(f"   at {i}: got {got[i]} exp {exp[i]} diff {int(got[i])-int(exp[i])}")


def main():
    for log_n, q, tag in [
        (12, 1125899906826241, "solinas50"),
        (12, 562949953392641, "general49"),
        (10, 1125899906826241, "solinas50-n1024"),
    ]:
        n = 1 << log_n
        g = GoldenNtt(log_n, q)
        rng = np.random.default_rng(7)
        raw = rng.integers(0, q, size=(8, n), dtype=np.uint64)
        data = to_u64_pair(raw)
        exp = np.stack(
            [
                np.array(g.forward([int(x) for x in raw[i]]), dtype=np.uint64)
                for i in range(raw.shape[0])
            ]
        )
        for h1 in (None, 5):
            plan = MxuNttPlan64(log_n, q) if h1 is None else MxuNttPlan64(log_n, q, h1=h1)
            ein = from_u64_pair(mxu_forward64(plan, data, 1))
            check(f"{tag} h1={plan.log_n - (plan.B.bit_length()-1)} einsum fwd", ein, exp)
            for tile in (4, 8):
                fus = from_u64_pair(mxu_fused_forward64(plan, data, 1, tile))
                check(f"{tag} h1=? tile={tile} fused fwd", fus, exp)
        print("---", flush=True)


if __name__ == "__main__":
    main()
