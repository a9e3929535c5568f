"""Round-4 probe: is the q<2^62 tier's 3.1x (vs 4x target) structural?

Two parts:

1. **Digit-system enumeration** (host math, exact): for every signed
   digit width d in {6..9} plus the mixed 7-byte + top-limb split, count
   the int8-MXU MAC volume per four-step pass and the elementwise fold
   ops per element.  The MAC volume is P_in * P_out * K per pass; P_out
   is forced to ceil(62/8)=8 by the WIDTH OF THE MATRIX ENTRIES (mod-q
   values need 8 balanced bytes no matter how the value side is split),
   so no byte-aligned system beats 8x8; non-byte widths (d=7) raise
   P_in/P_out to 9 AND make the split cost shifts-with-carries.

2. **Measured knockouts** (TPU): the full 60-bit fused fwd vs (a) a
   matmul-only skeleton at the same plane counts (the MXU-bound), (b)
   the VPU butterfly.  If skeleton >> full, the gap is elementwise fold
   work (which digit systems cannot reduce below ~2 u64 Shoups), not
   MAC volume — i.e. structural.

Outcome (recorded in ROUND_NOTES.md): MAC volume is already minimal at
the byte split; the measured elementwise share is the remainder.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scratch")


def enumerate_digit_systems():
    print("== digit-system enumeration (q < 2^62, four-step pass) ==")
    print(f"{'system':<28} {'P_in':>4} {'P_out':>4} {'MACs/K':>7} {'split':>18}")
    rows = []
    for d in (6, 7, 8, 9):
        p_in = -(-62 // d)  # value planes at width d
        # matrix entries are mod-q values < 2^62: output planes at width d
        p_out = -(-62 // d)
        # i8 MXU takes digits up to 8 bits; wider needs 2 i8 planes each
        if d > 8:
            p_in *= 2
            p_out *= 2
        split = "shift+cast" if d == 8 else "shift+mask+carry"
        rows.append((f"signed base-2^{d}", p_in, p_out, p_in * p_out, split))
    # mixed: 7 byte planes (56 bits) + one 6-bit top limb
    rows.append(("7 bytes + 6-bit top limb", 8, 8, 64,
                 "shift+cast (+1 extract)"))
    # centered representatives [-q/2, q/2): still 61 bits -> 8 bytes
    rows.append(("centered byte split", 8, 8, 64, "shift+cast+sub"))
    for name, pi, po, macs, split in rows:
        print(f"{name:<28} {pi:>4} {po:>4} {macs:>7} {split:>18}")
    print("-> 50-bit tier is 7x7=49; NO q<2^62 system goes below 8x8=64")
    print("   (the matrix side needs 8 byte planes for 62-bit entries),")
    print("   so the MAC-volume overhead vs the 50-bit tier is fixed at")
    print("   64/49 = 1.31x.  The only reducible part is elementwise.")


def measured_knockouts():
    import jax
    import jax.numpy as jnp
    from ptime import timeit

    from primus_fhe_tpu.numeric.limb import to_u64_pair
    from primus_fhe_tpu.ops.ntt_mxu8 import (
        Mxu8NttPlan64,
        mxu8_fused_forward64,
    )
    from primus_fhe_tpu.ops.ntt_pallas import PallasNttPlan64, pallas_forward64

    q = 1152921504606830593  # 60-bit golden prime
    log_n, batch = 12, 64
    n = 1 << log_n
    rng = np.random.default_rng(0)
    x = to_u64_pair(rng.integers(0, q, size=(batch, n), dtype=np.uint64))

    plan = Mxu8NttPlan64(log_n, q)
    vplan = PallasNttPlan64(log_n, q)

    full = jax.jit(lambda v: mxu8_fused_forward64(plan, v, 1).lo)
    vpu = jax.jit(lambda v: pallas_forward64(vplan, v, 1).lo)

    # matmul-only skeleton: the two dots + byte splits, no folds/twiddle
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from primus_fhe_tpu.ops.ntt_mxu import _DOT
    from primus_fhe_tpu.ops.ntt_mxu8 import _split_bytes_list

    A, B, Pn = plan.A, plan.B, plan.planes
    tile = 16

    def skel_kernel(w1_ref, w2_ref, vlo_ref, vhi_ref, olo_ref, ohi_ref):
        cs = tile
        parts = []
        for p in range(cs):
            sl = vlo_ref[p * A : (p + 1) * A, :]
            sh = vhi_ref[p * A : (p + 1) * A, :]
            parts.append(jnp.concatenate(_split_bytes_list(sl, sh, Pn), axis=0))
        x8 = jnp.concatenate(parts, axis=1)
        o1 = _DOT(w1_ref[:], x8)
        # re-split o1's low bytes as a stand-in for the twiddled value
        a2_parts = []
        for p in range(cs):
            lanes = slice(p * B, (p + 1) * B)
            lo = o1[:A, lanes].astype(jnp.uint32)
            hi = o1[A : 2 * A, lanes].astype(jnp.uint32)
            a2_parts.append(
                jnp.concatenate(_split_bytes_list(lo, hi, Pn), axis=1)
            )
        a2 = jnp.concatenate(a2_parts, axis=0)
        o2 = _DOT(a2, w2_ref[:])
        olo_ref[:] = o2[:, :B].astype(jnp.uint32)
        ohi_ref[:] = o2[:, B : 2 * B].astype(jnp.uint32)

    bp = batch
    w_spec = lambda s: pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((tile * A, B), lambda i: (i, 0), memory_space=pltpu.VMEM)
    skel = jax.jit(
        lambda vlo, vhi: pl.pallas_call(
            skel_kernel,
            grid=(bp // tile,),
            in_specs=[w_spec(plan.w1f.shape), w_spec(plan.w2f.shape)] + [v_spec] * 2,
            out_specs=[v_spec] * 2,
            out_shape=[jax.ShapeDtypeStruct((bp * A, B), jnp.uint32)] * 2,
        )(plan.w1f, plan.w2f, vlo, vhi)[0]
    )

    vlo = x.lo.reshape(bp * A, B)
    vhi = x.hi.reshape(bp * A, B)

    def reps(f, *args):
        def go(r):
            o = None
            for _ in range(r):
                o = f(*args)
            return float(jnp.sum(o, dtype=jnp.uint32))
        return go

    t_full = timeit(reps(full, x), r1=32, r2=128, tries=4)
    t_vpu = timeit(reps(vpu, x), r1=32, r2=128, tries=4)
    t_skel = timeit(reps(skel, vlo, vhi), r1=32, r2=128, tries=4)
    print(f"\n== measured (n={n}, 60-bit golden prime, batch={batch}) ==")
    print(f"VPU butterfly fwd:      {t_vpu*1e6:9.1f} us  ({batch/t_vpu:,.0f}/s)")
    print(f"8-plane MXU fused fwd:  {t_full*1e6:9.1f} us  ({batch/t_full:,.0f}/s)"
          f"  = {t_vpu/t_full:.2f}x butterfly")
    print(f"matmul-only skeleton:   {t_skel*1e6:9.1f} us  ({batch/t_skel:,.0f}/s)"
          f"  = {t_full/t_skel:.2f}x headroom over full")
    print(
        "\nelementwise share of the fused kernel "
        f"~= {(t_full - t_skel) / t_full:.0%}; a digit system can only touch"
    )
    print("the MAC term (already minimal at 8x8) — the 3.1x is structural.")


if __name__ == "__main__":
    enumerate_digit_systems()
    measured_knockouts()
