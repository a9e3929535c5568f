"""Collective/compute-overlapped sharded DCRT gadget product.

SURVEY.md §7 hard part 4: the CRT compose is the ONE cross-residue
contraction in an otherwise embarrassingly parallel residue sharding
(``crates/primus_rns/src/converter.rs:111-199`` is the reference's
analogous hot spot).  The auto-SPMD path (``parallel.sharded``) lets the
partitioner handle it, which lowers to an all-gather of the residues plus
a fully *replicated* compose on every device.  This module is the
explicit ``shard_map`` version, designed so the collective both shrinks
and overlaps with compute:

1. **Compose as a reduced sum of partial composes at the packed floor.**
   Each device folds only its own residues into the big-int accumulator
   (canonical ``< Q``); the cross-device sum runs as a reduce-scatter of
   W-bit limbs packed into u32 lanes (``W = 32 - ceil(log2 D)`` — sums
   of D such limbs are exact in u32, and the payload is the packed size
   for realistic (D, Q)), a SHARDED local carry walk + ``log2(D)``
   conditional subtracts of ``2^j * Q``, and a packed-word all-gather.
   The composed value is bit-identical to the sequential single-device
   compose (both are the unique canonical representative mod Q).
   Compose *compute* scales with the mesh instead of replicating, and
   the wire is below the GSPMD packed gather.

2. **One psum per GLWE component, all issued before any level compute.**
   The k+1 input components are independent until the final accumulation,
   so their compose collectives are data-independent of each other's
   decompose->NTT->MAC level loops.  Emitting every psum up front gives
   XLA's latency-hiding scheduler the full window: on TPU the async
   all-reduce for component r+1 rides ICI while component r's per-residue
   NTTs occupy the VPU.  (A single batched psum would minimize launches
   but leave nothing to overlap; k+1 small psums maximize the pipeline.)

The per-level work (digit extract, centered respread, NTT, MAC) touches
only device-local residues — zero communication, asserted by
``tests/test_collectives_hlo.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..modular.factor import ShoupFactor64, factor_mul64
from ..modular.modops import add64, mul64
from ..numeric.bigint import big_cond_sub, big_from_int, big_mul_u32_add
from ..numeric.limb import U64, u64_add, u64_lt, u64_select, u64_sub
from ..transforms.dcrt import DcrtPlan64, dcrt_forward64

_U32 = jnp.uint32


def _psum_bigint(partial, axis: str, n_limbs: int, q_multiples,
                 q_bits: int | None = None):
    """Exact cross-device big-int sum mod Q.

    ``partial``: ``(..., n_limbs)`` u32 limbs, canonical ``< Q`` on each
    device.  When the coefficient axis divides the group, a
    **reduce-scatter + local carry-walk + all-gather** replaces the
    all-reduce, and with ``q_bits`` (= Q.bit_length()) known the scatter
    leg ships **W-bit limbs packed into u32 lanes**, ``W = 32 -
    ceil(log2 D)`` — sums of D such limbs are exact in u32, so the
    payload is ``ceil(q_bits/W)`` words: the packed information floor
    for every realistic (D, Q) (e.g. the production 101-bit Q at D<=8
    ships 4 words, exactly the packed size, vs 10 for 16-bit halves).
    The gather leg ships the canonical result in ``ceil(q_bits/32)``
    packed words.  Without ``q_bits`` (or when the W-repack cannot hold
    the carry word) the 16-bit-halves form is used; when the coefficient
    axis does not divide the group, a plain halves all-reduce.
    Bit-identical in every case (all compute the unique canonical
    representative mod Q)."""
    import os

    g = jax.lax.psum(1, axis)  # group size (static under jit)
    n_coeff = partial.shape[-2] if partial.ndim >= 2 else 0
    use_rs = partial.ndim >= 2 and n_coeff % int(g) == 0
    # measurement aid (bench_scaling_model): ablate the wire while keeping
    # every local op — the scatter becomes a static slice, the gather a
    # tile.  Results are numerically WRONG; timing-only.
    ablate = os.environ.get("PRIMUS_ABLATE_COMPOSE") == "1"

    def cond_ladder(value):
        for mult in q_multiples:
            value = big_cond_sub(value, mult)
        return value

    def finish_halves(hv):
        carry = jnp.zeros(hv.shape[:-1], _U32)
        packed = []
        for j in range(2 * n_limbs):
            s = hv[..., j] + carry
            packed.append(s & 0xFFFF)
            carry = s >> 16
        limbs = [
            packed[2 * j] | (packed[2 * j + 1] << 16) for j in range(n_limbs)
        ]
        return cond_ladder(jnp.stack(limbs, axis=-1))

    log_g = (int(g) - 1).bit_length()
    W = 32 - log_g
    n_w = -(-int(q_bits) // W) if q_bits else 0
    narrow_ok = (
        use_rs
        and q_bits is not None
        and 0 < q_bits <= 32 * n_limbs
        and n_w * W + 32 <= 32 * n_limbs  # carry word must fit the pack
    )

    if not use_rs:
        halves = jnp.stack(
            [partial & 0xFFFF, partial >> 16], axis=-1
        ).reshape(*partial.shape[:-1], 2 * n_limbs)
        return finish_halves(jax.lax.psum(halves, axis))

    sc_dim = partial.ndim - 2  # the coefficient axis

    if not narrow_ok:
        halves = jnp.stack(
            [partial & 0xFFFF, partial >> 16], axis=-1
        ).reshape(*partial.shape[:-1], 2 * n_limbs)
        shard = jax.lax.psum_scatter(
            halves, axis, scatter_dimension=sc_dim, tiled=True
        )
        value = finish_halves(shard)
        return jax.lax.all_gather(value, axis, axis=sc_dim, tiled=True)

    mask_w = _U32((1 << W) - 1)

    # repack u32 limbs -> n_w W-bit limbs (u32 lanes)
    narrow = []
    for j in range(n_w):
        o = j * W
        i0, s = o // 32, o % 32
        w = partial[..., i0] >> s if s else partial[..., i0]
        if s + W > 32 and i0 + 1 < n_limbs:
            w = w | (partial[..., i0 + 1] << (32 - s))
        narrow.append(w & mask_w)
    narrow = jnp.stack(narrow, axis=-1)

    if ablate:
        shard = jax.lax.slice_in_dim(
            narrow, 0, n_coeff // int(g), axis=sc_dim
        ) * _U32(int(g))
    else:
        shard = jax.lax.psum_scatter(
            narrow, axis, scatter_dimension=sc_dim, tiled=True
        )  # exact: D * (2^W - 1) < 2^32

    # local carry walk over W-bit limb sums; the final carry is one extra
    # word at offset n_w*W (total < D*Q, bounded by the narrow_ok check)
    carry = jnp.zeros(shard.shape[:-1], _U32)
    ws = []
    for j in range(n_w):
        s = shard[..., j] + carry
        ws.append(s & mask_w)
        carry = s >> W
    ws.append(carry)

    # pack W-limbs back into u32 words
    limbs = [jnp.zeros(shard.shape[:-1], _U32) for _ in range(n_limbs)]
    for j, w in enumerate(ws):
        o = j * W
        i0, s = o // 32, o % 32
        limbs[i0] = limbs[i0] | (w << s if s else w)
        if s and i0 + 1 < n_limbs:
            limbs[i0 + 1] = limbs[i0 + 1] | (w >> (32 - s))
    value = cond_ladder(jnp.stack(limbs, axis=-1))

    # gather only the packed canonical words; top words of the full-width
    # layout are identically zero (value < Q < 2^q_bits)
    n_out = -(-int(q_bits) // 32)
    if ablate:
        gathered = jnp.concatenate([value[..., :n_out]] * int(g), axis=sc_dim)
    else:
        gathered = jax.lax.all_gather(
            value[..., :n_out], axis, axis=sc_dim, tiled=True
        )
    if n_out < n_limbs:
        pad = jnp.zeros(gathered.shape[:-1] + (n_limbs - n_out,), _U32)
        gathered = jnp.concatenate([gathered, pad], axis=-1)
    return gathered


def _make_gadget_local(axis, basis, plan_def, m_loc, L, level, small_mod,
                       q_multiples, q_ext, half_u, sm_u, use_mxu, dyn_shapes,
                       q_bits=None):
    """The per-device gadget-product body, reusable from other shard_map
    programs (the sharded blind rotation wraps it in a batch vmap inside
    its CMux scan).  Operands are UNBATCHED: ``glo/ghi (m_loc, k+1, N)``,
    ``klo/khi (k+1, level, m_loc, k+1, N)``; collectives reference
    ``axis`` and so must run under a mesh binding that axis name."""

    def gadget_local(glo, ghi, klo, khi, mod, ipf, p_limbs, p_shift,
                     dyn_loc, leaves):
        local_plan = jax.tree.unflatten(plan_def, leaves)
        k1 = glo.shape[-2]
        n = glo.shape[-1]

        def compose_partial(r):
            value = jnp.zeros((n, L + 1), _U32)
            for i in range(m_loc):
                f = ShoupFactor64(
                    U64(ipf.value.lo[i], ipf.value.hi[i]),
                    U64(ipf.quotient.lo[i], ipf.quotient.hi[i]),
                )
                qi = U64(mod.value.lo[i], mod.value.hi[i])
                prod = factor_mul64(U64(glo[i, r], ghi[i, r]), f, qi)
                value, _ = big_mul_u32_add(p_limbs[i], prod.lo, value)
                value, _ = big_mul_u32_add(p_shift[i], prod.hi, value)
                value = big_cond_sub(value, q_ext)
            return value

        # 1. local partial composes + ALL compose psums issued up front:
        #    each collective depends only on inputs, so on TPU the r+1
        #    all-reduce overlaps the r-th component's NTT/MAC compute.
        bigs = [
            _psum_bigint(compose_partial(r), axis, L + 1, q_multiples,
                         q_bits)[..., :L]
            for r in range(k1)
        ]

        q_loc = U64(
            mod.value.lo.reshape(m_loc, 1), mod.value.hi.reshape(m_loc, 1)
        )
        m_bc = jax.tree.map(lambda x: x.reshape(m_loc, 1, 1), mod)

        def respread(digit):  # (n,) u32 -> U64 (m_loc, n), centered lift
            db = U64(
                jnp.broadcast_to(digit[None], (m_loc, n)),
                jnp.zeros((m_loc, n), _U32),
            )
            if small_mod == 2:
                return db
            lifted = u64_add(u64_sub(q_loc, sm_u), db)
            return u64_select(u64_lt(db, half_u), db, lifted)

        # 2. per-component level loops: all residue-local, no collectives.
        acc = U64(jnp.zeros_like(glo), jnp.zeros_like(ghi))
        for r in range(k1):
            v, carries = basis.init_value_carry(bigs[r])
            for lvl in range(level):
                digit, carries = basis.unsigned_decompose_level(v, carries, lvl)
                resp = respread(digit)
                if use_mxu:
                    from ..ops.ntt_mxu8_dyn import mxu8_dyn_forward64

                    outs = [
                        mxu8_dyn_forward64(
                            tuple(t[i] for t in dyn_loc), dyn_shapes,
                            U64(resp.lo[i], resp.hi[i]), 1,
                        )
                        for i in range(m_loc)
                    ]
                    f = U64(
                        jnp.stack([o.lo for o in outs]),
                        jnp.stack([o.hi for o in outs]),
                    )
                else:
                    f = dcrt_forward64(local_plan, resp, 1)
                fb = U64(f.lo[:, None, :], f.hi[:, None, :])
                g = U64(klo[r, lvl], khi[r, lvl])
                acc = add64(acc, mul64(g, fb, m_bc), m_bc.value)
        return acc.lo, acc.hi

    return gadget_local


def make_sharded_gadget_product(
    mesh: Mesh,
    axis: str,
    basis,  # BigUintApproxSignedBasis
    plan: DcrtPlan64,
    rns_base,  # RNSBase64
    local_ntt: str = "auto",
):
    """Builds the overlapped sharded external product.

    Returns ``fn(crt_glwe, ggsw) -> DcrtGlwe`` (all :class:`U64`):
    ``crt_glwe`` ``(n_mod, k+1, N)`` coeff-domain residues sharded over
    ``axis`` on dim 0; ``ggsw`` ``(k+1, level, n_mod, k+1, N)`` NTT domain
    sharded over ``axis`` on dim 2; output ``(n_mod, k+1, N)`` NTT domain,
    residue-sharded.  Bit-identical to
    :func:`lattice.dcrt.crt_glwe_mul_dcrt_ggsw` (dcrt.rs:178-343 parity).
    Hold onto the returned fn — it owns the compiled SPMD program.

    ``local_ntt``: ``"mxu"`` routes the per-residue forward NTTs through
    the table-driven byte-radix MXU kernel (``ops/ntt_mxu8_dyn.py`` —
    per-residue tables ride the residue sharding, one SPMD program
    serves every modulus); ``"jnp"`` keeps the XLA-staged path;
    ``"auto"`` picks MXU on TPU when the moduli/shape qualify.
    """
    d = mesh.shape[axis]
    n_mod = rns_base.count
    assert n_mod % d == 0, "residue count must divide the mesh axis"
    m_loc = n_mod // d
    L = rns_base.big_len
    level = basis.decompose_length
    small_mod = int(basis.basis)
    q_prod = rns_base.q_product
    # conditional-subtract ladder taking < D*Q down to < Q
    log_d = max(0, d.bit_length() - 1)
    q_multiples = [
        jnp.asarray(big_from_int((1 << j) * q_prod, L + 1))
        for j in range(log_d - 1, -1, -1)
    ] or [jnp.asarray(big_from_int(q_prod, L + 1))]
    q_ext = jnp.asarray(big_from_int(q_prod, L + 1))

    half = (small_mod + 1) // 2
    half_u = U64(_U32(half & 0xFFFFFFFF), _U32((half >> 32) & 0xFFFFFFFF))
    sm_u = U64(_U32(small_mod & 0xFFFFFFFF), _U32((small_mod >> 32) & 0xFFFFFFFF))

    # table-driven MXU routing for the per-residue forward NTTs
    use_mxu = local_ntt == "mxu" or (
        local_ntt == "auto"
        and jax.default_backend() == "tpu"
        and plan.log_n >= 8
        and all((1 << 30) <= q < (1 << 62) for q in plan.moduli)
    )
    if use_mxu:
        from ..ops.ntt_mxu8_dyn import stack_dyn_tables

        dyn_stacked, dyn_shapes = stack_dyn_tables(plan.log_n, plan.moduli)
        dyn_specs = tuple(
            P(axis, *([None] * (np.ndim(t) - 1))) for t in dyn_stacked
        )
    else:
        dyn_stacked, dyn_specs, dyn_shapes = (), (), None

    # flatten the plan so every leading-(n_mod) leaf shards; monomial_base
    # (shape (n,)) replicates.
    plan_leaves, plan_def = jax.tree.flatten(plan)
    mono_ids = {id(plan.monomial_base)}
    plan_specs = tuple(
        P(None) if id(leaf) in mono_ids else P(axis, *([None] * (leaf.ndim - 1)))
        for leaf in plan_leaves
    )

    n_dyn = len(dyn_stacked)

    gadget_local = _make_gadget_local(
        axis, basis, plan_def, m_loc, L, level, small_mod,
        q_multiples, q_ext, half_u, sm_u, use_mxu, dyn_shapes,
        q_bits=q_prod.bit_length(),
    )

    def local_fn(glo, ghi, klo, khi, mod, ipf, p_limbs, p_shift, *rest):
        dyn_loc = rest[:n_dyn]  # per-device residue slices of dyn tables
        leaves = rest[n_dyn:]
        return gadget_local(
            glo, ghi, klo, khi, mod, ipf, p_limbs, p_shift, dyn_loc, leaves
        )

    sp_g = P(axis, None, None)
    sp_k = P(None, None, axis, None, None)
    sp_1 = P(axis)
    sp_2 = P(axis, None)
    fn = jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(
                sp_g, sp_g, sp_k, sp_k,
                jax.tree.map(lambda _: sp_1, rns_base.modulus),
                jax.tree.map(lambda _: sp_1, rns_base.inv_punctured),
                sp_2, sp_2,
            ) + dyn_specs + plan_specs,
            out_specs=(sp_g, sp_g),
            check_vma=False,
        )
    )

    def run(crt_glwe: U64, ggsw: U64) -> U64:
        lo, hi = fn(
            crt_glwe.lo, crt_glwe.hi, ggsw.lo, ggsw.hi,
            rns_base.modulus, rns_base.inv_punctured,
            rns_base.punctured_limbs, rns_base.punctured_limbs_shift,
            *(jnp.asarray(t) for t in dyn_stacked), *plan_leaves,
        )
        return U64(lo, hi)

    run.compiled = fn  # expose for HLO inspection in tests
    return run


def shard_gadget_inputs(mesh: Mesh, axis: str, crt_glwe: U64, ggsw: U64):
    """Places the gadget-product operands onto the mesh (residue axis on
    dim 0 of the GLWE, dim 2 of the GGSW)."""
    sh_g = NamedSharding(mesh, P(axis, None, None))
    sh_k = NamedSharding(mesh, P(None, None, axis, None, None))
    return (
        jax.tree.map(lambda x: jax.device_put(x, sh_g), crt_glwe),
        jax.tree.map(lambda x: jax.device_put(x, sh_k), ggsw),
    )
