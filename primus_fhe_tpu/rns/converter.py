"""Fast RNS base conversion (HPS-style).

Reference: ``crates/primus_rns/src/converter.rs:21-136`` — a converter
stores the output-by-input base-change matrix ``(Q/q_i) mod p_j``; a
conversion Shoup-adjusts each input residue by ``(Q/q_i)^-1 mod q_i`` and
takes one modular dot product per output modulus.

TPU design: the dot runs over the input-residue axis for *all* coefficients
at once — shape ``(in_k, N)`` -> ``(out_k, N)`` — which is precisely the
one cross-residue (cross-shard) contraction of an otherwise embarrassingly
parallel residue sharding (SURVEY.md §7 hard part 4).  Under a sharded mesh
the adjusted residues are all-gathered (or psum-reduced) over the residue
axis; see :mod:`primus_fhe_tpu.parallel`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..modular.factor import factor_mul32, factor_mul64
from ..modular.modops import dot32, dot64
from ..modular.modulus import BarrettModulus32, BarrettModulus64
from ..numeric.limb import U64, to_u64_pair
from .base import RNSBase32, RNSBase64

_U32 = jnp.uint32


class BaseConverter32:
    """Converter between two 32-bit RNS bases."""

    def __init__(self, input_base: RNSBase32, output_base: RNSBase32):
        self.input_base = input_base
        self.output_base = output_base
        matrix = np.array(
            [
                [p % pj for p in input_base.punctured_ints]
                for pj in output_base.moduli_ints
            ],
            dtype=np.uint32,
        )  # (out_k, in_k)
        self.matrix = jnp.asarray(matrix)

    @functools.partial(jax.jit, static_argnums=0)
    def fast_convert(self, residues_in):
        """``(in_k, ...)`` residues -> ``(out_k, ...)`` in the output base.

        Computes the representative ``sum_i |x (Q/q_i)^-1|_{q_i} (Q/q_i)``
        which may exceed the true value by a small multiple of Q (standard
        fast-conversion slack, identical to the reference).
        """
        ib, ob = self.input_base, self.output_base
        in_k = ib.count
        nd = residues_in.ndim - 1  # batch dims after the residue axis
        q_in = ib.modulus.value.reshape((in_k,) + (1,) * nd)
        f = jax.tree.map(
            lambda x: x.reshape((in_k,) + (1,) * nd), ib.inv_punctured
        )
        adjusted = factor_mul32(residues_in, f, q_in)  # (in_k, ...)
        # Move the residue axis last for the dot, broadcast over out_k.
        adj = jnp.moveaxis(adjusted, 0, -1)[None]  # (1, ..., in_k)
        mat = self.matrix.reshape((ob.count,) + (1,) * nd + (in_k,))
        m = jax.tree.map(
            lambda x: x.reshape((ob.count,) + (1,) * nd) if jnp.ndim(x) else x,
            ob.modulus,
        )
        return dot32(adj, mat, m)  # (out_k, ...)


class BaseConverter64:
    """Converter between two 62-bit RNS bases (U64 residues)."""

    def __init__(self, input_base: RNSBase64, output_base: RNSBase64):
        self.input_base = input_base
        self.output_base = output_base
        matrix = np.array(
            [
                [p % pj for p in input_base.punctured_ints]
                for pj in output_base.moduli_ints
            ],
            dtype=np.uint64,
        )
        self.matrix = to_u64_pair(matrix)  # (out_k, in_k)

    @functools.partial(jax.jit, static_argnums=0)
    def fast_convert(self, residues_in: U64) -> U64:
        """``U64 (in_k, ...)`` residues -> ``U64 (out_k, ...)``."""
        ib, ob = self.input_base, self.output_base
        in_k = ib.count
        nd = residues_in.lo.ndim - 1

        def r(tree, shape):
            return jax.tree.map(
                lambda x: x.reshape(shape) if jnp.ndim(x) else x, tree
            )

        q_in = r(ib.modulus.value, (in_k,) + (1,) * nd)
        f = r(ib.inv_punctured, (in_k,) + (1,) * nd)
        adjusted = factor_mul64(residues_in, f, q_in)
        adj = U64(
            jnp.moveaxis(adjusted.lo, 0, -1)[None],
            jnp.moveaxis(adjusted.hi, 0, -1)[None],
        )
        mat = r(self.matrix, (ob.count,) + (1,) * nd + (in_k,))
        m = r(ob.modulus, (ob.count,) + (1,) * nd)
        return dot64(adj, mat, m)
