"""Multi-limb (RNS product modulus) approximate signed decomposition.

Reference: ``crates/primus_decompose/src/big_integer/{basis,common}.rs`` —
``BigUintApproxSignedBasis`` decomposes values modulo an RNS product ``Q``
into *unsigned* digits in ``[0, B)`` plus a carry chain; the signed
correction happens downstream via the RNS centered lift
(``wrapping_decompose_small_values``), exactly as in the DCRT gadget product
(``crates/primus_lattice/src/glwe/dcrt.rs:178-343``).

Device representation: values are ``(..., L)`` uint32 limb arrays; digits
are uint32 (``log_basis <= 31`` supported, ample for FHE gadget bases).
Per-level window extraction reads at most two adjacent limbs with static
offsets (:func:`primus_fhe_tpu.numeric.bigint.big_shr_window`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..numeric.bigint import big_from_int, big_ge, big_add, big_shr_window
from ..rns.base import _RNSBaseCommon

_U32 = jnp.uint32


class BigUintApproxSignedBasis:
    """Signed basis over an RNS product modulus ``Q``."""

    def __init__(
        self,
        rns_base: _RNSBaseCommon,
        log_basis: int,
        reverse_length: int | None = None,
    ):
        if not 0 < log_basis <= 31:
            raise ValueError("log_basis must be in 1..=31")
        self.rns_base = rns_base
        modulus = rns_base.q_product
        self.log_basis = log_basis
        self.basis = 1 << log_basis
        self.basis_minus_one = self.basis - 1

        modulus_bits = modulus.bit_length()
        decompose_length = modulus_bits // log_basis
        drop_bits = modulus_bits - decompose_length * log_basis
        if reverse_length is not None:
            assert decompose_length >= reverse_length
            decompose_length = reverse_length
            drop_bits = modulus_bits - reverse_length * log_basis
        assert decompose_length > 0
        self.decompose_length = decompose_length
        self.drop_bits = drop_bits

        self.init_carry_mask_bit = drop_bits - 1 if drop_bits > 0 else None
        self.carry_mask = 2 if log_basis == 1 else (self.basis | (self.basis >> 1))

        # split threshold (basis.rs:88-135)
        if log_basis == 1:
            if drop_bits == 0:
                threshold = None
            else:
                value = ((1 << (decompose_length + 1)) - 1) << (drop_bits - 1)
                threshold = value if value < modulus else None
        else:
            value = 0
            for _ in range(decompose_length):
                value = (value << log_basis) | (self.basis_minus_one >> 1)
            if drop_bits > 0:
                value = ((value << 1) | 1) << (drop_bits - 1)
            else:
                value += 1
            threshold = value if value < modulus else None
        self.threshold_int = threshold
        self.adjust_add_int = (1 << modulus_bits) - modulus if threshold is not None else 0

        L = rns_base.big_len
        self.L = L
        if threshold is not None:
            self.threshold = jnp.asarray(big_from_int(threshold, L))
            self.adjust_add = jnp.asarray(big_from_int(self.adjust_add_int, L))
        self.shr_bits = [drop_bits + j * log_basis for j in range(decompose_length)]

        # scalars: (level,) big ints B^j * 2^drop; residues: (level, k)
        self.scalar_ints = [1 << s for s in self.shr_bits]
        self.scalars_residue_ints = [
            [s % q for q in rns_base.moduli_ints] for s in self.scalar_ints
        ]

    @property
    def approximate_error_bound(self) -> int:
        return 0 if self.drop_bits == 0 else 1 << (self.drop_bits - 1)

    # -- device ops ---------------------------------------------------------

    def init_value_carry(self, values):
        """``(..., L)`` limbs -> adjusted limbs + boolean carries."""
        v = values
        if self.threshold_int is not None:
            adj, _ = big_add(v, jnp.broadcast_to(self.adjust_add, v.shape))
            take = big_ge(v, jnp.broadcast_to(self.threshold, v.shape))
            v = jnp.where(take[..., None], adj, v)
        if self.init_carry_mask_bit is not None:
            bit = self.init_carry_mask_bit
            carries = ((v[..., bit // 32] >> (bit % 32)) & 1) != 0
        else:
            carries = jnp.zeros(v.shape[:-1], dtype=bool)
        return v, carries

    def unsigned_decompose_level(self, values, carries, level: int):
        """One unsigned digit: ``((v >> shr) & (B-1) + carry) & (B-1)``.

        Returns ``(digit_u32, next_carries)`` (common.rs:168-180).
        """
        shr = self.shr_bits[level]
        window = big_shr_window(values, shr, self.log_basis)
        temp = window + carries.astype(_U32)
        next_carry = (temp & _U32(self.carry_mask)) != 0
        digit = temp & _U32(self.basis_minus_one)
        return digit, next_carry

    @functools.partial(jax.jit, static_argnums=0)
    def unsigned_decompose(self, values):
        """All levels: digits stacked on a new leading axis, shape (level, ...)."""
        v, carries = self.init_value_carry(values)
        digits = []
        for lvl in range(self.decompose_length):
            d, carries = self.unsigned_decompose_level(v, carries, lvl)
            digits.append(d)
        return jnp.stack(digits, axis=0)
