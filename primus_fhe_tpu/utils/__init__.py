"""Host-side exact integer utilities (trace-time / plan-time math)."""

from .gcd import xgcd, gcdinv, mod_inv, hensel_inv_pow2
from .bits import reverse_lsbs, bit_reverse_indices
from .primes import is_prime, next_ntt_prime, ntt_prime_chain

__all__ = [
    "xgcd",
    "gcdinv",
    "mod_inv",
    "hensel_inv_pow2",
    "reverse_lsbs",
    "bit_reverse_indices",
    "is_prime",
    "next_ntt_prime",
    "ntt_prime_chain",
]
