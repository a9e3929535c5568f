"""Modular arithmetic: modulus types, functional ops, Shoup factors.

Collapses the reference's four crates of trait plumbing (``primus_reduce``
modulus-side traits, ``primus_modulo`` value-side mirrors, ``primus_modulus``
concrete types, ``primus_factor`` precomputed multipliers) into one
functional namespace over pytree modulus records — "which reduction" is a
function choice, not a type (SURVEY.md section 7).
"""

from .modulus import (
    BarrettModulus32,
    BarrettModulus64,
    NativeModulus32,
    NativeModulus64,
    PowOf2Modulus32,
    PowOf2Modulus64,
    barrett32,
    barrett64,
)
from .factor import ShoupFactor32, ShoupFactor64, shoup32, shoup64
from . import compact, modops

__all__ = [
    "BarrettModulus32",
    "BarrettModulus64",
    "NativeModulus32",
    "NativeModulus64",
    "PowOf2Modulus32",
    "PowOf2Modulus64",
    "barrett32",
    "barrett64",
    "ShoupFactor32",
    "ShoupFactor64",
    "shoup32",
    "shoup64",
    "modops",
]
