"""Bootstrapping pipelines composed from the lattice layer."""

from . import circuit_bootstrap, dcrt_blind_rotate, gates, ntru_blind_rotate, ntru_gates
from .blind_rotate import (
    modulus_switch,
    blind_rotate,
    bootstrap,
    make_bootstrap_key,
    test_polynomial,
)

__all__ = [
    "circuit_bootstrap",
    "dcrt_blind_rotate",
    "gates",
    "ntru_blind_rotate",
    "ntru_gates",
    "modulus_switch",
    "blind_rotate",
    "bootstrap",
    "make_bootstrap_key",
    "test_polynomial",
]
