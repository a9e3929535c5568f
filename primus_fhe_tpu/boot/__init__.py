"""Bootstrapping pipelines composed from the lattice layer."""

from . import gates
from .blind_rotate import (
    modulus_switch,
    blind_rotate,
    bootstrap,
    make_bootstrap_key,
    test_polynomial,
)

__all__ = [
    "gates",
    "modulus_switch",
    "blind_rotate",
    "bootstrap",
    "make_bootstrap_key",
    "test_polynomial",
]
