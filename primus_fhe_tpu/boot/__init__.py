"""Bootstrapping pipelines composed from the lattice layer."""

from .blind_rotate import (
    modulus_switch,
    blind_rotate,
    bootstrap,
    make_bootstrap_key,
    test_polynomial,
)

__all__ = [
    "modulus_switch",
    "blind_rotate",
    "bootstrap",
    "make_bootstrap_key",
    "test_polynomial",
]
