"""Polynomial representations and coefficient-domain operations."""

from .poly import (
    poly_add32,
    poly_sub32,
    poly_neg32,
    poly_mul_scalar32,
    poly_mul_monomial32,
    poly_evaluate32,
    poly_add64,
    poly_sub64,
    poly_neg64,
    poly_mul_monomial64,
)

__all__ = [
    "poly_add32",
    "poly_sub32",
    "poly_neg32",
    "poly_mul_scalar32",
    "poly_mul_monomial32",
    "poly_evaluate32",
    "poly_add64",
    "poly_sub64",
    "poly_neg64",
    "poly_mul_monomial64",
]
