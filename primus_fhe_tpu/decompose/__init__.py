"""Approximate signed gadget decomposition (FHEW/TFHE-style)."""

from .primitive import ApproxSignedBasis32, ApproxSignedBasis64
from .big_integer import BigUintApproxSignedBasis

__all__ = ["ApproxSignedBasis32", "ApproxSignedBasis64", "BigUintApproxSignedBasis"]
