"""Residue number system: CRT bases and fast base conversion."""

from .base import RNSBase32, RNSBase64
from .converter import BaseConverter32, BaseConverter64

__all__ = ["RNSBase32", "RNSBase64", "BaseConverter32", "BaseConverter64"]
