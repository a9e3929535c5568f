"""FHE noise samplers (binary / ternary / discrete Gaussian)."""

from .sampling import (
    sample_binary,
    sample_ternary,
    sample_uniform,
    sample_uniform_u64,
    DiscreteGaussian,
    sample_crt_binary,
    sample_crt_ternary,
    sample_crt_gaussian,
)
from .ziggurat import (
    DiscreteZiggurat,
    HighPrecisionCDT,
    make_discrete_gaussian,
)

__all__ = [
    "sample_binary",
    "sample_ternary",
    "sample_uniform",
    "sample_uniform_u64",
    "DiscreteGaussian",
    "DiscreteZiggurat",
    "HighPrecisionCDT",
    "make_discrete_gaussian",
    "sample_crt_binary",
    "sample_crt_ternary",
    "sample_crt_gaussian",
]
