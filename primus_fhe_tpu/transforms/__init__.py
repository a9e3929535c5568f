"""Negacyclic transforms: NTT plans, forward/inverse kernels, DCRT, torus FFT."""

from .plan import NttPlan32, NttPlan64, build_plan32, build_plan64
from .dcrt import (
    DcrtPlan32,
    DcrtPlan64,
    build_dcrt_plan32,
    build_dcrt_plan64,
    dcrt_forward32,
    dcrt_forward64,
    dcrt_inverse32,
    dcrt_inverse64,
)
from .torus import TorusConvolver32
from .fft import Complex128FftTable
from .ntt import (
    forward32,
    forward64,
    inverse32,
    inverse64,
    monomial32,
    monomial64,
    pointwise_mul32,
    pointwise_mul64,
    negacyclic_mul32,
    negacyclic_mul64,
)

__all__ = [
    "NttPlan32",
    "NttPlan64",
    "build_plan32",
    "build_plan64",
    "forward32",
    "forward64",
    "inverse32",
    "inverse64",
    "monomial32",
    "monomial64",
    "pointwise_mul32",
    "pointwise_mul64",
    "negacyclic_mul32",
    "negacyclic_mul64",
    "DcrtPlan32",
    "DcrtPlan64",
    "build_dcrt_plan32",
    "build_dcrt_plan64",
    "dcrt_forward32",
    "dcrt_forward64",
    "dcrt_inverse32",
    "dcrt_inverse64",
    "TorusConvolver32",
    "Complex128FftTable",
]
