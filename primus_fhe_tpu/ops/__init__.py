"""Pallas TPU kernels — the "native" performance layer.

Each kernel here replaces one of the reference's SIMD backends (SURVEY.md
§2 native sub-components table): the AVX2/AVX-512 NTT stage kernels become
VMEM-resident fused butterfly pipelines, SIMD Barrett/Shoup multiplies
become u32 limb vector ops on the VPU.
"""
