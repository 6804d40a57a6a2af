"""Global numeric-precision defaults for the SLAM pipeline.

XLA's DEFAULT matmul/conv precision on TPU runs bf16 passes. For this
pipeline that is a CORRECTNESS hazard, measured twice:

- SSIM's variance terms E[x^2] - mu^2 cancel catastrophically through
  bf16 convolutions (mean SSIM 1.106 on a fixture eval — impossible);
- the 4x4 ``se3_exp(tau) @ T`` pose-composition chains (~50 retractions
  per tracked frame, plus mapping BA) random-walk under bf16 rounding:
  the surface-scene quality run measured ATE 17.6 cm at default
  precision vs **1.01 cm** with fp32 matmuls on the SAME v5e chip (CPU
  fp32 reference: 1.2 cm).

fp32 matmuls are also reference parity — the CUDA/torch reference
computes every pose/projection product in fp32. The performance cost
here is nil: the hot compute (Pallas blend, projection) is elementwise
VPU work or kernels with explicit precision; the default-precision
matmuls in the XLA graphs are 4x4 pose chains and small reductions.
"""

from __future__ import annotations


def enable_f32_matmuls() -> None:
    """Set fp32 as the default matmul precision (idempotent)."""
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
