"""Pallas TPU kernels for the hot ops.

- :mod:`imagekit_tpu.ops.pallas.resize_kernel` — fused two-pass separable
  plane resample: both matmul passes execute per image inside one kernel
  with the f32 intermediate held in VMEM, never round-tripping to HBM
  (the XLA einsum formulation materialises the (B, OH, W) intermediate).
"""
