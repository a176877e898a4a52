"""Device-plane compute ops (JAX/XLA/Pallas).

This package replaces the pixel work the reference delegates to the
``image``/``webp`` crates (SURVEY.md §2.2) with batched TPU pipelines:

- :mod:`imagekit_tpu.ops.resize` — separable Lanczos3/bilinear resampling as
  two matmuls (``out = W_v @ img @ W_h^T``), mapped onto the MXU.
- :mod:`imagekit_tpu.ops.color`  — JPEG BT.601 YCbCr <-> RGB, chroma 4:2:0.
- :mod:`imagekit_tpu.ops.dct`    — 8x8 fDCT/IDCT as matmuls + quantisation.
- :mod:`imagekit_tpu.ops.pallas` — fused Pallas kernels for the hot paths.
"""
