"""TPU-native JPEG codec glue.

Implements the north-star split (BASELINE.json): serial entropy stages on
host in native C++ (Huffman decode of scans into quantised DCT coefficient
planes, and Huffman encoding of quantised coefficients into a baseline JPEG
bitstream), with the parallel math — dequantise+IDCT, YCbCr<->RGB, chroma
resampling, fDCT+quantise — running batched on TPU
(:mod:`imagekit_tpu.ops.dct`, :mod:`imagekit_tpu.ops.color`).

The C++ extension is built lazily from ``imagekit_tpu/codecs/native`` via
ctypes (no pybind11 in this environment). Until it is built — or if the
toolchain is unavailable — ``available()`` returns False and callers fall
back to the host library path (:mod:`imagekit_tpu.codecs.pil_backend`).
"""

from __future__ import annotations

import numpy as np

from imagekit_tpu.errors import TransformError


def available() -> bool:
    try:
        from imagekit_tpu.codecs.native import loader

        return loader.load() is not None
    except Exception:
        return False


def decode_to_coefficients(data: bytes):
    """Host C++: entropy-decode a baseline JPEG into per-component quantised
    coefficient planes + quant tables + sampling factors."""
    from imagekit_tpu.codecs.native import loader

    lib = loader.load()
    if lib is None:
        raise TransformError("native JPEG codec not available")
    return loader.decode_jpeg(data)


def decode_rgb(data: bytes) -> np.ndarray:
    """Full TPU-native decode: host entropy decode -> device dequant+IDCT +
    chroma upsample + YCbCr->RGB."""
    from imagekit_tpu.codecs.native import loader
    from imagekit_tpu.ops import dct as dct_ops

    comps = decode_to_coefficients(data)
    return dct_ops.decode_components_to_rgb(comps)


def encode_rgb(img: np.ndarray, quality: int) -> bytes:
    """Full TPU-native encode: device RGB->YCbCr + 4:2:0 subsample +
    fDCT+quantise -> host C++ Huffman bitstream."""
    from imagekit_tpu.codecs.native import loader
    from imagekit_tpu.ops import dct as dct_ops

    lib = loader.load()
    if lib is None:
        raise TransformError("native JPEG codec not available")
    planes, qtabs = dct_ops.encode_rgb_to_coefficients(img, quality)
    return loader.encode_jpeg(planes, qtabs, img.shape[1], img.shape[0])
