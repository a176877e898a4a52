"""imagekit_tpu — a TPU-native image transformation serving framework.

Re-implements the full capability surface of the reference Rust service
``Shreyas2409/Rust-Image-Transform`` ("imagekit") with a TPU-first design:

- Host plane: HTTP (aiohttp), HMAC-SHA256 URL signing, canonical-param SHA-256
  cache keys + ETags (byte-identical to the reference), remote fetch with
  streaming size enforcement, disk/KV caches, rate limiting, metrics, and
  serial entropy codecs (JPEG Huffman in native C++).
- Device plane: batched JAX/XLA/Pallas pipelines for IDCT, YCbCr<->RGB,
  Lanczos3/bilinear resampling (separable matmul formulation mapped onto the
  MXU), chroma subsampling and fDCT+quantise, with ``jax.sharding`` data
  parallelism over a device mesh.

Public API mirrors the reference's layer map (see SURVEY.md §1/§2):

- :mod:`imagekit_tpu.config`     — reference ``src/config.rs``
- :mod:`imagekit_tpu.signature`  — reference ``src/signature.rs``
- :mod:`imagekit_tpu.transform`  — reference ``src/transform.rs``
- :mod:`imagekit_tpu.fetch`      — reference ``src/fetch.rs``
- :mod:`imagekit_tpu.cache`      — reference ``src/cache/``
- :mod:`imagekit_tpu.serving`    — reference ``src/lib.rs`` (router/handlers)
- :mod:`imagekit_tpu.ops`        — the TPU compute plane (no reference analogue;
  replaces the ``image``/``webp`` crates' pixel work)
- :mod:`imagekit_tpu.parallel`   — mesh/sharding utilities (TPU-native scale-out)
"""

from imagekit_tpu.config import (  # noqa: F401
    DEFAULT_CACHE_CONTROL,
    DEFAULT_QUALITY,
    MAX_QUALITY,
    MIN_QUALITY,
    NO_CACHE_CONTROL,
    ImageFormat,
    ImageKitConfig,
)
from imagekit_tpu.errors import ImageKitError  # noqa: F401

__version__ = "0.1.0"
