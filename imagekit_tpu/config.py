"""Service configuration, output-format enum, and shared constants.

Parity with the reference ``src/config.rs``:

- ``ImageFormat`` lowercase string enum (``src/config.rs:10-27``)
- ``DEFAULT_QUALITY = 80`` / ``MIN_QUALITY = 1`` / ``MAX_QUALITY = 100``
  (``src/config.rs:31-37``)
- ``DEFAULT_CACHE_CONTROL`` / ``NO_CACHE_CONTROL`` (``src/config.rs:43-46``)
- ``ImageKitConfig`` with the same six fields + ``validate()``
  (``src/config.rs:55-123``)

TPU-specific additions (absent in the reference, kept out of the parity
surface): resolution-bucket geometry for the dynamic batcher and device-mesh
settings. These affect only *how* work is executed, never the HTTP contract
or cache keys.
"""

from __future__ import annotations

import enum
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Sequence

from imagekit_tpu.errors import ConfigError


class ImageFormat(str, enum.Enum):
    """Supported output formats (reference ``src/config.rs:13-17``)."""

    jpeg = "jpeg"
    webp = "webp"
    avif = "avif"

    def __str__(self) -> str:  # Display impl parity (src/config.rs:19-27)
        return self.value

    @classmethod
    def parse(cls, s: str) -> Optional["ImageFormat"]:
        """Lowercase serde-style parse; unknown strings map to None
        (matching the reference's upload-field parsing, ``src/lib.rs:271-274``)."""
        try:
            return cls(s)
        except ValueError:
            return None

    @property
    def mime(self) -> str:
        return _MIME[self]

    @property
    def extension(self) -> str:
        return self.value


_MIME = {
    ImageFormat.jpeg: "image/jpeg",
    ImageFormat.webp: "image/webp",
    ImageFormat.avif: "image/avif",
}

# Quality constants (reference src/config.rs:31-37)
DEFAULT_QUALITY = 80
MIN_QUALITY = 1
MAX_QUALITY = 100

# Cache-Control constants (reference src/config.rs:43-46)
DEFAULT_CACHE_CONTROL = "public, max-age=31536000, immutable"
NO_CACHE_CONTROL = "no-store"

# Hardcoded construction-time values in the reference entrypoint
# (src/main.rs:33-41): 8 MB input cap, 10 GB cache, webp default.
DEFAULT_MAX_INPUT_SIZE = 8 * 1024 * 1024
DEFAULT_MAX_CACHE_SIZE = 10 * 1024 * 1024 * 1024


@dataclass
class BatchConfig:
    """Dynamic-batcher knobs (TPU-native addition; see SURVEY.md §7).

    Requests are bucketed by (source bucket, target bucket, format) so XLA
    sees a small static set of shapes; a bucket flushes when it reaches
    ``max_batch`` or after ``max_delay_ms`` of queueing.
    """

    max_batch: int = 32
    # Ceiling on distinct compiled executables the engine will create at
    # runtime (warmup shapes don't count against it). Each executable
    # retains host+device memory for the life of the process — on the
    # tunnelled dev TPU ~65 MB each — so shape-diverse (or adversarial)
    # traffic must not compile unboundedly; shapes beyond the budget are
    # served by the host fallback forever.
    max_compiled_shapes: int = 32
    # Deadline for flushing a partial batch while the device is idle.
    max_delay_ms: float = 4.0
    # Absolute ceiling on queueing time: while the device is busy, partial
    # batches keep accumulating (bigger batches amortise the per-launch
    # transfer latency) but never beyond this.
    hard_delay_ms: float = 250.0
    # Pad-to-bucket geometry for source images (longest side). Keep the set
    # small — each (src, dst) pair is one compiled executable.
    source_buckets: Sequence[int] = (256, 512, 1024, 2048, 4096)
    target_buckets: Sequence[int] = (128, 256, 512, 1024, 2048)
    # Admission control: ceiling on the ESTIMATED queue-drain latency
    # (in-system requests / recent completion rate). Arrivals beyond it
    # shed with 429 + Retry-After instead of queueing unboundedly — the
    # engine-layer analogue of the reference's per-IP governor
    # (src/lib.rs:450-467), which bounds latency only per client. 0
    # disables shedding.
    max_queue_latency_s: float = 2.0


@dataclass
class ImageKitConfig:
    """Core service configuration (reference ``src/config.rs:55-92``)."""

    # HMAC secret for URL signature verification.
    secret: str = ""
    # Filesystem path for persistent cache storage.
    cache_dir: Path = field(default_factory=lambda: Path("./cache"))
    # Maximum input image size in bytes.
    max_input_size: int = DEFAULT_MAX_INPUT_SIZE
    # Maximum cache size in bytes before LRU eviction (None = unbounded).
    max_cache_size: Optional[int] = DEFAULT_MAX_CACHE_SIZE
    # Permitted output formats.
    allowed_formats: Sequence[ImageFormat] = (
        ImageFormat.jpeg,
        ImageFormat.webp,
        ImageFormat.avif,
    )
    # Default format when the client doesn't specify one.
    default_format: Optional[ImageFormat] = ImageFormat.webp

    # --- TPU-native extensions (not part of the reference surface) ---
    batch: BatchConfig = field(default_factory=BatchConfig)
    # Serving cache backend: "disk" (reference's live path) or "kv" (the
    # SledCache-equivalent with LRU eviction — actually usable here, unlike
    # the reference where it is orphaned; SURVEY.md §2.4.8).
    cache_backend: str = "disk"
    # Enforce max_input_size on POST /upload multipart bodies as well.
    # The reference only enforces it on remote fetch (src/fetch.rs:93-97);
    # BASELINE config #3 calls for an 8MB input cap on upload, so we default
    # to enforcing and document the divergence (SURVEY.md §3.3).
    enforce_upload_cap: bool = True
    # Honour X-Forwarded-For when rate limiting. The reference's
    # tower_governor keys on the actual peer address; trusting XFF from an
    # arbitrary client lets it rotate limiter keys freely, so this is off
    # unless the operator states the service sits behind a trusted proxy
    # (IMAGEKIT_TRUST_PROXY=1).
    trust_proxy: bool = False

    def __post_init__(self) -> None:
        if isinstance(self.cache_dir, str):
            self.cache_dir = Path(self.cache_dir)

    def validate(self) -> None:
        """Startup validation (reference ``src/config.rs:115-123``)."""
        if not self.secret.strip():
            raise ConfigError("Secret cannot be empty")
        if self.max_input_size <= 0:
            raise ConfigError("Max input size must be > 0")

    @classmethod
    def from_env(cls) -> "ImageKitConfig":
        """Build config the way the reference entrypoint does
        (``src/main.rs:33-41``): ``IMAGEKIT_SECRET`` env with a local-dev
        default, everything else hardcoded. We additionally honour the
        aspirational env vars the reference documents in ``.env.example``
        but never reads (``IMAGEKIT_CACHE_DIR``, ``IMAGEKIT_CACHE_MAX_SIZE_GB``)."""
        secret = os.environ.get("IMAGEKIT_SECRET", "local-dev-secret")
        cache_dir = Path(os.environ.get("IMAGEKIT_CACHE_DIR", "./cache"))
        max_gb = float(os.environ.get("IMAGEKIT_CACHE_MAX_SIZE_GB", "10"))
        batch = BatchConfig()
        if "IMAGEKIT_MAX_COMPILED_SHAPES" in os.environ:
            # operational memory knob: each runtime-compiled executable
            # retains host memory for the process lifetime (see BatchConfig)
            batch.max_compiled_shapes = int(
                os.environ["IMAGEKIT_MAX_COMPILED_SHAPES"]
            )
        if "IMAGEKIT_MAX_QUEUE_LATENCY_S" in os.environ:
            batch.max_queue_latency_s = float(
                os.environ["IMAGEKIT_MAX_QUEUE_LATENCY_S"]
            )
        return cls(
            batch=batch,
            secret=secret,
            cache_dir=cache_dir,
            max_input_size=DEFAULT_MAX_INPUT_SIZE,
            max_cache_size=int(max_gb * 1024 * 1024 * 1024),
            allowed_formats=(ImageFormat.jpeg, ImageFormat.webp, ImageFormat.avif),
            default_format=ImageFormat.webp,
            cache_backend=os.environ.get("IMAGEKIT_CACHE_BACKEND", "disk"),
            trust_proxy=os.environ.get("IMAGEKIT_TRUST_PROXY", "") not in ("", "0"),
        )
