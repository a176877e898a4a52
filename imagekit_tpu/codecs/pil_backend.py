"""Host codec backend via PIL (libjpeg / libwebp / libavif).

The reference's encoders (``src/transform.rs:113-150``):

- JPEG: RGB input, quality clamped 1-100 (Rust ``image`` JPEG encoder,
  libjpeg-style Annex-K table scaling) — here libjpeg via PIL.
- WebP: RGB input, libwebp lossy at quality q — here the *same* libwebp
  via PIL, so the quality->quantiser mapping matches the reference's
  ``webp::Encoder::from_rgb(...).encode(q)`` (``src/transform.rs:134-136``).
- AVIF: RGBA input, AV1 at speed 4 / quality q (``src/transform.rs:143-145``)
  — here the direct libavif ctypes path (codecs/avif_encode.py) with PIL
  as its fallback. The serving default speed is 8 on libavif's scale
  (see AVIF_SPEED below); the reference's ravif speed-4 operating point
  is covered by the parity table in docs/PARITY_REPORT.md, not by the
  serving default.
"""

from __future__ import annotations

import io

import numpy as np
from PIL import Image

from imagekit_tpu.config import ImageFormat
from imagekit_tpu.errors import TransformError

import os

# ravif speed=4 in the reference; libavif/aom's speed knob uses a
# different scale. Default 8: measured 14 enc/s at 400px q80 on the
# 1-core dev host — inside the reference's published 10-25 RPS/core AVIF
# band — at a negligible quality cost vs 6 (<=0.07 dB, sizes within
# +-6%); speed 6 was 5.9 enc/s, below the band. Operators can trade
# further with IMAGEKIT_AVIF_SPEED (10 ~= 46 enc/s).
AVIF_SPEED = int(os.environ.get("IMAGEKIT_AVIF_SPEED", "8"))


def decode(data: bytes) -> np.ndarray:
    """Decode to HWC uint8, RGB or RGBA (alpha preserved when present)."""
    try:
        with Image.open(io.BytesIO(data)) as im:
            im.load()
            if im.mode in ("RGBA", "LA", "PA") or (
                im.mode == "P" and "transparency" in im.info
            ):
                im = im.convert("RGBA")
            else:
                im = im.convert("RGB")
            return np.asarray(im)
    except TransformError:
        raise
    except Exception as e:  # malformed data -> TransformError (parity)
        raise TransformError(str(e)) from e


def encode(img: np.ndarray, fmt: ImageFormat, quality: int) -> bytes:
    q = int(min(max(quality, 1), 100))
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    has_alpha = img.shape[2] == 4
    buf = io.BytesIO()
    try:
        if fmt == ImageFormat.jpeg:
            # to_rgb8 (src/transform.rs:123): drop alpha for JPEG
            pil = Image.fromarray(img[:, :, :3] if has_alpha else img, "RGB")
            pil.save(buf, "JPEG", quality=q)
        elif fmt == ImageFormat.webp:
            # to_rgb8 (src/transform.rs:131): the reference encodes RGB only.
            # cv2's libwebp binding measures ~2x faster than PIL's at the
            # same quality (identical codec + default method); fall back to
            # PIL if cv2 is unavailable.
            rgb = img[:, :, :3] if has_alpha else img
            try:
                import cv2

                ok, enc = cv2.imencode(
                    ".webp",
                    np.ascontiguousarray(rgb[:, :, ::-1]),
                    [int(cv2.IMWRITE_WEBP_QUALITY), q],
                )
                if not ok:
                    raise RuntimeError("cv2 webp encode failed")
                return enc.tobytes()
            except ImportError:
                pil = Image.fromarray(rgb, "RGB")
                pil.save(buf, "WEBP", quality=q, lossless=False)
        elif fmt == ImageFormat.avif:
            # to_rgba8 (src/transform.rs:140): AVIF keeps (real) alpha.
            # Primary: direct libavif ABI (codecs/avif_encode.py) — same
            # bitstream path the fused serving pipeline uses, so staged/
            # fallback outputs match the batched ones. PIL only if the
            # ABI self-check disabled the native path.
            from imagekit_tpu.codecs import avif_encode

            if avif_encode.available():
                try:
                    return avif_encode.encode_rgb(img, q)
                except ValueError:
                    pass  # let the host library decide

            if not has_alpha:
                rgba = np.concatenate(
                    [img, np.full(img.shape[:2] + (1,), 255, np.uint8)], axis=2
                )
            else:
                rgba = img
            try:
                pil = Image.fromarray(rgba, "RGBA")
                pil.save(buf, "AVIF", quality=q, speed=AVIF_SPEED)
            except Exception:
                # last resort: the in-process first-party AV1 encoder
                # (codecs/av1_image.py) — AVIF output survives with no
                # system AV1 encoder present at all
                return avif_encode.encode_rgb_firstparty(img, q)
        else:  # pragma: no cover
            raise TransformError(f"unsupported output format: {fmt}")
    except TransformError:
        raise
    except Exception as e:
        raise TransformError(str(e)) from e
    return buf.getvalue()
