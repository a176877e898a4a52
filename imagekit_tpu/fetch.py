"""Remote source fetch with defense-in-depth validation.

Parity with the reference ``src/fetch.rs:38-124`` — six stages:

1. HTTP status check (non-2xx -> NetworkError)
2. Content-Type must be ``image/*`` *when parseable*; unknown types continue
   and are caught by decode validation (``src/fetch.rs:57-72``)
3. Content-Length preflight vs ``max_size`` (``src/fetch.rs:75-81``)
4. Streaming byte-count enforcement (header spoofing defence,
   ``src/fetch.rs:84-99``)
5. Decode validation (``src/fetch.rs:104-121``)
6. Non-zero dimension check

Divergences (deliberate fixes, SURVEY.md §2.4.9/§2.4.11): a single shared
client session instead of a per-request client, and the validation decode
returns the decoded pixels so the /img handler doesn't decode twice.
``allowed_formats`` is accepted and unused, exactly like the reference
(``src/fetch.rs:41``, SURVEY.md §2.4.7).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from imagekit_tpu.config import ImageFormat
from imagekit_tpu.errors import InvalidArgumentError, NetworkError


class Fetcher:
    """Shared-session remote fetcher. Subclass / substitute in tests for an
    offline backend (the reference's tests never reach the network;
    SURVEY.md §4)."""

    def __init__(self) -> None:
        self._session = None

    async def _get_session(self):
        import aiohttp

        if self._session is None or self._session.closed:
            self._session = aiohttp.ClientSession(
                timeout=aiohttp.ClientTimeout(total=30)
            )
        return self._session

    async def close(self) -> None:
        if self._session is not None and not self._session.closed:
            await self._session.close()

    async def fetch(self, url: str) -> Tuple[int, str, "_BodyStream"]:
        """Return (status, content_type, body stream). NetworkError on
        transport failure."""
        import aiohttp

        session = await self._get_session()
        try:
            resp = await session.get(url)
        except aiohttp.ClientError as e:
            raise NetworkError(str(e)) from e
        ct = resp.headers.get("Content-Type", "")
        return resp.status, ct, _AiohttpBody(resp)


class _BodyStream:
    async def content_length(self) -> Optional[int]:
        raise NotImplementedError

    async def chunks(self):
        raise NotImplementedError

    async def release(self) -> None:
        pass


class _AiohttpBody(_BodyStream):
    def __init__(self, resp) -> None:
        self._resp = resp

    async def content_length(self) -> Optional[int]:
        return self._resp.content_length

    async def chunks(self):
        async for chunk in self._resp.content.iter_chunked(64 * 1024):
            yield chunk

    async def release(self) -> None:
        self._resp.release()


async def fetch_source(
    url: str,
    max_size: int,
    allowed_formats: Sequence[ImageFormat],
    *,
    fetcher: Optional[Fetcher] = None,
) -> Tuple[bytes, str, Optional[np.ndarray]]:
    """Fetch + validate. Returns (bytes, content_type, decoded pixels —
    or None when validation was done by header parse and the engine should
    decode from bytes, taking the batched coefficient path).

    Raises NetworkError / InvalidArgumentError per the reference's error
    taxonomy; the /img handler maps both to 400 (``src/lib.rs:167-172``).
    """
    del allowed_formats  # accepted but unused — reference parity (fetch.rs:41)
    f = fetcher or _default_fetcher()
    status, ct, body = await f.fetch(url)
    try:
        # 1. status
        if not (200 <= status < 300):
            raise NetworkError(f"Upstream status: {status}")

        # 2. content-type when parseable must be image/*
        mime_main = ct.split(";", 1)[0].strip().lower()
        if "/" in mime_main and mime_main.split("/", 1)[0] != "image":
            raise InvalidArgumentError("Source is not an image")

        # 3. preflight content-length
        clen = await body.content_length()
        if clen is not None and clen > max_size:
            raise InvalidArgumentError("Input exceeds size limit")

        # 4. streaming enforcement
        buf = bytearray()
        async for chunk in body.chunks():
            if len(buf) + len(chunk) > max_size:
                raise InvalidArgumentError("Input exceeds size limit")
            buf.extend(chunk)
        data = bytes(buf)
    finally:
        await body.release()

    # 5+6. decode validation + dimension check. JPEG/WebP/AVIF validate by
    # a microsecond-class header parse and return ``pixels`` = None: the
    # full (single!) decode happens downstream on the engine's native
    # batched path (coefficient or YUV domain). The remaining formats
    # decode fully here and the pixels are returned so the handler never
    # decodes twice (fixes SURVEY.md §2.4.11); a header-validated source
    # that turns out to be corrupt past its header still 400s, from the
    # transform stage instead of here.
    from imagekit_tpu.errors import TransformError

    if data[:3] == b"\xff\xd8\xff":
        try:
            from imagekit_tpu.codecs.native import jpeg_abi, loader

            lib = loader.load()
            if lib is not None:
                hdr = jpeg_abi.parse(lib, data)
                if hdr.width <= 0 or hdr.height <= 0:
                    raise InvalidArgumentError("Invalid image dimensions")
                return data, ct, None
        except jpeg_abi.NativeJpegError:
            pass  # progressive / exotic: fall through to the full decode
        except InvalidArgumentError:
            raise
        except Exception:
            pass
    # WebP / AVIF: header-only dimension validation (same pattern) keeps
    # the bytes, so the engine decodes ONCE on the native YUV-domain path
    # instead of receiving pre-decoded RGB pixels here
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        try:
            from imagekit_tpu.codecs import vp8 as _vp8

            dims = _vp8.dimensions(data)
            if dims is not None and dims[0] > 0 and dims[1] > 0:
                return data, ct, None
        except Exception:
            pass
    if len(data) >= 12 and data[4:8] == b"ftyp":
        try:
            from imagekit_tpu.codecs import avif_native as _avif

            # dims-only probe (no iloc walk, no payload assembly) — the
            # full container parse happens later in the engine's codec
            # pool, never on the event loop
            dims = _avif.header_dimensions(data)
            if dims is not None:
                return data, ct, None
        except Exception:
            pass  # exotic container: fall through to the full decode

    from imagekit_tpu.codecs import decode_bytes

    try:
        img, _fmt = decode_bytes(data)
    except TransformError:
        raise InvalidArgumentError("Unable to decode image for validation")
    if img.shape[0] == 0 or img.shape[1] == 0:
        raise InvalidArgumentError("Invalid image dimensions")

    return data, ct, img


_GLOBAL_FETCHER: Optional[Fetcher] = None


def _default_fetcher() -> Fetcher:
    global _GLOBAL_FETCHER
    if _GLOBAL_FETCHER is None:
        _GLOBAL_FETCHER = Fetcher()
    return _GLOBAL_FETCHER
