#!/usr/bin/env python3
"""Mutation fuzz of the native codec entry points.

Generates valid JPEG/PNG/GIF/BMP/WebP samples, applies random byte
mutations/truncations, and feeds them to every native parse/decode entry.
Run against the ASan build for memory-safety evidence:

    make -C imagekit_tpu/codecs/native asan
    LD_PRELOAD=$(g++ -print-file-name=libasan.so) ASAN_OPTIONS=detect_leaks=0 \
        IMAGEKIT_NATIVE_LIB=imagekit_tpu/codecs/native/libik_native_asan.so \
        python tools/fuzz_codecs.py --iters 2000

Any crash aborts the process (non-zero exit); clean exit = no
memory-safety findings for this corpus. Decode errors (negative return
codes / ValueError) are the EXPECTED outcome for mutated inputs.
"""

import argparse
import ctypes
import io
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus():
    from PIL import Image

    rng = np.random.default_rng(0)
    # odd height on purpose: every interlace/bundling pass-count formula
    # must handle non-multiple-of-8 dims (a mod-4 off-by-one in the GIF
    # interlacer escaped a multiple-of-8 corpus)
    img = rng.integers(0, 255, (99, 128, 3), np.uint8)
    corpus = []
    for fmt, kw in (
        ("JPEG", {"quality": 85}),
        ("JPEG", {"quality": 85, "progressive": True}),
        ("PNG", {}),
        ("PNG", {"interlace": True}),
        ("BMP", {}),
        ("TIFF", {"compression": "tiff_lzw"}),
        ("TIFF", {"compression": "packbits"}),
        ("TIFF", {"compression": "tiff_deflate"}),
        ("WEBP", {"quality": 80}),
        ("WEBP", {"lossless": True, "method": 2}),
        ("WEBP", {"quality": 80, "alpha": True}),  # VP8X + ALPH container
    ):
        if kw.pop("alpha", False):
            rgba = np.dstack([img, rng.integers(0, 255, img.shape[:2], np.uint8)])
            buf = io.BytesIO()
            Image.fromarray(rgba, "RGBA").save(buf, fmt, **kw)
            corpus.append((fmt.lower(), buf.getvalue()))
            continue
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, fmt, **kw)
        corpus.append((fmt.lower(), buf.getvalue()))
    buf = io.BytesIO()
    Image.fromarray(img).quantize(64).save(buf, "GIF")
    corpus.append(("gif", buf.getvalue()))
    # RGBA lossy -> VP8X + ALPH container
    rgba = np.dstack([img[:64, :64], rng.integers(0, 255, (64, 64), np.uint8)])
    buf = io.BytesIO()
    Image.fromarray(rgba, "RGBA").save(buf, "WEBP", quality=75)
    corpus.append(("webp", buf.getvalue()))
    # crafted tiled + planar TIFFs (PIL never writes these layouts)
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    try:
        from PIL import Image as _Image

        b = io.BytesIO()
        _Image.fromarray(img[:47, :63]).save(b, "AVIF", quality=70)
        corpus.append(("avif", b.getvalue()))
    except Exception:
        pass
    try:
        # true YUV400 mono seed: exercises the round-4 mono arm of
        # decode_yuv_studio + the master-OBU sequence-header range parse
        from imagekit_tpu.codecs.avif_encode import encode_y400_studio

        corpus.append(("avif", encode_y400_studio(img[:45, :61, 0], 70)))
    except Exception:
        pass
    try:
        from test_tiff import _craft_planar, _craft_tiled

        corpus.append(("tiff", _craft_tiled(img[:48, :48], 16, 16, 5)))
        corpus.append(("tiff", _craft_planar(img[:40, :56], 13, 5)))
    except ImportError:
        pass
    return corpus


def feed(kind: str, data: bytes) -> None:
    """Throw the bytes at every relevant native entry; errors expected."""
    from imagekit_tpu.codecs import misc, png, tiff, vp8
    from imagekit_tpu.codecs.native import jpeg_abi, loader

    lib = loader.load()
    try:
        if kind == "jpeg":
            hdr = jpeg_abi.parse(lib, data)
            jpeg_abi.decode(lib, data)
            jpeg_abi.decode_lowfreq(lib, data, 2)
            if hasattr(lib, "ik_jpeg_decode_coeffs_lowfreq_i8"):
                # tiny esc_cap stresses the count-past-cap bookkeeping
                jpeg_abi.decode_lowfreq_i8(lib, data, 3, esc_cap=4)
            jpeg_abi.decode_planes(lib, data)
            del hdr
        elif kind == "png":
            png.decode(data)
        elif kind == "gif":
            misc.decode_gif(data)
        elif kind == "bmp":
            misc.decode_bmp(data)
        elif kind == "tiff":
            tiff.decode(data)
        elif kind == "avif":
            from imagekit_tpu.codecs import avif_native

            try:
                avif_native.decode_rgb(data)
            except ValueError:
                pass
            try:
                avif_native.decode_yuv_studio(data)
            except ValueError:
                pass
        elif kind == "webp":
            vp8.decode_yuv420(data)
            vp8.decode_lossless(data)
            vp8.decode_rgb(data)  # covers the VP8X/ALPH container walk
    except (jpeg_abi.NativeJpegError, ValueError):
        pass  # expected on corrupt input


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    lib_override = os.environ.get("IMAGEKIT_NATIVE_LIB")
    if lib_override:
        # preload the sanitizer build so the lazy loader reuses the handle
        from imagekit_tpu.codecs.native import jpeg_abi, loader

        lib = ctypes.CDLL(os.path.abspath(lib_override))
        jpeg_abi.configure(lib)
        loader._lib = lib  # noqa: SLF001 (test/fuzz hook)
        loader._attempted = True

    corpus = make_corpus()
    rng = np.random.default_rng(args.seed)
    for i in range(args.iters):
        kind, base = corpus[i % len(corpus)]
        data = bytearray(base)
        op = rng.integers(0, 3)
        if op == 0:  # flip random bytes
            for _ in range(int(rng.integers(1, 16))):
                data[int(rng.integers(0, len(data)))] = int(rng.integers(0, 256))
        elif op == 1:  # truncate
            data = data[: int(rng.integers(1, len(data)))]
        else:  # splice a random block
            a = int(rng.integers(0, len(data)))
            b = min(len(data), a + int(rng.integers(1, 64)))
            data[a:b] = bytes(rng.integers(0, 256, b - a, dtype=np.uint8))
        feed(kind, bytes(data))
        if (i + 1) % 500 == 0:
            print(f"{i + 1}/{args.iters} mutations survived", flush=True)
    print("fuzz complete: no crashes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
