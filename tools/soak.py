#!/usr/bin/env python3
"""Chaos soak for a live imagekit server.

Drives ``POST /upload`` with a randomized mix drawn from every source
format the framework decodes (baseline/progressive/grayscale JPEG, all
PNG shapes, GIF, BMP incl. RLE, TIFF, lossy+lossless WebP) times output
format / dimensions / quality — plus hostile classes (corrupt bytes,
truncations, empty files, oversized payloads, junk fields) — and asserts
every response lands in its expected status class. A sample of OK
responses is decoded and shape-checked.

    python -m imagekit_tpu.serving --port 18099 &   # server under test
    python tools/soak.py --base http://127.0.0.1:18099 --n 3000

Exit code 0 = clean; any unexpected status or undecodable OK body = 1.
"""

from __future__ import annotations

import argparse
import asyncio
import io
import random
import struct
import sys

import numpy as np

sys.path.insert(0, ".")


def make_sources():
    """(name, bytes, decodable) corpus, odd dims on purpose."""
    from PIL import Image

    rng = np.random.default_rng(99)
    out = []

    def img(w, h, gray=False):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        base = np.stack(
            [xx * 255 / max(w - 1, 1), yy * 255 / max(h - 1, 1),
             (xx + yy) % 256], axis=-1
        )
        base = np.clip(base + rng.normal(0, 20, base.shape), 0, 255)
        a = base.astype(np.uint8)
        return a[:, :, 0] if gray else a

    def enc(arr, fmt, **kw):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, fmt, **kw)
        return buf.getvalue()

    out.append(("jpeg_base", enc(img(321, 243), "JPEG", quality=85), True))
    out.append(
        ("jpeg_prog", enc(img(257, 191), "JPEG", quality=88,
                          progressive=True), True)
    )
    out.append(("jpeg_gray", enc(img(203, 149, gray=True), "JPEG"), True))
    out.append(("png_rgb", enc(img(199, 151), "PNG"), True))
    rgba = np.dstack([img(97, 73), np.full((73, 97), 200, np.uint8)])
    out.append(("png_rgba", enc(rgba, "PNG"), True))
    pal = Image.fromarray(img(101, 67)).convert(
        "P", palette=Image.ADAPTIVE, colors=63
    )
    buf = io.BytesIO()
    pal.save(buf, "PNG")
    out.append(("png_pal", buf.getvalue(), True))
    out.append(("gif", enc(img(83, 59), "GIF"), True))
    out.append(("bmp", enc(img(111, 77), "BMP"), True))
    out.append(("tiff", enc(img(93, 65), "TIFF"), True))
    out.append(("webp_lossy", enc(img(151, 103), "WEBP", quality=80), True))
    out.append(("webp_ll", enc(img(75, 49), "WEBP", lossless=True), True))
    try:
        out.append(("avif", enc(img(105, 71), "AVIF", quality=75), True))
        # non-420 chroma geometries ride the fused head since round 4
        out.append(("avif_444", enc(img(98, 66), "AVIF", quality=75,
                                    subsampling="4:4:4"), True))
        out.append(("avif_422", enc(img(87, 61), "AVIF", quality=75,
                                    subsampling="4:2:2"), True))
    except Exception:
        pass
    try:
        # true YUV400 monochrome (PIL encodes mode-L as colour; the
        # real mono class needs the direct libavif ABI) — rides the
        # fused head with synthesized neutral chroma since late round 4
        from imagekit_tpu.codecs.avif_encode import encode_y400_studio

        out.append(
            ("avif_mono", encode_y400_studio(img(95, 69, gray=True), 75),
             True)
        )
    except Exception:
        pass

    # long-tail formats (round 5 superset — the reference 400s these;
    # see docs/PARITY_REPORT.md "Input-format matrix")
    for name, fmt in (("ico", "ICO"), ("qoi", "QOI"), ("pnm", "PPM"),
                      ("dds", "DDS")):
        try:
            out.append((name, enc(img(63, 45), fmt), True))
        except Exception:
            pass
    ff_px = np.dstack([img(57, 41), np.full((41, 57), 255, np.uint8)])
    out.append((
        "farbfeld",
        b"farbfeld"
        + struct.pack(">II", 57, 41)
        + (ff_px.astype(np.uint16) * 257).astype(">u2").tobytes(),
        True,
    ))
    # Radiance HDR: flat literal scanlines (w<8 forces old-style decode)
    hdr_px = np.dstack(
        [img(6, 5) // 2, np.full((5, 6), 128, np.uint8)]
    ).astype(np.uint8)
    hdr = [b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n-Y 5 +X 6\n"]
    for row in range(5):
        for x in range(6):
            hdr.append(bytes(hdr_px[row, x].tolist()))
    out.append(("hdr", b"".join(hdr), True))
    out.append(("exr_rejected", b"\x76\x2f\x31\x01" + b"\x00" * 64, False))

    # hostile classes
    base = out[0][1]
    out.append(("empty", b"", False))
    out.append(("garbage", bytes(rng.integers(0, 256, 4096, dtype=np.uint8)),
                False))
    out.append(("truncated", base[: len(base) // 3], False))
    corrupt = bytearray(base)
    for _ in range(24):
        corrupt[int(rng.integers(32, len(corrupt)))] = int(
            rng.integers(0, 256)
        )
    out.append(("corrupt", bytes(corrupt), None))  # 200 or 400, never 5xx
    return out


async def run(base: str, n: int, concurrency: int) -> int:
    import aiohttp

    sources = make_sources()
    rng = random.Random(7)
    fmts = ["webp", "jpeg", "avif", "", "bogus"]
    bad = 0
    checked = 0
    shed = 0
    statuses: dict = {}
    sem = asyncio.Semaphore(concurrency)

    async def one(session, i):
        nonlocal bad, checked
        name, data, decodable = sources[i % len(sources)]
        form = aiohttp.FormData()
        form.add_field("file", data, filename="x", content_type="image/any")
        w = rng.choice([None, 1, 17, 100, 301, 640, 1200])
        h = rng.choice([None, None, 51, 150])
        f = rng.choice(fmts)
        q = rng.choice([None, 0, 1, 50, 85, 101, 255])
        if w is not None:
            form.add_field("w", str(w))
        if h is not None:
            form.add_field("h", str(h))
        if f:
            form.add_field("f", f)
        if q is not None:
            form.add_field("q", str(q))
        async with sem:
            try:
                async with session.post(
                    base + "/upload", data=form,
                    timeout=aiohttp.ClientTimeout(total=120),
                ) as resp:
                    body = await resp.read()
                    st = resp.status
                    retry_after = resp.headers.get("retry-after")
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {name}: transport error {e}")
                bad += 1
                return
        key = (name, st)
        statuses[key] = statuses.get(key, 0) + 1
        if st == 429:
            # admission control shed (or rate limit): a legitimate
            # overload response — but it MUST carry Retry-After
            nonlocal shed
            shed += 1
            if not retry_after or int(retry_after) < 1:
                print(f"FAIL {name}: 429 without a sane Retry-After")
                bad += 1
        elif decodable is True and st != 200:
            print(f"FAIL {name} w={w} h={h} f={f} q={q}: status {st}")
            bad += 1
        elif decodable is False and st != 400:
            print(f"FAIL {name}: expected 400, got {st}")
            bad += 1
        elif decodable is None and st not in (200, 400):
            print(f"FAIL {name}: expected 200/400, got {st}")
            bad += 1
        elif st == 200 and rng.random() < 0.2:
            from PIL import Image

            try:
                im = Image.open(io.BytesIO(body))
                im.load()
                checked += 1
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {name}: OK body undecodable ({e})")
                bad += 1

    done = 0

    async def tracked(session, i):
        nonlocal done
        await one(session, i)
        done += 1
        if done % 250 == 0:
            print(f"  {done}/{n} ...", flush=True)

    async with __import__("aiohttp").ClientSession() as session:
        await asyncio.gather(*(tracked(session, i) for i in range(n)))
    per_status: dict = {}
    for (_, st), c in statuses.items():
        per_status[st] = per_status.get(st, 0) + c
    print(
        f"soak: {n} requests, statuses {sorted(per_status.items())}, "
        f"{checked} bodies decoded, {shed} shed (429), {bad} failures"
    )
    return 1 if bad else 0


async def run_img(base: str, n: int, concurrency: int) -> int:
    """Soak the reference hot path: local HTTP source server -> /sign ->
    /img with valid, tampered-sig, expired-t, and undecodable-source
    classes; verifies 200/400/401/410, ETag-keyed cache HITs, and 304
    revalidation."""
    import http.server
    import socketserver
    import threading
    import time as _time

    import aiohttp

    sources = make_sources()
    blobs = {f"/src{i}": d for i, (_, d, _) in enumerate(sources)}

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            d = blobs.get(self.path)
            if d is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "image/jpeg")
            self.send_header("Content-Length", str(len(d)))
            self.end_headers()
            self.wfile.write(d)

        def log_message(self, *a):  # noqa: D102
            pass

    socketserver.ThreadingTCPServer.allow_reuse_address = True
    httpd = socketserver.ThreadingTCPServer(("127.0.0.1", 0), H)
    src_port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    rng = random.Random(11)
    bad = 0
    hits_checked = 0
    shed = 0
    statuses: dict = {}
    sem = asyncio.Semaphore(concurrency)

    async def one(session, i):
        nonlocal bad, hits_checked, shed
        idx = i % len(sources)
        name, _, decodable = sources[idx]
        mode = rng.choice(["ok", "ok", "ok", "tamper", "expired"])
        params = {"url": f"http://127.0.0.1:{src_port}/src{idx}"}
        w = rng.choice([64, 100, 150])
        params["w"] = str(w)
        f = rng.choice(["webp", "jpeg"])
        params["f"] = f
        if mode == "expired":
            params["t"] = str(int(_time.time()) - 3600)
        async with sem:
            try:
                async with session.get(
                    base + "/sign", params=params,
                    timeout=aiohttp.ClientTimeout(total=60),
                ) as r:
                    signed = (await r.json())["signed_url"]
                if mode == "tamper":
                    # flip the final sig hex digit
                    last = signed[-1]
                    signed = signed[:-1] + ("0" if last != "0" else "1")
                async with session.get(
                    base + signed, timeout=aiohttp.ClientTimeout(total=150)
                ) as resp:
                    body = await resp.read()
                    st = resp.status
                    etag = resp.headers.get("ETag")
                if mode == "ok" and st == 200 and rng.random() < 0.25:
                    # cache hit + 304 revalidation on the same signed URL
                    async with session.get(
                        base + signed,
                        timeout=aiohttp.ClientTimeout(total=60),
                    ) as r2:
                        await r2.read()
                        if r2.status != 200:
                            print(f"FAIL {name}: hit status {r2.status}")
                            bad += 1
                    if etag:
                        async with session.get(
                            base + signed,
                            headers={"If-None-Match": etag},
                            timeout=aiohttp.ClientTimeout(total=60),
                        ) as r3:
                            await r3.read()
                            if r3.status != 304:
                                print(
                                    f"FAIL {name}: expected 304, "
                                    f"got {r3.status}"
                                )
                                bad += 1
                    hits_checked += 1
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {name}/{mode}: transport error {e}")
                bad += 1
                return
        statuses[(name, mode, st)] = statuses.get((name, mode, st), 0) + 1
        if st == 429:
            # engine-level admission control (round 3): a shed with a
            # sane Retry-After is a valid serving outcome under load on
            # any transform route, counted separately like upload mode
            shed += 1
            ra = resp.headers.get("Retry-After")
            if not ra or not ra.isdigit() or int(ra) < 1:
                print(f"FAIL {name}: 429 without a sane Retry-After")
                bad += 1
            return
        expect = {
            "tamper": (401,),
            "expired": (410,),
            "ok": (200,) if decodable is True
            else (400,) if decodable is False else (200, 400),
        }[mode]
        if st not in expect:
            print(f"FAIL {name}/{mode}: status {st}, expected {expect}")
            bad += 1
        elif mode == "ok" and st == 200 and len(body) == 0:
            print(f"FAIL {name}: empty 200 body")
            bad += 1

    done = 0

    async def tracked(session, i):
        nonlocal done
        await one(session, i)
        done += 1
        if done % 250 == 0:
            print(f"  {done}/{n} ...", flush=True)

    async with aiohttp.ClientSession() as session:
        await asyncio.gather(*(tracked(session, i) for i in range(n)))
    httpd.shutdown()
    per_status: dict = {}
    for (_, _, st), c in statuses.items():
        per_status[st] = per_status.get(st, 0) + c
    print(
        f"img soak: {n} requests, statuses {sorted(per_status.items())}, "
        f"{hits_checked} hit+304 checks, {shed} shed (429), {bad} failures"
    )
    return 1 if bad else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="http://127.0.0.1:18099")
    ap.add_argument("--n", type=int, default=3000)
    ap.add_argument("--concurrency", type=int, default=16)
    ap.add_argument(
        "--img", action="store_true",
        help="soak the /sign -> /img hot path instead of /upload",
    )
    args = ap.parse_args()
    if args.img:
        return asyncio.run(run_img(args.base, args.n, args.concurrency))
    return asyncio.run(run(args.base, args.n, args.concurrency))


if __name__ == "__main__":
    raise SystemExit(main())
