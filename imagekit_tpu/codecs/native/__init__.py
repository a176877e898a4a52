"""Native (C++) host-side codec components.

Serial entropy coding does not vectorise (SURVEY.md §7 "hard parts"), so it
lives here as a C++ shared library loaded via ctypes:

- ``jpeg_entropy.cpp`` — baseline JPEG Huffman decode (bytes -> quantised
  DCT coefficient planes) and encode (quantised coefficients -> bitstream).

Build happens lazily on first use (``loader.load()``) with g++; the result
is cached next to the sources. Everything degrades gracefully to the host
library path when the toolchain or sources are unavailable.
"""
