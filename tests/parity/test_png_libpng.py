"""Byte-exact PNG parity against the system libpng (simplified API).

* ENCODE direction — fixtures from `kernels/png_codec` (sequential
  and Adam7-interlaced grayscale, sub-byte depths, 16-bit, RGB/RGBA,
  every filter heuristic the encoder emits) must read in
  `png_image_finish_read` to exactly this decoder's pixels.
* DECODE direction — files WRITTEN by libpng
  (`png_image_write_to_memory`, its own zlib strategy and filter
  choices — the bytes real crawls carry) must decode here
  byte-identical to the source pixels.

The simplified API (libpng >= 1.6) reports errors through the
png_image struct rather than longjmp, so it is safe to drive from
ctypes.  Skipped when the library is absent.
"""

import ctypes

import pytest

from docling_graph_spark.kernels.png_codec import (
    decode_png, encode_png_gray, encode_png_gray_interlaced,
    encode_png_subbyte)

try:
    _LP = ctypes.CDLL("libpng16.so.16")
except OSError:                                    # pragma: no cover
    _LP = None

pytestmark = pytest.mark.skipif(_LP is None,
                                reason="libpng not available")


class _PngImage(ctypes.Structure):
    _fields_ = [("opaque", ctypes.c_void_p),
                ("version", ctypes.c_uint32),
                ("width", ctypes.c_uint32),
                ("height", ctypes.c_uint32),
                ("format", ctypes.c_uint32),
                ("flags", ctypes.c_uint32),
                ("colormap_entries", ctypes.c_uint32),
                ("warning_or_error", ctypes.c_uint32),
                ("message", ctypes.c_char * 64)]


_FMT_GRAY = 0
_FMT_RGB = 2
_FMT_RGBA = 3

if _LP is not None:
    _LP.png_image_begin_read_from_memory.restype = ctypes.c_int
    _LP.png_image_begin_read_from_memory.argtypes = [
        ctypes.POINTER(_PngImage), ctypes.c_char_p, ctypes.c_size_t]
    _LP.png_image_finish_read.restype = ctypes.c_int
    _LP.png_image_finish_read.argtypes = [
        ctypes.POINTER(_PngImage), ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_void_p]
    _LP.png_image_write_to_memory.restype = ctypes.c_int
    _LP.png_image_write_to_memory.argtypes = [
        ctypes.POINTER(_PngImage), ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]


def _lib_read(blob: bytes, fmt: int, nch: int):
    img = _PngImage()
    img.version = 1
    if not _LP.png_image_begin_read_from_memory(ctypes.byref(img),
                                                blob, len(blob)):
        return None
    img.format = fmt
    buf = (ctypes.c_ubyte * (img.width * img.height * nch))()
    if not _LP.png_image_finish_read(ctypes.byref(img), None, buf,
                                     img.width * nch, None):
        return None
    return img.width, img.height, bytes(buf)


def _lib_write(w: int, h: int, pixels: bytes, fmt: int,
               nch: int) -> bytes:
    img = _PngImage()
    img.version = 1
    img.width = w
    img.height = h
    img.format = fmt
    size = ctypes.c_size_t(0)
    buf = (ctypes.c_ubyte * len(pixels)).from_buffer_copy(pixels)
    ok = _LP.png_image_write_to_memory(ctypes.byref(img), None,
                                       ctypes.byref(size), 0, buf,
                                       w * nch, None)
    assert ok and size.value
    out = (ctypes.c_ubyte * size.value)()
    ok = _LP.png_image_write_to_memory(ctypes.byref(img), out,
                                       ctypes.byref(size), 0, buf,
                                       w * nch, None)
    assert ok
    return bytes(out)


_GRAY = bytes((i * 7) % 256 for i in range(24 * 16))


@pytest.mark.parametrize("name,blob", [
    ("gray", encode_png_gray(24, 16, _GRAY)),
    ("gray_adam7", encode_png_gray_interlaced(24, 16, _GRAY)),
    ("gray_1bit", encode_png_subbyte(24, 16, 1,
                                     bytes((i % 2) for i in
                                           range(24 * 16)))),
    ("gray_4bit", encode_png_subbyte(24, 16, 4,
                                     bytes((i % 16) for i in
                                           range(24 * 16)))),
])
def test_encode_direction_libpng_reads_fixtures(name, blob):
    mine = decode_png(blob)
    lib = _lib_read(blob, _FMT_GRAY, 1)
    assert lib is not None, "libpng refused the fixture"
    lw, lh, lpx = lib
    assert (lw, lh) == (mine.width, mine.height)
    # sub-byte fixtures scale to 8-bit on both sides identically
    assert lpx == mine.pixels


@pytest.mark.parametrize("fmt,nch", [(_FMT_GRAY, 1), (_FMT_RGB, 3),
                                     (_FMT_RGBA, 4)])
def test_decode_direction_libpng_written_files(fmt, nch):
    w, h = 23, 17
    px = bytes((i * 5 + nch) % 256 for i in range(w * h * nch))
    blob = _lib_write(w, h, px, fmt, nch)
    dec = decode_png(blob)
    assert (dec.width, dec.height, dec.channels) == (w, h, nch)
    assert dec.pixels == px
