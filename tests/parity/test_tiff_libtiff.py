"""Byte-exact TIFF parity against the system libtiff, both directions.

* ENCODE direction — fixtures from `kernels/tiff_codec.encode_tiff*`
  (none/LZW±predictor/PackBits/Deflate, strips and tiles, gray and
  RGB, both byte orders, old-style JPEG) must read in libtiff's
  `TIFFReadRGBAImageOriented` to exactly this decoder's pixels.
* DECODE direction — files WRITTEN BY libtiff (`TIFFWriteScanline`
  with its own strip layout, tag ordering and compressor output, the
  bytes scanned-document crawls actually carry) must decode here
  byte-identical to the source pixels.

Skipped when the shared library is absent.
"""

import ctypes
import os
import tempfile

import pytest

from docling_graph_spark.kernels.tiff_codec import (
    decode_tiff, encode_tiff, encode_tiff_oldjpeg)

try:
    _LT = ctypes.CDLL("libtiff.so.6")
    _LT.TIFFOpen.restype = ctypes.c_void_p
    _LT.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    _LT.TIFFClose.argtypes = [ctypes.c_void_p]
    _LT.TIFFSetErrorHandler(None)
    _LT.TIFFSetWarningHandler(None)
    _LT.TIFFReadRGBAImageOriented.restype = ctypes.c_int
    _LT.TIFFReadRGBAImageOriented.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int]
    _LT.TIFFWriteScanline.restype = ctypes.c_int
    _LT.TIFFWriteScanline.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32,
        ctypes.c_uint16]
except OSError:                                    # pragma: no cover
    _LT = None

pytestmark = pytest.mark.skipif(_LT is None,
                                reason="libtiff not available")

_RGB = bytes((i * 5) % 256 for i in range(20 * 14 * 3))
_GRAY = bytes((i * 7) % 256 for i in range(20 * 14))


def _lib_read_rgb(blob: bytes, w: int, h: int):
    fd, path = tempfile.mkstemp(suffix=".tif")
    os.close(fd)
    open(path, "wb").write(blob)
    try:
        t = _LT.TIFFOpen(path.encode(), b"r")
        if not t:
            return None
        buf = (ctypes.c_uint32 * (w * h))()
        ok = _LT.TIFFReadRGBAImageOriented(t, w, h, buf, 1, 0)
        _LT.TIFFClose(t)
        if not ok:
            return None
        return b"".join(bytes((v & 0xFF, (v >> 8) & 0xFF,
                               (v >> 16) & 0xFF)) for v in buf)
    finally:
        os.unlink(path)


def _lib_write(w, h, spp, pixels, comp, pred=1, rows=8):
    fd, path = tempfile.mkstemp(suffix=".tif")
    os.close(fd)
    t = ctypes.c_void_p(_LT.TIFFOpen(path.encode(), b"w"))

    def sf(tag, val):
        _LT.TIFFSetField(t, ctypes.c_uint32(tag), ctypes.c_int(val))

    sf(256, w)
    sf(257, h)
    sf(258, 8)
    sf(277, spp)
    sf(259, comp)
    sf(262, 2 if spp == 3 else 1)
    sf(284, 1)
    sf(278, rows)
    if pred != 1:
        sf(317, pred)
    stride = w * spp
    for y in range(h):
        row = (ctypes.c_uint8 * stride).from_buffer_copy(
            pixels[y * stride:(y + 1) * stride])
        assert _LT.TIFFWriteScanline(t, row, y, 0) == 1
    _LT.TIFFClose(t)
    data = open(path, "rb").read()
    os.unlink(path)
    return data


@pytest.mark.parametrize("name,blob", [
    ("rgb_none", encode_tiff(20, 14, 3, _RGB)),
    ("rgb_lzw_pred", encode_tiff(20, 14, 3, _RGB, lzw=True,
                                 predictor=2)),
    ("rgb_packbits", encode_tiff(20, 14, 3, _RGB, packbits=True,
                                 rows_per_strip=5)),
    ("rgb_tiled", encode_tiff(20, 14, 3, _RGB, tile=(16, 16))),
    ("gray_deflate", encode_tiff(20, 14, 1, _GRAY, deflate=True)),
    ("gray_be", encode_tiff(20, 14, 1, _GRAY, big_endian=True)),
])
def test_encode_direction_libtiff_reads_fixtures(name, blob):
    mine = decode_tiff(blob)
    mine_rgb = (bytes(b for v in mine.pixels for b in (v, v, v))
                if mine.channels == 1 else mine.pixels)
    lib = _lib_read_rgb(blob, mine.width, mine.height)
    assert lib is not None, "libtiff refused the fixture"
    assert lib == mine_rgb


def test_oldjpeg_fixture_reads_in_libtiff_within_idct_tolerance():
    """Old-style JPEG goes through libtiff's OJPEG shim + libjpeg,
    whose IDCT legitimately differs from this decoder's within the
    T.81 accuracy bounds — parity here is close, not byte-exact."""
    gray = bytes((i * 7) % 256 for i in range(24 * 16))
    blob = encode_tiff_oldjpeg(24, 16, 1, gray)
    mine = decode_tiff(blob)
    lib = _lib_read_rgb(blob, 24, 16)
    assert lib is not None, "libtiff refused the old-style fixture"
    mine_rgb = bytes(b for v in mine.pixels for b in (v, v, v))
    assert max(abs(a - b) for a, b in zip(lib, mine_rgb)) <= 4


@pytest.mark.parametrize("name,spp,px,comp,pred", [
    ("rgb_none", 3, _RGB, 1, 1),
    ("rgb_lzw", 3, _RGB, 5, 1),
    ("rgb_lzw_pred2", 3, _RGB, 5, 2),
    ("rgb_packbits", 3, _RGB, 32773, 1),
    ("gray_deflate", 1, _GRAY, 8, 1),
    ("gray_lzw_pred2", 1, _GRAY, 5, 2),
])
def test_decode_direction_libtiff_written_files(name, spp, px, comp,
                                                pred):
    blob = _lib_write(20, 14, spp, px, comp, pred)
    dec = decode_tiff(blob)
    assert (dec.width, dec.height, dec.channels) == (20, 14, spp)
    assert dec.pixels == px


def _lib_write_jpeg(w, h, spp, pixels, quality=90):
    fd, path = tempfile.mkstemp(suffix=".tif")
    os.close(fd)
    t = ctypes.c_void_p(_LT.TIFFOpen(path.encode(), b"w"))

    def sf(tag, val):
        _LT.TIFFSetField(t, ctypes.c_uint32(tag), ctypes.c_int(val))

    sf(256, w)
    sf(257, h)
    sf(258, 8)
    sf(277, spp)
    sf(259, 7)                          # new-style JPEG
    sf(262, 6 if spp == 3 else 1)
    sf(284, 1)
    sf(278, 16)
    sf(65537, quality)                  # TIFFTAG_JPEGQUALITY
    if spp == 3:
        sf(65538, 1)                    # JPEGCOLORMODE_RGB
    stride = w * spp
    for y in range(h):
        row = (ctypes.c_uint8 * stride).from_buffer_copy(
            pixels[y * stride:(y + 1) * stride])
        assert _LT.TIFFWriteScanline(t, row, y, 0) == 1
    _LT.TIFFClose(t)
    data = open(path, "rb").read()
    os.unlink(path)
    return data


@pytest.mark.parametrize("spp", [1, 3])
def test_decode_direction_real_libjpeg_streams(spp):
    """JPEG-in-TIFF written by libtiff carries REAL libjpeg-encoded
    strips (optimized tables, libjpeg's own DCT choices) — the first
    genuinely foreign JPEG entropy streams this decoder meets.  Pixels
    must agree with libtiff's own read within the T.81 IDCT/upsample
    tolerance."""
    import math

    w, h = 32, 24
    px = bytes(int(127 + 100 * math.sin((x + 2 * y + c * 3) / 5))
               % 256 for y in range(h) for x in range(w)
               for c in range(spp))
    blob = _lib_write_jpeg(w, h, spp, px)
    mine = decode_tiff(blob)
    assert (mine.width, mine.height, mine.channels) == (w, h, spp)
    lib = _lib_read_rgb(blob, w, h)
    assert lib is not None
    mine_rgb = (bytes(b for v in mine.pixels for b in (v, v, v))
                if spp == 1 else mine.pixels)
    diffs = [abs(a - b) for a, b in zip(lib, mine_rgb)]
    if spp == 1:
        assert max(diffs) <= 6        # IDCT variance only
    else:
        # 4:2:0 chroma upsampling is decoder-discretionary (libjpeg's
        # fancy bilinear vs this decoder's box replication): bound the
        # mean tightly and the per-pixel max loosely — an entropy
        # decode error would blow both by an order of magnitude
        assert sum(diffs) / len(diffs) <= 6
        assert max(diffs) <= 32
