"""Byte-exact GIF parity against the system giflib.

Fixtures from `kernels/gif_codec.encode_gif` (full/sub-size palettes,
interlaced and sequential LZW) must slurp in giflib to exactly the
palette-resolved pixels this decoder produces — validating the LZW
encoder/decoder pair, interlace ordering and palette handling against
the canonical implementation.  Skipped when the library is absent.
"""

import ctypes
import os
import tempfile

import pytest

from docling_graph_spark.kernels.gif_codec import decode_gif, encode_gif

try:
    _LG = ctypes.CDLL("libgif.so.7")
except OSError:                                    # pragma: no cover
    _LG = None

pytestmark = pytest.mark.skipif(_LG is None,
                                reason="giflib not available")

_W = ctypes.c_int


class _Color(ctypes.Structure):
    _fields_ = [("Red", ctypes.c_ubyte), ("Green", ctypes.c_ubyte),
                ("Blue", ctypes.c_ubyte)]


class _ColorMap(ctypes.Structure):
    _fields_ = [("ColorCount", ctypes.c_int),
                ("BitsPerPixel", ctypes.c_int),
                ("SortFlag", ctypes.c_int),
                ("Colors", ctypes.POINTER(_Color))]


class _ImageDesc(ctypes.Structure):
    _fields_ = [("Left", _W), ("Top", _W), ("Width", _W),
                ("Height", _W), ("Interlace", ctypes.c_int),
                ("ColorMap", ctypes.POINTER(_ColorMap))]


class _SavedImage(ctypes.Structure):
    _fields_ = [("ImageDesc", _ImageDesc),
                ("RasterBits", ctypes.POINTER(ctypes.c_ubyte)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.c_void_p)]


class _GifFile(ctypes.Structure):
    _fields_ = [("SWidth", _W), ("SHeight", _W),
                ("SColorResolution", _W), ("SBackGroundColor", _W),
                ("AspectByte", ctypes.c_ubyte),
                ("SColorMap", ctypes.POINTER(_ColorMap)),
                ("ImageCount", ctypes.c_int),
                ("Image", _ImageDesc),
                ("SavedImages", ctypes.POINTER(_SavedImage)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.c_void_p),
                ("Error", ctypes.c_int),
                ("UserData", ctypes.c_void_p),
                ("Private", ctypes.c_void_p)]


if _LG is not None:
    _LG.DGifOpenFileName.restype = ctypes.POINTER(_GifFile)
    _LG.DGifOpenFileName.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_int)]
    _LG.DGifSlurp.argtypes = [ctypes.POINTER(_GifFile)]
    _LG.DGifCloseFile.argtypes = [ctypes.POINTER(_GifFile),
                                  ctypes.POINTER(ctypes.c_int)]


def _lib_decode_rgb(gif: bytes):
    """(w, h, rgb) of frame 0 via DGifSlurp (deinterlaced by giflib)."""
    fd, path = tempfile.mkstemp(suffix=".gif")
    os.close(fd)
    open(path, "wb").write(gif)
    try:
        err = ctypes.c_int()
        g = _LG.DGifOpenFileName(path.encode(), ctypes.byref(err))
        if not g:
            return None
        if _LG.DGifSlurp(g) != 1:
            _LG.DGifCloseFile(g, ctypes.byref(err))
            return None
        gf = g.contents
        si = gf.SavedImages[0]
        d = si.ImageDesc
        cm = d.ColorMap if d.ColorMap else gf.SColorMap
        n = d.Width * d.Height
        raster = bytes((ctypes.c_ubyte * n).from_address(
            ctypes.addressof(si.RasterBits.contents)))
        rgb = bytearray()
        for v in raster:
            c = cm.contents.Colors[v]
            rgb += bytes((c.Red, c.Green, c.Blue))
        out = (d.Width, d.Height, bytes(rgb))
        _LG.DGifCloseFile(g, ctypes.byref(err))
        return out
    finally:
        os.unlink(path)


_FULL_PAL = [bytes([i, (i * 3) % 256, (i * 7) % 256])
             for i in range(256)]
_SMALL_PAL = [bytes([i * 16, 255 - i * 16, i * 4]) for i in range(13)]


@pytest.mark.parametrize("name,pal,interlace", [
    ("full_pal", _FULL_PAL, False),
    ("full_pal_interlaced", _FULL_PAL, True),
    ("small_pal", _SMALL_PAL, False),
    ("small_pal_interlaced", _SMALL_PAL, True),
])
def test_giflib_reads_fixtures_byte_exact(name, pal, interlace):
    w, h = 24, 17
    idx = bytes((i * 11) % len(pal) for i in range(w * h))
    gif = encode_gif(w, h, pal, idx, interlace=interlace)
    mine = decode_gif(gif)
    lib = _lib_decode_rgb(gif)
    assert lib is not None, "giflib refused the fixture"
    lw, lh, lrgb = lib
    assert (lw, lh) == (mine.width, mine.height) == (w, h)
    assert lrgb == mine.pixels
