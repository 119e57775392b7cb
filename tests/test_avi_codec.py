"""Motion-JPEG AVI container walk + first-frame decode."""
import pytest

from docling_graph_spark.kernels.avi_codec import (
    decode_avi, encode_avi_mjpeg)
from docling_graph_spark.kernels.jpeg_codec import (
    decode_jpeg, encode_jpeg_gray, encode_jpeg_ycbcr420)


def _gray(w, h, seed=3):
    v, out = seed, []
    for i in range(w * h):
        v = (v * 73 + 41) % 256
        out.append((v + i) % 256)
    return bytes(out)


def test_mjpeg_first_frame_matches_direct_jpeg_decode():
    w, h = 24, 16
    frames = [encode_jpeg_gray(w, h, _gray(w, h, s)) for s in (1, 2, 3)]
    avi = encode_avi_mjpeg(w, h, frames, fps=10)
    dec = decode_avi(avi)
    want = decode_jpeg(frames[0])
    assert (dec.width, dec.height, dec.channels) == (w, h, 1)
    assert dec.n_frames == 3 and dec.codec == "MJPG"
    assert dec.pixels == want.pixels


def test_mjpeg_color_frame():
    w = h = 16
    y = _gray(w, h, 5)
    cb = _gray(8, 8, 6)
    cr = _gray(8, 8, 7)
    jpg = encode_jpeg_ycbcr420(w, h, y, cb, cr)
    dec = decode_avi(encode_avi_mjpeg(w, h, [jpg]))
    assert dec.channels == 3 and dec.pixels == decode_jpeg(jpg).pixels


def test_non_mjpeg_codec_routes_with_fourcc():
    avi = encode_avi_mjpeg(8, 8, [encode_jpeg_gray(8, 8, _gray(8, 8))],
                           codec=b"H264")
    # strf still says MJPG; strh fourcc wins only if strf is blank —
    # rebuild with a blanked strf compression to simulate a real H264 file
    patched = bytearray(avi)
    i = patched.find(b"MJPG", patched.find(b"strf"))
    patched[i:i + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        decode_avi(bytes(patched))


def test_malformed_avi_routes():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    # no video stream
    good = encode_avi_mjpeg(8, 8, [encode_jpeg_gray(8, 8, _gray(8, 8))])
    nostrm = bytearray(good)
    j = nostrm.find(b"vids")
    nostrm[j:j + 4] = b"auds"
    with pytest.raises(ValueError, match="no video stream"):
        decode_avi(bytes(nostrm))
    # decompression-bomb guard on header geometry
    bomb = bytearray(good)
    import struct

    k = bomb.find(b"avih")
    bomb[k + 8 + 32:k + 8 + 40] = struct.pack("<II", 1 << 16, 1 << 16)
    with pytest.raises(ValueError, match="guard"):
        decode_avi(bytes(bomb))


def test_rec_list_grouping():
    # frames wrapped in a 'rec ' interleave LIST still count and decode
    import struct

    from docling_graph_spark.kernels.avi_codec import _ck, _list

    w, h = 8, 8
    frames = [encode_jpeg_gray(w, h, _gray(w, h, s)) for s in (4, 9)]
    plain = encode_avi_mjpeg(w, h, frames)
    body = b"".join(_ck(b"00dc", f) for f in frames)
    grouped = _list(b"rec ", body)
    i = plain.find(b"LIST", plain.find(b"movi") - 8)
    # rebuild: swap the movi list body for the rec-wrapped one
    pre = plain[:i]
    movi = _list(b"movi", grouped)
    rebuilt = pre + movi
    rebuilt = b"RIFF" + struct.pack("<I", len(rebuilt) - 8 + 0) \
        + rebuilt[8:]
    dec = decode_avi(rebuilt)
    assert dec.n_frames == 2
    assert dec.pixels == decode_jpeg(frames[0]).pixels


def test_probe_and_sniff_integration():
    from docling_graph_spark.kernels.media_probe import probe_dimensions
    from docling_graph_spark.kernels.media_stub import (
        decode_media, sniff_media_type)

    avi = encode_avi_mjpeg(20, 12, [encode_jpeg_gray(20, 12,
                                                     _gray(20, 12))])
    assert sniff_media_type(avi) == "video/avi"
    hdr = probe_dimensions(avi)
    assert hdr is not None and (hdr.width, hdr.height) == (20, 12)
    dec = decode_media(avi, "video/avi")
    assert dec.width == 20 and sum(dec.pixels) > 0


def test_frame_selection_mirrors_gif_api():
    w, h = 8, 8
    frames = [encode_jpeg_gray(w, h, _gray(w, h, s)) for s in (1, 5, 9)]
    avi = encode_avi_mjpeg(w, h, frames)
    for i in range(3):
        got = decode_avi(avi, frame=i)
        assert got.pixels == decode_jpeg(frames[i]).pixels
        assert got.n_frames == 3
    assert decode_avi(avi, frame=-1).pixels \
        == decode_jpeg(frames[-1]).pixels
    with pytest.raises(ValueError, match="out of range"):
        decode_avi(avi, frame=3)
