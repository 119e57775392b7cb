"""FLAC lossless audio codec (kernels/flac_codec.py).

Byte-lossless roundtrips through every subframe type (CONSTANT /
VERBATIM / FIXED 0-4 / LPC), rice-coded residuals, the three stereo
decorrelation modes, and multi-frame streams; CRC-8/CRC-16 are
verified by the decoder, so a single flipped byte must fail loudly.
"""

from __future__ import annotations

import math
import random

import pytest

from docling_graph_spark.kernels import flac_codec as FL


def _interleave(chans):
    n = len(chans[0])
    return [chans[c][i] for i in range(n) for c in range(len(chans))]


@pytest.mark.parametrize("mode", ["verbatim", "fixed0", "fixed1",
                                  "fixed2", "fixed3", "fixed4", "lpc2"])
def test_roundtrip_every_subframe_type(mode):
    rng = random.Random(sum(ord(c) for c in mode))  # hash() is salted
    for _ in range(3):
        n = rng.randint(1, 700)
        nch = rng.choice([1, 2])
        chans = [[rng.randint(-30000, 30000) for _ in range(n)]
                 for _ in range(nch)]
        dec = FL.decode_flac(FL.encode_flac(chans, subframe_mode=mode))
        assert (dec.n_channels, dec.sample_rate, dec.bit_depth,
                dec.n_frames) == (nch, 8000, 16, n)
        assert dec.samples == _interleave(chans)


def test_constant_subframe():
    dec = FL.decode_flac(FL.encode_flac([[1234] * 300],
                                        subframe_mode="constant"))
    assert dec.samples == [1234] * 300


@pytest.mark.parametrize("sm", ["left_side", "right_side", "mid_side"])
def test_stereo_decorrelation_roundtrip(sm):
    rng = random.Random(42)
    n = 333
    left = [rng.randint(-30000, 30000) for _ in range(n)]
    right = [rng.randint(-30000, 30000) for _ in range(n)]
    dec = FL.decode_flac(FL.encode_flac([left, right],
                                        subframe_mode="fixed2",
                                        stereo_mode=sm))
    assert dec.samples == _interleave([left, right])


def test_multi_frame_stream_and_partial_last_block():
    rng = random.Random(7)
    n = 700  # blocksize 256 -> 2 full frames + a 188-sample tail
    ch = [rng.randint(-2000, 2000) for _ in range(n)]
    dec = FL.decode_flac(FL.encode_flac([ch], blocksize=256,
                                        subframe_mode="fixed1"))
    assert dec.n_frames == n and dec.samples == ch


def test_smooth_content_compresses_under_prediction():
    ch = [int(8000 * math.sin(i / 20)) for i in range(2000)]
    verb = FL.encode_flac([ch], subframe_mode="verbatim")
    fixed = FL.encode_flac([ch], subframe_mode="fixed2")
    lpc = FL.encode_flac([ch], subframe_mode="lpc2")
    assert FL.decode_flac(fixed).samples == ch
    assert FL.decode_flac(lpc).samples == ch
    assert len(fixed) < len(verb)


def test_crc_detects_corruption():
    ch = [i % 100 - 50 for i in range(300)]
    data = bytearray(FL.encode_flac([ch], subframe_mode="fixed1"))
    # flip a bit in the last frame's entropy data (past the metadata)
    data[-10] ^= 0x40
    with pytest.raises(Exception):
        FL.decode_flac(bytes(data))


def test_malformed_routes_cleanly():
    with pytest.raises(ValueError, match="fLaC"):
        FL.decode_flac(b"not a flac stream at all")
    good = FL.encode_flac([[1, 2, 3, 4]], subframe_mode="verbatim")
    with pytest.raises(Exception):
        FL.decode_flac(good[: len(good) - 3])


def test_decode_media_flac_integration():
    from docling_graph_spark.kernels.media_stub import (decode_media,
                                                        sniff_media_type)

    ch = [((k * 17) % 2001) - 1000 for k in range(120)]
    data = FL.encode_flac([ch], sample_rate=16000)
    assert sniff_media_type(data) == "audio/flac"
    dec = decode_media(data, "audio/flac")
    assert (dec.n_channels, dec.sample_rate, dec.n_frames) == (1, 16000,
                                                               120)
    assert dec.samples == ch


def test_audio_decode_stats_flac_and_mp3_routing(spark):
    from docling_graph_spark.operators import multimodal as mm

    ch = [((k * 13) % 801) - 400 for k in range(90)]
    rows = [
        ("f1", bytearray(FL.encode_flac([ch], subframe_mode="lpc2"))),
        ("mp3", bytearray(b"ID3\x04\x00" + bytes(32))),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = {r["url"]: r for r in mm.audio_decode_stats(df).collect()}
    assert out["f1"]["decoded"]
    assert out["f1"]["abs_sum"] == sum(abs(s) for s in ch)
    assert out["f1"]["peak"] == max(abs(s) for s in ch)
    assert not out["mp3"]["decoded"]
    assert out["mp3"]["decode_error"].startswith("unsupported")


@pytest.mark.parametrize("mode", ["fixed3", "fixed4", "lpc2"])
def test_blocks_shorter_than_predictor_order_downgrade(mode):
    """A 2-sample stream (and a short final block) cannot carry a
    4-warmup predictor subframe — the encoder downgrades those blocks
    to verbatim, and the stream stays decodable (seed-139 regression:
    the warmup mismatch silently desynced the bitstream)."""
    for n in (1, 2, 3, 259):
        chans = [[(i * 37) % 997 - 400 for i in range(n)],
                 [(i * 17) % 731 - 300 for i in range(n)]]
        dec = FL.decode_flac(FL.encode_flac(chans, blocksize=256,
                                            subframe_mode=mode))
        assert dec.samples == _interleave(chans)


def test_corruption_fuzz_never_hangs_or_lies():
    """Flipping any single byte of a valid stream must either fail
    loudly (CRC/parse error) or — only for bytes outside the protected
    regions — decode to something; never hang, never crash the
    process."""
    rng = random.Random(5)
    ch = [rng.randint(-3000, 3000) for _ in range(200)]
    good = FL.encode_flac([ch], subframe_mode="fixed2")
    for pos in range(0, len(good), 7):
        bad = bytearray(good)
        bad[pos] ^= 0x41
        try:
            FL.decode_flac(bytes(bad), max_samples=1 << 16)
        except Exception:
            pass  # loud failure is the contract


def test_reserved_sample_size_code_routes():
    """Frame-header sample-size code 0b011 is reserved (RFC 9639); it
    must raise like every other reserved code, not silently fall back
    to the STREAMINFO bit depth (round-5 ADVICE)."""
    data = bytearray(FL.encode_flac([[1, -2, 3, -4] * 8],
                                    subframe_mode="verbatim"))
    f = 4 + 4 + 34                       # fLaC + block header + STREAMINFO
    assert data[f:f + 2] == b"\xff\xf8"  # frame sync
    data[f + 3] |= 0b0110                # ss_code 0 -> 3 (bits 3..1)
    data[f + 7] = FL._crc8(bytes(data[f:f + 7]))  # re-seal header CRC
    with pytest.raises(ValueError, match="reserved sample size"):
        FL.decode_flac(bytes(data))
