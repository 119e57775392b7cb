"""Stdlib WAV codec: encode→decode roundtrip, chunk-walk robustness
(extra chunks, pad bytes, 8/32-bit depths), error routing for truncated /
compressed payloads, and the Spark audio_decode_stats stage end-to-end."""

from __future__ import annotations

import struct

import pytest

from docling_graph_spark.kernels.media_stub import decode_media, \
    sniff_media_type
from docling_graph_spark.kernels.wav_codec import (
    decode_wav,
    encode_wav_pcm16,
)


def test_pcm16_roundtrip():
    samples = [((i * 37) % 4001) - 2000 for i in range(90)]
    wav = encode_wav_pcm16(16000, 2, samples)
    assert sniff_media_type(wav) == "audio/wav"
    dec = decode_wav(wav)
    assert (dec.n_channels, dec.sample_rate, dec.bit_depth) == (2, 16000, 16)
    assert dec.n_frames == 45
    assert dec.samples == samples


def test_decode_media_routes_wav():
    wav = encode_wav_pcm16(8000, 1, [0, 100, -100, 32767, -32768])
    dec = decode_media(wav, "audio/wav")
    assert dec.samples == [0, 100, -100, 32767, -32768]


def _wav_raw(fmt_body: bytes, data: bytes, extra: bytes = b"") -> bytes:
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
            + extra
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _fmt(audio_format=1, channels=1, rate=8000, bits=16) -> bytes:
    align = channels * bits // 8
    return struct.pack("<HHIIHH", audio_format, channels, rate,
                       rate * align, align, bits)


def test_extra_chunks_and_odd_pad():
    # LIST chunk with an odd size (forces the word-align pad byte) before
    # the data chunk; decoder must skip it and still find data
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    data = struct.pack("<4h", 1, -2, 3, -4)
    dec = decode_wav(_wav_raw(_fmt(), data, extra=extra))
    assert dec.samples == [1, -2, 3, -4]


def test_8bit_and_32bit_depths():
    d8 = decode_wav(_wav_raw(_fmt(bits=8), bytes([0, 128, 255])))
    assert (d8.bit_depth, d8.samples) == (8, [0, 128, 255])
    d32 = decode_wav(_wav_raw(_fmt(bits=32),
                              struct.pack("<3i", 1 << 20, -(1 << 30), 7)))
    assert (d32.bit_depth, d32.samples) == (32, [1 << 20, -(1 << 30), 7])


def test_trailing_bytes_after_riff_are_ignored():
    # real files often carry appended metadata/padding after the RIFF
    # container — the chunk walk must stop at the container boundary
    wav = encode_wav_pcm16(8000, 1, [1, 2, 3, 4])
    dec = decode_wav(wav + b"JUNKJUNKJUNK")
    assert dec.samples == [1, 2, 3, 4]


def test_truncated_raises_value_error():
    wav = encode_wav_pcm16(8000, 1, [5] * 50)
    with pytest.raises(ValueError):
        decode_wav(wav[:20])


def test_missing_data_chunk_raises():
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + _fmt()
    with pytest.raises(ValueError, match="missing data"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_compressed_format_not_implemented():
    # ADPCM (format 2) must raise NotImplementedError, not ValueError —
    # the operator routes the two differently
    with pytest.raises(NotImplementedError):
        decode_wav(_wav_raw(_fmt(audio_format=2), b"\x00\x00"))


def test_odd_depth_not_implemented():
    with pytest.raises(NotImplementedError):
        decode_wav(_wav_raw(_fmt(bits=12), b"\x00" * 6))


def test_audio_decode_stats_stage(spark):
    """Spark stage: decoded stats, malformed routing, non-audio routing."""
    from docling_graph_spark.operators.multimodal import audio_decode_stats

    good = encode_wav_pcm16(8000, 2, [10, -20, 30, -40])
    rows = [
        ("u1", good),
        ("u2", good[:16]),                      # truncated -> malformed
        ("u3", b"ID3\x04" + bytes(16)),         # mp3 -> unsupported
        ("u4", b"<html><body>x</body></html>"),  # not audio
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = {r["url"]: r for r in audio_decode_stats(df).collect()}
    assert out["u1"]["decoded"] is True
    assert out["u1"]["n_channels"] == 2
    assert out["u1"]["n_frames"] == 2
    assert out["u1"]["abs_sum"] == 100
    assert out["u1"]["peak"] == 40
    assert out["u2"]["decoded"] is False
    assert out["u2"]["decode_error"].startswith("malformed")
    assert out["u3"]["decode_error"].startswith("unsupported")
    assert out["u4"]["decode_error"] == "not audio"


def test_ieee_float_wav_decodes_quantized():
    """Format-3 float WAVs decode for real: samples quantized to the
    16-bit lattice with round-half-away-from-zero — deterministic
    integer statistics like the PCM path."""
    from docling_graph_spark.kernels.wav_codec import (decode_wav,
                                                       encode_wav_float32)

    floats = [0.0, 0.5, -0.5, 0.999, -1.0, 1.0 / 65536.0, 0.25]
    data = encode_wav_float32(16000, 1, floats)
    dec = decode_wav(data)
    assert (dec.n_channels, dec.sample_rate, dec.bit_depth) == (1, 16000,
                                                                32)
    assert dec.n_frames == len(floats)
    # round-half-away-from-zero at the 32768 scale: float32 storage of
    # 0.5 is exact, 0.999 stores as the nearest float32
    assert dec.samples[0] == 0
    assert dec.samples[1] == 16384 and dec.samples[2] == -16384
    assert dec.samples[4] == -32768
    assert dec.samples[5] == 1  # subnormal-ish tiny value rounds to 1?


# ---------------------------------------------------------------------------
# Round 5: WAVE_FORMAT_EXTENSIBLE (0xFFFE)
# ---------------------------------------------------------------------------


def _extensible(sub_fmt: int, fmt_tail: bytes, bits: int,
                data: bytes, ch: int = 2, rate: int = 8000) -> bytes:
    import struct

    from docling_graph_spark.kernels import wav_codec as WV

    sub = struct.pack("<H", sub_fmt) + fmt_tail
    fmt = struct.pack("<HHIIHH", 0xFFFE, ch, rate,
                      rate * ch * bits // 8, ch * bits // 8, bits) \
        + struct.pack("<HHI", 22, bits, (1 << ch) - 1) + sub
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_extensible_pcm_and_float_unwrap():
    import struct

    from docling_graph_spark.kernels import wav_codec as WV

    samples = [100, -200, 300, -400, 500, -600]
    wav = _extensible(1, WV._KS_GUID_TAIL, 16,
                      struct.pack("<6h", *samples))
    d = WV.decode_wav(wav)
    assert (d.n_channels, d.sample_rate, d.n_frames) == (2, 8000, 3)
    assert d.samples == samples
    floats = [0.5, -0.25, 1.0, -1.0]
    wavf = _extensible(3, WV._KS_GUID_TAIL, 32,
                       struct.pack("<4f", *floats))
    df = WV.decode_wav(wavf)
    assert df.samples == [WV._quant16(f) for f in floats]


def test_extensible_bad_subformat_routes():
    import struct

    import pytest

    from docling_graph_spark.kernels import wav_codec as WV

    wav = _extensible(1, b"X" * 14, 16, struct.pack("<2h", 1, 2))
    with pytest.raises(NotImplementedError, match="GUID"):
        WV.decode_wav(wav)
    # truncated extension
    wav2 = bytearray(_extensible(1, WV._KS_GUID_TAIL, 16,
                                 struct.pack("<2h", 1, 2)))
    i = wav2.index(b"fmt ")
    wav2[i + 4:i + 8] = struct.pack("<I", 16)     # claim no extension
    # rebuild is invalid RIFF sizes; just assert a routed error type
    try:
        WV.decode_wav(bytes(wav2))
        assert False, "should have raised"
    except (ValueError, NotImplementedError):
        pass


# ---------------------------------------------------------------------------
# G.711 mu-law / A-law (formats 7 / 6)
# ---------------------------------------------------------------------------

def test_g711_code_point_involution():
    from docling_graph_spark.kernels.wav_codec import (
        alaw_decode_byte, alaw_encode_sample, ulaw_decode_byte,
        ulaw_encode_sample)

    # every A-law code point survives a decode->encode roundtrip
    for b in range(256):
        assert alaw_encode_sample(alaw_decode_byte(b)) == b
    # mu-law likewise, except negative zero (0x7F) which canonicalizes
    # to positive zero (0xFF)
    for b in range(256):
        want = 0xFF if b == 0x7F else b
        assert ulaw_encode_sample(ulaw_decode_byte(b)) == want


def test_g711_known_pins():
    from docling_graph_spark.kernels.wav_codec import (
        alaw_decode_byte, ulaw_decode_byte)

    # classic G.711 landmark values
    assert ulaw_decode_byte(0xFF) == 0          # mu-law silence
    assert ulaw_decode_byte(0x80) == 32124      # positive full scale
    assert ulaw_decode_byte(0x00) == -32124     # negative full scale
    assert alaw_decode_byte(0xD5) == 8          # A-law has no zero
    assert alaw_decode_byte(0x55) == -8
    assert alaw_decode_byte(0xAA) == 32256      # positive full scale
    assert alaw_decode_byte(0x2A) == -32256


def test_g711_quantization_error_bound():
    from docling_graph_spark.kernels.wav_codec import (
        alaw_decode_byte, alaw_encode_sample, ulaw_decode_byte,
        ulaw_encode_sample)

    xs = list(range(-32768, 32768, 997)) + [-32768, 32767, -1, 0, 1]
    for x in xs:
        # top mu-law segment step is 1<<10; A-law top step 1<<9 (x16)
        assert abs(ulaw_decode_byte(ulaw_encode_sample(x)) - x) <= 1024
        assert abs(alaw_decode_byte(alaw_encode_sample(x)) - x) <= 1024


@pytest.mark.parametrize("law,tag", [("mu", 7), ("a", 6)])
def test_g711_wav_roundtrip(law, tag):
    import struct as _s

    from docling_graph_spark.kernels.wav_codec import (
        alaw_decode_byte, alaw_encode_sample, decode_wav,
        encode_wav_g711, ulaw_decode_byte, ulaw_encode_sample)

    src = [int(8000 * __import__("math").sin(i / 7)) for i in range(301)]
    wav = encode_wav_g711(8000, 1, src, law=law)
    assert _s.unpack_from("<H", wav, 20)[0] == tag
    dec = decode_wav(wav)
    assert (dec.n_channels, dec.sample_rate, dec.bit_depth,
            dec.n_frames) == (1, 8000, 8, 301)
    e = ulaw_encode_sample if law == "mu" else alaw_encode_sample
    d = ulaw_decode_byte if law == "mu" else alaw_decode_byte
    assert dec.samples == [d(e(x)) for x in src]


def test_g711_extensible_wrap_and_audio_stage():
    from docling_graph_spark.kernels.media_stub import (
        decode_media, sniff_media_type)
    from docling_graph_spark.kernels.wav_codec import (
        decode_wav, encode_wav_g711)

    src = [0, 100, -100, 5000, -5000, 32000, -32000] * 10
    plain = encode_wav_g711(16000, 1, src, law="a")
    wrapped = encode_wav_g711(16000, 1, src, law="a", extensible=True)
    assert decode_wav(wrapped).samples == decode_wav(plain).samples
    assert sniff_media_type(plain) == "audio/wav"
    dec = decode_media(plain, "audio/wav")
    assert dec.n_frames == len(src) and sum(
        abs(s) for s in dec.samples) > 0


def test_pcm24_roundtrip():
    from docling_graph_spark.kernels.wav_codec import (decode_wav,
                                                       encode_wav_pcm24)

    src = [0, 1, -1, 8_000_000, -8_000_000, (1 << 23) - 1, -(1 << 23)]
    dec = decode_wav(encode_wav_pcm24(48000, 1, src))
    assert (dec.n_channels, dec.sample_rate, dec.bit_depth,
            dec.n_frames) == (1, 48000, 24, len(src))
    assert dec.samples == src
