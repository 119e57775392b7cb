"""Pure-Python WAV (RIFF PCM) codec — the REAL audio decoder.

The media stage treats audio payloads as opaque binary columns with
stubbed decode (`media_stub.decode_media`) because no audio libraries ship
in this container — but canonical PCM WAV needs nothing beyond ``struct``,
so this module provides a real decode path: RIFF header walk, ``fmt ``
parse, ``data`` chunk extraction, and integer sample decode for the
uncompressed PCM layouts (8-bit unsigned; 16/24/32-bit signed
little-endian, WAVE_FORMAT_PCM = 1 per RIFF/Multimedia Programming
Interface spec) plus IEEE-float (format 3, 32/64-bit, quantized to the
16-bit integer lattice) and G.711 telephony companding (format 7
mu-law / 6 A-law, 8-bit code points expanded by the formulaic segment
curves — voicemail/IVR recordings crawls actually carry).  Other
compressed formats (ADPCM, MP3-in-RIFF) raise — the caller routes that
to a ``decode_error`` column, never a crash.

The encoder half exists for fixtures and oracles: a fixed header layout
with no optional chunks makes encode→decode a pure roundtrip, so tests
and the DuckDB oracle can reason about decoded samples in closed form.

This is the audio analogue of the reference's binary-input handling
(`core/input/types.py:39-105` detects by magic bytes; decode itself is
delegated to external converters there) — here the container-feasible
subset is decoded for real, mirroring `kernels/png_codec.py` for images.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

WAVE_FORMAT_PCM = 1
WAVE_FORMAT_IEEE_FLOAT = 3
WAVE_FORMAT_ALAW = 6
WAVE_FORMAT_MULAW = 7
WAVE_FORMAT_EXTENSIBLE = 0xFFFE
# KSDATAFORMAT_SUBTYPE_* GUID remainder after the format-tag u16
_KS_GUID_TAIL = bytes((0x00, 0x00, 0x00, 0x00, 0x10, 0x00, 0x80, 0x00,
                       0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71))


def _quant16(f: float) -> int:
    """Round-half-away-from-zero quantization of a float sample to the
    16-bit lattice — deterministic across platforms (IEEE-754 doubles),
    keeping downstream integer statistics exact."""
    import math

    scaled = f * 32768.0
    return (int(math.floor(scaled + 0.5)) if scaled >= 0
            else -int(math.floor(-scaled + 0.5)))


def encode_wav_float32(sample_rate: int, n_channels: int,
                       samples) -> bytes:
    """IEEE-float WAV fixture encoder (format code 3, 32-bit floats)."""
    import struct as _s

    data = _s.pack("<%df" % len(samples), *samples)
    byte_rate = sample_rate * n_channels * 4
    fmt = _s.pack("<HHIIHH", WAVE_FORMAT_IEEE_FLOAT, n_channels,
                  sample_rate, byte_rate, n_channels * 4, 32)
    body = (b"fmt " + _s.pack("<I", len(fmt)) + fmt
            + b"data" + _s.pack("<I", len(data)) + data)
    return b"RIFF" + _s.pack("<I", 4 + len(body)) + b"WAVE" + body


# ---------------------------------------------------------------------------
# G.711 companding (formats 6/7) — fully formulaic per ITU-T G.711's
# segmented quasi-logarithmic curves, no empirically-trained tables:
# every value below derives from the segment arithmetic, so the decoder
# is verifiable offline (unlike e.g. VP8's default probability tables).
# ---------------------------------------------------------------------------

_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635


def ulaw_decode_byte(u: int) -> int:
    """One mu-law code point -> 16-bit linear (G.711 table 2a/2b)."""
    u = ~u & 0xFF
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    t = (((mantissa << 3) + _ULAW_BIAS) << exponent) - _ULAW_BIAS
    return -t if u & 0x80 else t


def ulaw_encode_sample(pcm: int) -> int:
    """16-bit linear -> mu-law code point (segment + mantissa search
    expressed in closed form via the bit length)."""
    sign = 0x80 if pcm < 0 else 0
    if sign:
        pcm = -pcm
    if pcm > _ULAW_CLIP:
        pcm = _ULAW_CLIP
    pcm += _ULAW_BIAS
    exponent = max(pcm.bit_length() - 8, 0)
    mantissa = (pcm >> (exponent + 3)) & 0x0F
    return ~(sign | (exponent << 4) | mantissa) & 0xFF


def alaw_decode_byte(a: int) -> int:
    """One A-law code point -> 16-bit linear (G.711 table 1a/1b; the
    13-bit magnitude scaled by 8, even-bit-inverted transmission
    convention)."""
    a ^= 0x55
    t = (a & 0x0F) << 4
    seg = (a >> 4) & 0x07
    if seg == 0:
        t += 8
    else:
        t = (t + 0x108) << (seg - 1)
    return t if a & 0x80 else -t


def alaw_encode_sample(pcm: int) -> int:
    """16-bit linear -> A-law code point."""
    pcm >>= 3                         # to the 13-bit domain (floor)
    if pcm >= 0:
        mask = 0xD5
    else:
        mask = 0x55
        pcm = -pcm - 1
    if pcm > 0x1FFF:
        pcm = 0x1FFF
    seg = max(pcm.bit_length() - 5, 0)
    if seg == 0:
        aval = (pcm >> 1) & 0x0F
    else:
        aval = (seg << 4) | ((pcm >> seg) & 0x0F)
    return aval ^ mask


def encode_wav_g711(sample_rate: int, n_channels: int, samples: list,
                    law: str = "mu",
                    extensible: bool = False) -> bytes:
    """G.711 WAV fixture encoder (format 7 mu-law / 6 A-law, 8-bit
    code points); with ``extensible`` the format tag is wrapped in a
    WAVE_FORMAT_EXTENSIBLE fmt chunk like modern writers do."""
    enc = ulaw_encode_sample if law == "mu" else alaw_encode_sample
    tag = WAVE_FORMAT_MULAW if law == "mu" else WAVE_FORMAT_ALAW
    data = bytes(enc(s) for s in samples)
    block_align = n_channels
    byte_rate = sample_rate * block_align
    if extensible:
        fmt = struct.pack("<HHIIHH", WAVE_FORMAT_EXTENSIBLE, n_channels,
                          sample_rate, byte_rate, block_align, 8)
        fmt += struct.pack("<HHI", 22, 8, 0)    # cbSize, valid bits, mask
        fmt += struct.pack("<H", tag) + _KS_GUID_TAIL
    else:
        fmt = struct.pack("<HHIIHH", tag, n_channels, sample_rate,
                          byte_rate, block_align, 8)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    if len(data) & 1:
        body += b"\x00"               # RIFF word-alignment pad
    return b"RIFF" + struct.pack("<I", len(body)) + body


class DecodedWav(NamedTuple):
    n_channels: int
    sample_rate: int
    bit_depth: int
    n_frames: int          # samples per channel
    samples: list          # interleaved integer samples (all channels)


def encode_wav_pcm16(sample_rate: int, n_channels: int,
                     samples: list) -> bytes:
    """Canonical 16-bit PCM WAV: RIFF + fmt(16) + data, no optional chunks.

    ``samples`` are interleaved int16 values; ``len(samples)`` must be a
    multiple of ``n_channels``.
    """
    if n_channels <= 0:
        raise ValueError("n_channels must be positive")
    if len(samples) % n_channels:
        raise ValueError("sample count not a multiple of channel count")
    data = struct.pack("<%dh" % len(samples), *samples)
    block_align = n_channels * 2
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", WAVE_FORMAT_PCM, n_channels, sample_rate,
                      byte_rate, block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> DecodedWav:
    """Decode a PCM WAV payload to integer samples.

    Walks RIFF sub-chunks (tolerating extras like LIST/fact in any order,
    with the spec's odd-size pad byte), requires a ``fmt `` chunk with
    WAVE_FORMAT_PCM and bit depth 8/16/24/32, and decodes the ``data`` chunk:
    8-bit as unsigned 0..255, 16/32-bit as signed little-endian.  Raises
    ValueError on structural corruption and NotImplementedError on
    compressed formats.
    """
    b = payload
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    riff_size = struct.unpack_from("<I", b, 4)[0]
    if riff_size + 8 > len(b):
        raise ValueError("truncated RIFF payload")

    fmt_fields = None
    fmt_ext = None
    data = None
    pos = 12
    end = min(len(b), 8 + riff_size)  # trailing bytes after the RIFF
    while pos + 8 <= end:             # container are not chunks
        cid = b[pos:pos + 4]
        csize = struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8: min(pos + 8 + csize, end)]
        if len(body) < csize:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError("fmt chunk too small")
            fmt_fields = struct.unpack_from("<HHIIHH", body, 0)
            fmt_ext = body[16:]
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned

    if fmt_fields is None:
        raise ValueError("missing fmt chunk")
    if data is None:
        raise ValueError("missing data chunk")
    audio_format, n_channels, sample_rate, _rate, _align, bits = fmt_fields
    if audio_format == WAVE_FORMAT_EXTENSIBLE:
        # round 5: the modern default for >2ch / >16-bit writers wraps
        # the real format in a fmt-chunk extension: cbSize(2) +
        # valid-bits(2) + channel mask(4) + SubFormat GUID whose first
        # u16 is the wrapped format tag (KSDATAFORMAT_SUBTYPE_* GUIDs
        # share the fixed remainder)
        if fmt_ext is None or len(fmt_ext) < 24:
            raise ValueError("extensible WAV missing SubFormat")
        audio_format = struct.unpack_from("<H", fmt_ext, 8)[0]
        if fmt_ext[10:24] != _KS_GUID_TAIL:
            raise NotImplementedError(
                "extensible WAV with a non-KS SubFormat GUID")
    if audio_format == WAVE_FORMAT_IEEE_FLOAT:
        if n_channels <= 0 or sample_rate <= 0:
            raise ValueError("invalid channel count or sample rate")
        if bits == 32:
            fw, fn = "<%df", 4
        elif bits == 64:
            fw, fn = "<%dd", 8
        else:
            raise NotImplementedError(
                f"IEEE-float WAV with {bits}-bit samples")
        usable = len(data) - len(data) % fn
        floats = struct.unpack(fw % (usable // fn), data[:usable])
        # deterministic integer quantization to the 16-bit lattice
        # (round half away from zero), so the abs-sum/peak statistics
        # stay exact-integer like the PCM path
        samples = [_quant16(f) for f in floats]
        n_frames = len(samples) // n_channels
        return DecodedWav(n_channels, sample_rate, bits, n_frames,
                          samples)
    if audio_format in (WAVE_FORMAT_ALAW, WAVE_FORMAT_MULAW):
        # G.711 telephony companding: 8-bit code points expand to the
        # 16-bit lattice via the formulaic segment curves above
        if n_channels <= 0 or sample_rate <= 0:
            raise ValueError("invalid channel count or sample rate")
        if bits != 8:
            raise ValueError(f"G.711 WAV with {bits}-bit code points")
        dec = (ulaw_decode_byte if audio_format == WAVE_FORMAT_MULAW
               else alaw_decode_byte)
        table = [dec(v) for v in range(256)]
        samples = [table[v] for v in data]
        n_frames = len(samples) // n_channels
        return DecodedWav(n_channels, sample_rate, 8, n_frames, samples)
    if audio_format != WAVE_FORMAT_PCM:
        raise NotImplementedError(
            f"compressed WAV format {audio_format} requires codecs "
            "not present in this container")
    if n_channels <= 0 or sample_rate <= 0:
        raise ValueError("invalid channel count or sample rate")
    if bits == 8:
        samples = list(data)
        width = 1
    elif bits == 16:
        width = 2
        usable = len(data) - len(data) % width
        samples = list(struct.unpack("<%dh" % (usable // width),
                                     data[:usable]))
    elif bits == 24:
        # studio-interchange depth: 3-byte little-endian signed
        width = 3
        usable = len(data) - len(data) % width
        samples = [int.from_bytes(data[i:i + 3], "little", signed=True)
                   for i in range(0, usable, 3)]
    elif bits == 32:
        width = 4
        usable = len(data) - len(data) % width
        samples = list(struct.unpack("<%di" % (usable // width),
                                     data[:usable]))
    else:
        raise NotImplementedError(f"unsupported PCM bit depth {bits}")
    n_frames = len(samples) // n_channels
    return DecodedWav(n_channels, sample_rate, bits, n_frames, samples)


def encode_wav_pcm24(sample_rate: int, n_channels: int,
                     samples: list) -> bytes:
    """24-bit PCM WAV fixture (3-byte little-endian signed)."""
    data = b"".join(s.to_bytes(3, "little", signed=True)
                    for s in samples)
    block_align = n_channels * 3
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", WAVE_FORMAT_PCM, n_channels,
                      sample_rate, byte_rate, block_align, 24)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body
