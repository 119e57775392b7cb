"""Ogg Vorbis lossy audio codec (kernels/vorbis_codec.py).

Vorbis streams are self-describing by spec design (every codebook /
floor / residue config travels in the setup header), so
encoder/decoder roundtrips exercise the whole machinery for real:
Ogg framing + CRC, canonical codeword assignment, VQ lookup, floor1
synthesis with the closed-form inverse-dB table, residue type 2 with
classwords and the silent class, square-polar coupling, IMDCT +
window + overlap-add.  The strong invariant mirrors the VP8 suite:
the decoder's PCM must equal the encoder's own intended
reconstruction EXACTLY (any bit, codeword, table or transform desync
anywhere breaks it).
"""

from __future__ import annotations

import math
import random
import struct

import numpy as np
import pytest

from docling_graph_spark.kernels import vorbis_codec as VC


def _tone(T, freq=440.0, amp=12000, rate=8000, phase=0.0):
    return [int(amp * math.sin(2 * math.pi * freq * t / rate + phase))
            for t in range(T)]


def _expected(channels, T, n, bits, couple):
    """Replay the encoder's quantized levels through the float
    synthesis — the exact PCM a correct decoder must produce."""
    ch = len(channels)
    n2 = n // 2
    n_frames = max(2, -(-T // n2) + 1)
    sig = [np.zeros((n_frames + 1) * n2) for _ in range(ch)]
    for c in range(ch):
        sig[c][n2:n2 + T] = np.asarray(channels[c], float) / 32768.0
    C = VC._imdct_matrix(n)
    w = VC._vorbis_window(n)
    levels = (1 << bits) + 1
    delta = 8.0 / (levels - 1)
    lim = 2.0 if couple else 4.0
    acc = [np.zeros((n_frames + 2) * n2) for _ in range(ch)]
    center = -1
    for k in range(n_frames):
        lv = [VC._quantize((4.0 / n) * (C.T @ (w * sig[c][
            k * n2:k * n2 + n])), lim, delta, levels)
            for c in range(ch)]
        if couple:
            l_ = VC._VMIN + delta * lv[0]
            r_ = VC._VMIN + delta * lv[1]
            m = np.where(l_ >= r_, np.where(l_ > 0, l_, r_),
                         np.where(r_ > 0, r_, l_))
            a = np.where(l_ >= r_, np.where(l_ > 0, l_ - r_, r_ - l_),
                         np.where(r_ > 0, l_ - r_, r_ - l_))
            # decoder-side inverse of the coupling
            mq = VC._VMIN + delta * VC._quantize(m, 4.0, delta, levels)
            aq = VC._VMIN + delta * VC._quantize(a, 4.0, delta, levels)
            # the spec's four-case inverse coupling
            L = np.where(mq > 0, np.where(aq > 0, mq, mq + aq),
                         np.where(aq > 0, mq, mq - aq))
            R = np.where(mq > 0, np.where(aq > 0, mq - aq, mq),
                         np.where(aq > 0, mq + aq, mq))
            vecs = [L, R]
        else:
            vecs = [VC._VMIN + delta * v for v in lv]
        if center < 0:
            center = n2
            first = center
        else:
            center += n2
        for c in range(ch):
            acc[c][center - n2:center + n2] += w * (C @ vecs[c])
    out = []
    for c in range(ch):
        vals = acc[c][first:center][:T]
        out.append(np.clip(np.rint(vals * 32767.0), -32768,
                           32767).astype(int))
    return out


def test_ogg_crc_and_framing_roundtrip():
    pkts = [b"hello", b"x" * 300, b"", b"tail"]
    page = VC.ogg_page(7, 3, 1234, pkts)
    got = list(VC.ogg_pages(page))
    assert len(got) == 1
    htype, granule, serial, packets, tail = got[0]
    assert granule == 1234 and serial == 7 and packets == pkts
    corrupt = bytearray(page)
    corrupt[-1] ^= 1
    with pytest.raises(ValueError, match="CRC"):
        list(VC.ogg_pages(bytes(corrupt)))


def test_codeword_assignment_canonical():
    """Spec example semantics: entries get the numerically lowest
    available codeword of their length, in entry order."""
    codes = VC.assign_codewords([2, 4, 4, 4, 4, 2, 3, 3])
    assert codes[0] == (0b00, 2)
    assert codes[1] == (0b0100, 4)
    assert codes[2] == (0b0101, 4)
    assert codes[3] == (0b0110, 4)
    assert codes[4] == (0b0111, 4)
    assert codes[5] == (0b10, 2)
    assert codes[6] == (0b110, 3)
    assert codes[7] == (0b111, 3)


def test_float32_pack_unpack_exact_dyadics():
    for v in (0.0, 1.0, -4.0, 0.125, 0.015625, -0.001953125):
        assert VC.float32_unpack(VC.float32_pack(v)) == v


def test_inverse_db_closed_form_endpoints():
    assert abs(VC.INVERSE_DB[0] - 1.0649863e-07) < 1e-13
    assert VC.INVERSE_DB[255] == 1.0


def test_silence_decodes_to_exact_zeros():
    for ch, T in [(1, 500), (2, 333)]:
        ogg = VC.encode_vorbis([[0] * T] * ch, 8000)
        dec = VC.decode_vorbis(ogg)
        assert dec.n_channels == ch and dec.sample_rate == 8000
        assert dec.n_frames == T and dec.bit_depth == 16
        assert all(s == 0 for s in dec.samples)


@pytest.mark.parametrize("couple", [False, True])
@pytest.mark.parametrize("bits", [9, 12])
def test_decode_equals_intended_reconstruction(couple, bits):
    T = 700
    chans = [_tone(T), _tone(T, 250.0, 9000, phase=1.0)]
    ogg = VC.encode_vorbis(chans, 8000, couple=couple, bits=bits)
    dec = VC.decode_vorbis(ogg)
    exp = _expected(chans, T, 256, bits, couple)
    got = [np.array(dec.samples[c::2]) for c in range(2)]
    for c in range(2):
        assert np.array_equal(got[c], exp[c]), (couple, bits, c)


def test_mono_quality_scales_with_bits():
    T = 2000
    tone = _tone(T)
    errs = {}
    for bits in (9, 12):
        dec = VC.decode_vorbis(VC.encode_vorbis([tone], 8000,
                                                bits=bits))
        errs[bits] = max(abs(a - b)
                         for a, b in zip(dec.samples, tone))
    assert errs[12] < errs[9] / 3
    assert errs[12] < 800                # ~2.4% of full scale


def test_blocksize_variants():
    T = 1500
    tone = _tone(T, 300.0)
    for n in (128, 256, 512):
        dec = VC.decode_vorbis(VC.encode_vorbis([tone], 8000,
                                                blocksize=n, bits=12))
        assert dec.n_frames == T
        err = max(abs(a - b) for a, b in zip(dec.samples, tone))
        assert err < 1500, (n, err)


def test_mixed_content_with_silent_partitions():
    """Half silence, half tone: the silent class and the coded class
    coexist within a stream, and silence regions decode near-zero."""
    T = 1024
    pcm = [0] * 512 + _tone(512, 500.0)
    ogg = VC.encode_vorbis([pcm], 8000, bits=12)
    dec = VC.decode_vorbis(ogg)
    assert dec.n_frames == T
    assert max(abs(s) for s in dec.samples[:300]) < 400


def test_compression_on_sparse_content():
    """Silence must code far below raw size through the silent class."""
    T = 8000
    ogg = VC.encode_vorbis([[0] * T], 8000)
    assert len(ogg) < T // 4             # vs 16 kB raw


def test_decode_media_integration():
    from docling_graph_spark.kernels.media_stub import (decode_media,
                                                        sniff_media_type)

    ogg = VC.encode_vorbis([_tone(400)], 16000)
    assert sniff_media_type(ogg) == "audio/ogg"
    dec = decode_media(ogg, "audio/ogg")
    assert dec.sample_rate == 16000 and dec.n_frames == 400


def test_malformed_and_guard_routes():
    ogg = bytearray(VC.encode_vorbis([[0] * 200], 8000))
    with pytest.raises(ValueError, match="OggS"):
        VC.decode_vorbis(b"not ogg at all")
    bad = bytearray(ogg)
    bad[40] ^= 0xFF                      # corrupt first page body
    with pytest.raises(ValueError):
        VC.decode_vorbis(bytes(bad))
    # granule bomb: declare absurd sample count on the last page
    bomb = bytearray(ogg)
    # find last page and patch granule
    pos = bomb.rfind(b"OggS")
    bomb[pos + 6:pos + 14] = struct.pack("<q", 1 << 40)
    bomb[pos + 22:pos + 26] = b"\x00" * 4
    lace_n = bomb[pos + 26]
    body = bytes(bomb[pos:pos + 27 + lace_n
                      + sum(bomb[pos + 27:pos + 27 + lace_n])])
    crc = VC._ogg_crc(body)
    bomb[pos + 22:pos + 26] = struct.pack("<I", crc)
    with pytest.raises(ValueError, match="guard"):
        VC.decode_vorbis(bytes(bomb))
    with pytest.raises(ValueError):
        VC.decode_vorbis(bytes(ogg[:60]))


def test_corruption_fuzz_never_hangs_or_crashes_unrouted():
    rng = random.Random(5)
    ogg = bytearray(VC.encode_vorbis([_tone(600)], 8000))
    for _ in range(40):
        mut = bytearray(ogg)
        mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
        try:
            VC.decode_vorbis(bytes(mut))
        except (ValueError, NotImplementedError, IndexError,
                KeyError, ZeroDivisionError):
            pass


# ---------------------------------------------------------------------------
# Round 5 continuation: long/short blocksize transitions
# ---------------------------------------------------------------------------


def test_long_short_transitions_roundtrip():
    """Two blocksizes with blockflag modes: the transition windows and
    center-aligned overlap-add must reconstruct across every
    long->short and short->long boundary (frame k long iff k%3==1)."""
    T = 2500
    tone = _tone(T)
    ogg = VC.encode_vorbis([tone], 8000, blocksize=128,
                           long_blocksize=512, bits=12)
    dec = VC.decode_vorbis(ogg)
    assert dec.n_frames == T
    assert max(abs(a - b) for a, b in zip(dec.samples, tone)) < 2000


def test_long_short_silence_exact():
    dec = VC.decode_vorbis(VC.encode_vorbis([[0] * 900], 8000,
                                            blocksize=128,
                                            long_blocksize=512))
    assert dec.n_frames == 900 and all(s == 0 for s in dec.samples)


def test_long_short_stereo_coupled():
    T = 1800
    l = _tone(T)
    r = _tone(T, 250.0, 9000, phase=1.0)
    dec = VC.decode_vorbis(VC.encode_vorbis(
        [l, r], 8000, blocksize=128, long_blocksize=512,
        couple=True, bits=12))
    assert dec.n_frames == T
    assert max(abs(a - b) for a, b in zip(dec.samples[0::2], l)) < 2500
    assert max(abs(a - b) for a, b in zip(dec.samples[1::2], r)) < 2500


def test_long_first_block_margin():
    """A stream can lead with content that the first LONG block's left
    half windows into pre-stream silence — the decoder's margin must
    keep the slice in range (the latent negative-index bug the
    two-blocksize path exposed)."""
    T = 700
    tone = _tone(T, 500.0)
    for n0, n1 in [(64, 1024), (128, 256)]:
        dec = VC.decode_vorbis(VC.encode_vorbis(
            [tone], 8000, blocksize=n0, long_blocksize=n1, bits=12))
        assert dec.n_frames == T


def test_ogg_opus_routes_by_name_with_header_probe():
    import struct

    import pytest

    from docling_graph_spark.kernels.media_probe import probe_audio
    from docling_graph_spark.kernels.vorbis_codec import (
        decode_vorbis, ogg_page)

    head = (b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 312)
            + struct.pack("<I", 48000) + struct.pack("<h", 0)
            + bytes([0]))
    ogg = ogg_page(7, 0, 0, [head], 0x02) \
        + ogg_page(7, 1, 960, [b"\xfc\xff\xfe"], 0x04)
    with pytest.raises(NotImplementedError, match="Opus"):
        decode_vorbis(ogg)
    hdr = probe_audio(ogg)
    assert hdr is not None
    assert (hdr.media_type, hdr.n_channels, hdr.sample_rate) == \
        ("audio/opus", 2, 48000)


def test_ogg_flac_routes_by_name():
    import pytest

    from docling_graph_spark.kernels.vorbis_codec import (
        decode_vorbis, ogg_page)

    ogg = ogg_page(9, 0, 0, [b"\x7fFLAC\x01\x00" + bytes(8)], 0x02) \
        + ogg_page(9, 1, 100, [bytes(4)], 0x04)
    with pytest.raises(NotImplementedError, match="FLAC"):
        decode_vorbis(ogg)


def test_opus_through_audio_stage_header_only(spark):
    import struct

    from docling_graph_spark.kernels.vorbis_codec import ogg_page
    from docling_graph_spark.operators import multimodal as mm

    head = (b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 312)
            + struct.pack("<I", 24000) + struct.pack("<h", 0)
            + bytes([0]))
    ogg = ogg_page(7, 0, 0, [head], 0x02) \
        + ogg_page(7, 1, 960, [b"\xfc\xff\xfe"], 0x04)
    df = spark.createDataFrame([("op", ogg)], "url string, html binary")
    r = mm.audio_decode_stats(df).collect()[0]
    assert not r.decoded and r.decode_error == "header-only"
    assert (r.n_channels, r.sample_rate) == (1, 24000)


def test_packet_count_guard_applies_with_small_granule():
    """A hostile stream with a tiny declared granule but a huge packet
    count must be rejected before the accumulator grows (CPU/memory
    guard independent of the granule)."""
    import math

    import pytest

    from docling_graph_spark.kernels.vorbis_codec import (
        decode_vorbis, encode_vorbis, ogg_pages, ogg_page)

    rate = 8000
    pcm = [[int(8000 * math.sin(2 * math.pi * 440 * t / rate))
            for t in range(300)]]
    ogg = encode_vorbis(pcm, rate, blocksize=128)
    pkts = []
    for _h, _g, _s, ps, _t in ogg_pages(ogg):
        pkts.extend(ps)
    # rebuild: same headers, one audio packet repeated far past the
    # guard, final granule kept tiny
    audio = pkts[3]
    n = 2_000_000 // 64 + 10          # > max_samples/(bs0/2) packets
    pages = [ogg_page(1, 0, 0, pkts[:1], 0x02),
             ogg_page(1, 1, 0, pkts[1:3])]
    seq = 2
    for i in range(0, n, 100):
        pages.append(ogg_page(1, seq, 5, [audio] * min(100, n - i)))
        seq += 1
    hostile = b"".join(pages)
    with pytest.raises(ValueError, match="decode guard"):
        decode_vorbis(hostile, max_samples=2_000_000 // 16)


def test_corrupt_setup_routes_value_error():
    """Corrupt setup headers (out-of-range codebook runs, undefined
    mapping/floor/residue/book references) must raise the routed
    ValueError, never an IndexError mid-synthesis — found by WebM
    container fuzzing."""
    import math

    import pytest

    from docling_graph_spark.kernels.vorbis_codec import (
        _parse_ident, _parse_setup, decode_vorbis, encode_vorbis,
        ogg_pages)

    rate = 8000
    pcm = [[int(8000 * math.sin(2 * math.pi * 440 * t / rate))
            for t in range(300)]]
    ogg = encode_vorbis(pcm, rate, blocksize=128)
    pkts = []
    for _h, _g, _s, ps, _t in ogg_pages(ogg):
        pkts.extend(ps)
    info = _parse_ident(pkts[0])
    setup = bytearray(pkts[2])
    # brute mutation sweep over the whole setup packet: every mutation
    # must either parse or raise ValueError/NotImplementedError
    for pos in range(7, len(setup)):
        for val in (0x00, 0xFF, setup[pos] ^ 0x10):
            mut = bytearray(setup)
            mut[pos] = val
            try:
                _parse_setup(bytes(mut), info.channels)
            except (ValueError, NotImplementedError):
                pass
