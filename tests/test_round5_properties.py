"""Property-based tests (hypothesis) for the round-5 kernels.

Each property is an algebraic identity the implementation must hold on
ARBITRARY inputs — the class of bug the fixture matrices can miss:
LZW/bool-coder roundtrip identities, prefix-code validity of the
Vorbis codeword allocator, WordPiece trainer soundness, and the
quantizer-bounded Vorbis reconstruction error.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from docling_graph_spark.kernels import tiff_codec as T
from docling_graph_spark.kernels import vorbis_codec as VC
from docling_graph_spark.kernels import vp8_codec as V8
from docling_graph_spark.kernels import wordpiece as wp

_FAST = settings(max_examples=60, deadline=None)


@_FAST
@given(st.binary(min_size=0, max_size=4000))
def test_tiff_lzw_roundtrip_identity(data):
    enc = T._lzw_encode(data)
    assert T._lzw_decode(enc, len(data)) == data


@_FAST
@given(st.binary(min_size=1, max_size=2000))
def test_tiff_packbits_roundtrip_identity(data):
    assert T._packbits_decode(T._packbits_encode(data),
                              len(data)) == data


@_FAST
@given(st.lists(st.tuples(st.integers(1, 255), st.integers(0, 1)),
                min_size=1, max_size=600))
def test_vp8_bool_coder_roundtrip(seq):
    be = V8._BoolEncoder()
    for p, b in seq:
        be.put(p, b)
    bd = V8._BoolDecoder(be.flush())
    for p, b in seq:
        assert bd.get(p) == b


@_FAST
@given(st.integers(-2048, 2047), st.integers(-2048, 2047),
       st.integers(-2048, 2047), st.integers(-2048, 2047))
def test_vp8_fdct_idct_dc_bound(a, b, c, d):
    """For blocks built from the encoder's float forward transform,
    the integer inverse reconstructs within the documented rounding
    bound (exercised off the fixture grid)."""
    resid = [a, b, c, d] * 4
    coeffs = V8._fdct4x4(resid)
    out = V8._idct4x4(coeffs)
    assert all(abs(x - y) <= 2 for x, y in zip(out, resid))


@_FAST
@given(st.lists(st.integers(1, 12), min_size=1, max_size=80))
def test_vorbis_codeword_assignment_prefix_free(lengths):
    """Whenever the allocator succeeds, the assignment is prefix-free
    with the requested lengths and deterministic; when the lengths are
    oversubscribed (Kraft > 1) it must raise, never emit a colliding
    code."""
    kraft = sum(2.0 ** -l for l in lengths)
    try:
        codes = VC.assign_codewords(lengths)
    except ValueError:
        assert kraft > 1.0 + 1e-12
        return
    assert len(codes) == len(lengths)
    items = [(format(c, f"0{ln}b")) for c, ln in codes.values()]
    for i, a in enumerate(items):
        for j, b in enumerate(items):
            if i != j:
                assert not b.startswith(a)
    assert codes == VC.assign_codewords(lengths)


@_FAST
@given(st.lists(st.tuples(st.text(alphabet="abcdef", min_size=1,
                                  max_size=8),
                          st.integers(1, 50)),
                min_size=1, max_size=30),
       st.integers(0, 40))
def test_wordpiece_trainer_sound(word_freqs, n_merges):
    """Trainer invariants on arbitrary corpora: deterministic output,
    at most n_merges pieces, every piece reconstructible from corpus
    characters, and tokenizing any corpus word with the trained vocab
    never produces [UNK] (the alphabet always covers it)."""
    merges = wp.train_wordpiece(word_freqs, n_merges)
    assert merges == wp.train_wordpiece(word_freqs, n_merges)
    assert len(merges) <= n_merges
    chars = {c for w, _ in word_freqs for c in w}
    for piece in merges:
        assert set(piece.replace("#", "")) <= chars
    vocab_lines = ["[UNK]"] + sorted(chars) \
        + ["##" + c for c in sorted(chars)] + merges
    vocab = wp.load_vocab(vocab_lines)
    for w, _ in word_freqs:
        assert wp.wordpiece_word(w, vocab) != ["[UNK]"]


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(-30000, 30000), min_size=1, max_size=700),
       st.sampled_from([128, 256]))
def test_vorbis_roundtrip_error_bounded(pcm, blocksize):
    """decode(encode(x)) preserves length exactly and stays within the
    scalar-quantizer error envelope on arbitrary PCM."""
    ogg = VC.encode_vorbis([pcm], 8000, blocksize=blocksize, bits=12)
    dec = VC.decode_vorbis(ogg)
    assert dec.n_frames == len(pcm)
    # analytic worst case: per-coefficient quantizer error <= delta/2,
    # |cos| <= 1 and window <= 1 across n/2 coefficients and the two
    # overlapping frames -> delta/2 * (n/2) * 2 in the unit domain
    bound = int(32768 * (8.0 / 4096 / 2) * (blocksize / 2) * 2) + 64
    assert all(abs(a - b) <= bound
               for a, b in zip(dec.samples, pcm))


# ---------------------------------------------------------------------------
# Round-5 second continuation: container-walk robustness.  The tag /
# subtitle surfaces are advisory metadata — ARBITRARY bytes and
# mutations of valid containers must degrade to empty/partial results
# or (for decode entry points) a routed ValueError, never any other
# exception class and never a hang.


@_FAST
@given(st.binary(min_size=0, max_size=3000))
def test_media_tags_never_raise_on_arbitrary_bytes(data):
    from docling_graph_spark.kernels import media_tags as MT

    for fn in (MT.text_tags, MT.read_mp4_tags, MT.read_webm_tags):
        assert isinstance(fn(data), dict)


@_FAST
@given(st.binary(min_size=0, max_size=2000))
def test_mp4_subtitle_text_never_raises(data):
    from docling_graph_spark.kernels.mp4_parse import mp4_subtitle_text

    assert isinstance(mp4_subtitle_text(data), str)
    assert isinstance(
        mp4_subtitle_text(b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00"
                          + data), str)


@_FAST
@given(st.integers(0, 10_000), st.integers(0, 255),
       st.data())
def test_webm_mutations_route_cleanly(pos, byte, data):
    """Single-byte mutations of a valid WebM must either still parse
    or raise exactly ValueError/NotImplementedError from the decode
    entry points; the extraction route never raises at all."""
    from docling_graph_spark.kernels import webm_codec as WC
    from docling_graph_spark.kernels.vp8_codec import (
        encode_vp8, rgb_to_yuv420)
    from docling_graph_spark.operators.extract import _route_payload

    y, u, v = rgb_to_yuv420(16, 16, bytes([120]) * 768)
    frame = encode_vp8(16, 16, y, u, v)
    base = WC.encode_webm_vp8(16, 16, [frame],
                              title="t", tags={"ARTIST": "a"})
    mut = bytearray(base)
    mut[pos % len(mut)] = byte
    mut = bytes(mut)
    try:
        WC.decode_webm(mut)
    except (ValueError, NotImplementedError):
        pass
    _text, _spans, _n, kind, _err = _route_payload(mut, None)
    assert isinstance(kind, str)
