"""Audio text-tag extraction (kernels/media_tags.py): ID3v2, Vorbis
comments (Ogg + FLAC), RIFF INFO — tags are corpus text, parsed
boundedly and never fatally."""

import pytest

from docling_graph_spark.kernels.media_tags import (
    add_riff_info, audio_text_tags, make_id3v2, read_flac_comments,
    read_id3v2, read_ogg_comments, read_riff_info)

TAGS = {"title": "Über Song", "artist": "Ann O'Nym",
        "album": "Crawl Vol. 1", "comment": "from a test"}


@pytest.mark.parametrize("version", [3, 4])
def test_id3v2_roundtrip(version):
    blob = make_id3v2(TAGS, version=version, audio=b"\xff\xfb\x90\x00")
    got = read_id3v2(blob)
    assert got["title"] == TAGS["title"]
    assert got["artist"] == TAGS["artist"]
    assert got["album"] == TAGS["album"]
    assert got["comment"] == TAGS["comment"]
    # dispatch: leading ID3 routes to the ID3 parser
    assert audio_text_tags(blob) == got


def test_id3v2_malformed_never_raises():
    good = make_id3v2(TAGS, version=3)
    for b in (b"", b"ID3", good[:15], good[:40],
              b"ID3\x07\x00\x00\x00\x00\x00\x20" + b"\xff" * 32,
              bytes(64)):
        assert isinstance(read_id3v2(b), dict)


def test_ogg_vorbis_comments_roundtrip():
    from docling_graph_spark.kernels.vorbis_codec import (
        decode_vorbis, encode_vorbis)

    ogg = encode_vorbis([[0] * 64], 8000, blocksize=128,
                        comments=TAGS)
    got = read_ogg_comments(ogg)
    assert got["title"] == TAGS["title"]
    assert got["comment"] == TAGS["comment"]
    assert audio_text_tags(ogg) == got
    # the stream still decodes (the comment header stays conformant)
    dec = decode_vorbis(ogg)
    assert dec.n_frames == 64 and all(s == 0 for s in dec.samples)


def test_flac_vorbis_comment_block_roundtrip():
    from docling_graph_spark.kernels.flac_codec import (
        decode_flac, encode_flac)

    samples = [((k * 13) % 101) - 50 for k in range(100)]
    fl = encode_flac([samples], blocksize=64, comments=TAGS)
    got = read_flac_comments(fl)
    assert got["title"] == TAGS["title"]
    assert got["album"] == TAGS["album"]
    assert audio_text_tags(fl) == got
    # the added metadata block leaves decode untouched
    assert decode_flac(fl).samples == samples
    # a comment-free stream yields no tags
    assert read_flac_comments(encode_flac([samples])) == {}


def test_riff_info_roundtrip():
    from docling_graph_spark.kernels.wav_codec import (
        decode_wav, encode_wav_pcm16)

    wav = encode_wav_pcm16(8000, 1, [5, -5] * 20)
    tagged = add_riff_info(wav, TAGS)
    got = read_riff_info(tagged)
    assert got["title"] == TAGS["title"]
    assert got["artist"] == TAGS["artist"]
    assert audio_text_tags(tagged) == got
    # decode_wav is chunk-order agnostic: samples unchanged
    assert decode_wav(tagged).samples == decode_wav(wav).samples
    assert read_riff_info(wav) == {}


def test_dispatch_unknown_and_empty():
    assert audio_text_tags(None) == {}
    assert audio_text_tags(b"") == {}
    assert audio_text_tags(b"\x00\x01\x02\x03" * 10) == {}


def test_media_text_tags_operator(spark):
    from docling_graph_spark.kernels.flac_codec import encode_flac
    from docling_graph_spark.kernels.media_tags import (add_riff_info,
                                                        make_id3v2)
    from docling_graph_spark.kernels.wav_codec import encode_wav_pcm16
    from docling_graph_spark.operators.multimodal import media_text_tags

    rows = [
        ("a-id3", make_id3v2(TAGS, version=4, audio=b"\xff\xfb\x90\x00")),
        ("b-flac", encode_flac([[0] * 64], blocksize=64,
                               comments={"title": "flac title"})),
        ("c-wav", add_riff_info(encode_wav_pcm16(8000, 1, [1, 2]),
                                {"artist": "wav artist"})),
        ("d-untagged", encode_wav_pcm16(8000, 1, [1, 2])),
        ("e-not-audio", b"hello world"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r.url: r for r in media_text_tags(df).collect()}
    assert got["a-id3"].title == TAGS["title"] and got["a-id3"].n_tags == 4
    assert got["b-flac"].title == "flac title"
    assert got["c-wav"].artist == "wav artist"
    assert got["d-untagged"].n_tags == 0
    assert got["e-not-audio"].n_tags == 0


# ------------------------------------------------- image text + ID3v1

def test_png_text_chunks_roundtrip():
    from docling_graph_spark.kernels.media_tags import (add_png_text,
                                                        read_png_text,
                                                        text_tags)
    from docling_graph_spark.kernels.png_codec import (decode_png,
                                                       encode_png_gray)

    png = encode_png_gray(4, 4, bytes(range(16)))
    tagged = add_png_text(png, {"title": "a png", "comment": "desc"})
    got = read_png_text(tagged)
    assert got == {"title": "a png", "comment": "desc"}
    assert text_tags(tagged) == got
    # decoder ignores the inserted ancillary chunks
    assert decode_png(tagged).pixels == decode_png(png).pixels
    # iTXt (UTF-8) variant
    it = add_png_text(png, {"title": "ünïcodé"}, itxt=True)
    assert read_png_text(it)["title"] == "ünïcodé"
    assert read_png_text(png) == {}


def test_gif_comment_extension_roundtrip():
    from docling_graph_spark.kernels.gif_codec import decode_gif, encode_gif
    from docling_graph_spark.kernels.media_tags import (add_gif_comment,
                                                        read_gif_comments,
                                                        text_tags)

    pal = [bytes((i, i, i)) for i in range(4)]
    gif = encode_gif(5, 4, pal, bytes([i % 4 for i in range(20)]))
    tagged = add_gif_comment(gif, "made by a crawler " * 20)  # >255 bytes
    got = read_gif_comments(tagged)
    assert got["comment"].startswith("made by a crawler")
    assert len(got["comment"]) > 255
    assert text_tags(tagged) == got
    assert decode_gif(tagged).pixels == decode_gif(gif).pixels
    assert read_gif_comments(gif) == {}


def test_id3v1_trailer_fallback():
    from docling_graph_spark.kernels.media_tags import (make_id3v1,
                                                        make_id3v2,
                                                        text_tags)

    audio = b"\xff\xfb\x90\x00" + bytes(64)
    v1 = make_id3v1({"title": "old song", "artist": "someone"},
                    audio=audio)
    got = text_tags(v1)
    assert got["title"] == "old song" and got["artist"] == "someone"
    # a v2 tag wins over a v1 trailer
    both = make_id3v2({"title": "new title"}, version=4,
                      audio=v1)
    assert text_tags(both)["title"] == "new title"


def test_image_text_malformed_never_raises():
    from docling_graph_spark.kernels.media_tags import (read_gif_comments,
                                                        read_png_text)

    for b in (b"", b"\x89PNG\r\n\x1a\n", b"\x89PNG\r\n\x1a\n" + b"\xff" * 20,
              b"GIF89a", b"GIF89a" + bytes(20)):
        assert isinstance(read_png_text(b), dict)
        assert isinstance(read_gif_comments(b), dict)


def test_pdf_info_through_text_tags():
    from docling_graph_spark.kernels.media_tags import text_tags
    from docling_graph_spark.kernels.pdf_parse import (
        add_pdf_info, encode_pdf_objstm_cid)

    pdf = add_pdf_info(encode_pdf_objstm_cid("body text"),
                       {"title": "A Paper", "artist": "An Author"})
    got = text_tags(pdf)
    assert got["title"] == "A Paper" and got["artist"] == "An Author"


def test_id3v22_three_char_frames():
    import struct

    from docling_graph_spark.kernels.media_tags import read_id3v2

    # hand-built ID3v2.2 tag: TT2/TP1 frames, 3-byte ids + sizes
    def frame(fid, text):
        body = b"\x00" + text.encode("latin-1")
        return fid + len(body).to_bytes(3, "big") + body

    frames = frame(b"TT2", "old title") + frame(b"TP1", "old artist")
    def ss(n):
        return bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))
    tag = b"ID3\x02\x00\x00" + ss(len(frames)) + frames
    got = read_id3v2(tag)
    assert got == {"title": "old title", "artist": "old artist"}


def test_avi_riff_info_tags():
    from docling_graph_spark.kernels.avi_codec import encode_avi_mjpeg
    from docling_graph_spark.kernels.jpeg_codec import encode_jpeg_gray
    from docling_graph_spark.kernels.media_tags import (add_riff_info,
                                                        read_riff_info,
                                                        text_tags)

    avi = encode_avi_mjpeg(8, 8, [encode_jpeg_gray(8, 8, bytes(64))])
    tagged = add_riff_info(avi, {"title": "home video"})
    assert read_riff_info(tagged)["title"] == "home video"
    assert text_tags(tagged)["title"] == "home video"
    # the decoder still reads the tagged file
    from docling_graph_spark.kernels.avi_codec import decode_avi

    assert decode_avi(tagged).n_frames == 1


# ------------------------------------------------- EXIF strings (r5)

def test_exif_strings_all_containers():
    from docling_graph_spark.kernels.jpeg_codec import encode_jpeg_gray
    from docling_graph_spark.kernels.media_tags import (
        make_exif_strings_tiff, read_exif_strings, text_tags)
    from docling_graph_spark.kernels.png_codec import encode_png_gray
    from docling_graph_spark.kernels.webp_codec import (
        encode_webp_lossless)
    import struct
    import zlib

    tiff_body = make_exif_strings_tiff(
        make="ACME", model="Crawler 9000", date="2026:01:02 03:04:05")
    want = {"camera_make": "ACME", "camera_model": "Crawler 9000",
            "date": "2026:01:02 03:04:05"}
    # bare TIFF
    assert read_exif_strings(tiff_body) == want
    # JPEG APP1
    app1 = b"Exif\x00\x00" + tiff_body
    seg = b"\xff\xe1" + (len(app1) + 2).to_bytes(2, "big") + app1
    jpg = encode_jpeg_gray(4, 4, bytes(16))
    jpg_tagged = jpg[:2] + seg + jpg[2:]
    assert read_exif_strings(jpg_tagged) == want
    assert text_tags(jpg_tagged) == want
    # WebP EXIF chunk
    webp = encode_webp_lossless(2, 2, bytes(16))
    chunk = b"EXIF" + struct.pack("<I", len(tiff_body)) + tiff_body
    if len(tiff_body) & 1:
        chunk += b"\x00"
    wp = webp[:12] + chunk + webp[12:]
    wp = b"RIFF" + struct.pack("<I", len(wp) - 8) + wp[8:]
    assert read_exif_strings(wp) == want
    assert text_tags(wp) == want
    # PNG eXIf chunk (+ tEXt priority check: tEXt 'date' wins)
    from docling_graph_spark.kernels.media_tags import add_png_text

    png = encode_png_gray(3, 3, bytes(9))
    crc = zlib.crc32(b"eXIf" + tiff_body) & 0xFFFFFFFF
    ch = struct.pack(">I", len(tiff_body)) + b"eXIf" + tiff_body \
        + struct.pack(">I", crc)
    i = png.rfind(b"IEND")
    png_tagged = png[:i - 4] + ch + png[i - 4:]
    assert read_exif_strings(png_tagged) == want
    both = add_png_text(png_tagged, {"date": "from-text-chunk"})
    tags = text_tags(both)
    assert tags["date"] == "from-text-chunk"       # text chunk wins
    assert tags["camera_make"] == "ACME"           # exif fills the rest


def test_exif_strings_absent_or_malformed():
    from docling_graph_spark.kernels.jpeg_codec import encode_jpeg_gray
    from docling_graph_spark.kernels.media_tags import read_exif_strings

    assert read_exif_strings(encode_jpeg_gray(4, 4, bytes(16))) == {}
    assert read_exif_strings(b"II\x2a\x00garbage") == {}
    assert read_exif_strings(b"") == {}


def test_mp4_ilst_tags_through_text_tags():
    from docling_graph_spark.kernels.media_tags import (
        make_mp4_tags, read_mp4_tags, text_tags)

    mp4 = make_mp4_tags({"title": "title 9", "artist": "artist 9",
                         "date": "2024-01-02"}, width=32, height=24)
    want = {"title": "title 9", "artist": "artist 9",
            "date": "2024-01-02"}
    assert read_mp4_tags(mp4) == want
    assert text_tags(mp4) == want
    # geometry probe still reads the same fixture
    from docling_graph_spark.kernels.media_probe import probe_dimensions

    hdr = probe_dimensions(mp4)
    assert hdr is not None and (hdr.width, hdr.height) == (32, 24)
    # non-text data box flags are skipped, not mis-decoded
    assert read_mp4_tags(mp4.replace(
        (1).to_bytes(4, "big") + bytes(4) + b"title 9",
        (0).to_bytes(4, "big") + bytes(4) + b"title 9", 1)
    ) == {"artist": "artist 9", "date": "2024-01-02"}


def test_webm_segment_title_and_simpletags():
    from docling_graph_spark.kernels.media_tags import (
        read_webm_tags, text_tags)
    from docling_graph_spark.kernels.vp8_codec import (
        encode_vp8, rgb_to_yuv420)
    from docling_graph_spark.kernels.webm_codec import encode_webm_vp8

    y, u, v = rgb_to_yuv420(16, 16, bytes([99] * 768))
    frame = encode_vp8(16, 16, y, u, v)
    webm = encode_webm_vp8(16, 16, [frame], title="title 11",
                           tags={"ARTIST": "artist 11",
                                 "DATE_RELEASED": "2023"})
    want = {"title": "title 11", "artist": "artist 11",
            "date": "2023"}
    assert read_webm_tags(webm) == want
    assert text_tags(webm) == want


def test_video_tags_malformed_never_raise():
    from docling_graph_spark.kernels.media_tags import (
        read_mp4_tags, read_webm_tags)

    assert read_mp4_tags(b"\x00\x00\x00\x08ftypisom") == {}
    assert read_mp4_tags(b"\x00" * 40) == {}
    assert read_webm_tags(b"\x1aE\xdf\xa3garbage") == {}
    assert read_webm_tags(b"") == {}


def test_uslt_lyrics_frame():
    from docling_graph_spark.kernels.media_tags import (
        make_id3v2, read_id3v2, text_tags)

    lyrics = "verse one line\nverse two line\n\nchorus here"
    for ver in (3, 4):
        mp3 = make_id3v2({"title": "song", "lyrics": lyrics},
                         version=ver,
                         audio=b"\xff\xfb\x90\x00" + bytes(16))
        got = read_id3v2(mp3)
        assert got["lyrics"] == lyrics
        assert got["title"] == "song"
        assert text_tags(mp3)["lyrics"] == lyrics


def test_webm_vorbis_codecprivate_comments_surface():
    import math

    from docling_graph_spark.kernels.media_tags import read_webm_tags
    from docling_graph_spark.kernels.vorbis_codec import encode_vorbis
    from docling_graph_spark.kernels.webm_codec import (
        encode_webm_vorbis)

    rate = 8000
    pcm = [[int(8000 * math.sin(2 * math.pi * 440 * t / rate))
            for t in range(400)]]
    ogg = encode_vorbis(pcm, rate, comments={"title": "song 5",
                                             "artist": "artist 5"})
    webm = encode_webm_vorbis(ogg)
    got = read_webm_tags(webm)
    assert got["title"] == "song 5" and got["artist"] == "artist 5"
    # Matroska-level Title takes priority over the comment packet
    got2 = read_webm_tags(encode_webm_vorbis(ogg, title="outer"))
    assert got2["title"] == "outer" and got2["artist"] == "artist 5"


def test_chapter_titles_both_containers():
    from docling_graph_spark.kernels.media_tags import (
        make_mp4_tags, read_mp4_tags, read_webm_tags)
    from docling_graph_spark.kernels.vp8_codec import (
        encode_vp8, rgb_to_yuv420)
    from docling_graph_spark.kernels.webm_codec import encode_webm_vp8

    # MP4 Nero chpl box
    mp4 = make_mp4_tags({"title": "film"},
                        chapters=["Intro", "Main part", "Credits"])
    got = read_mp4_tags(mp4)
    assert got["title"] == "film"
    assert got["chapters"] == "Intro\nMain part\nCredits"
    # Matroska Chapters/ChapterAtom/ChapString
    y, u, v = rgb_to_yuv420(16, 16, bytes([99] * 768))
    webm = encode_webm_vp8(16, 16, [encode_vp8(16, 16, y, u, v)],
                           chapters=["Part one", "Part two"])
    assert read_webm_tags(webm)["chapters"] == "Part one\nPart two"
