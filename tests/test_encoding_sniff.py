"""Charset sniffing (kernels/encoding.py): BOM -> strict UTF-8 -> meta
prescan -> cp1252 fallback, mirrored on the HTML5 encoding-sniffing
algorithm.  Pipeline-level: legacy-encoded payloads must round-trip their
non-ASCII text through extract_main_content instead of turning into
U+FFFD replacement characters.
"""

from docling_graph_spark.kernels.encoding import sniff_decode, sniff_encoding
from docling_graph_spark.kernels.html_main import extract_main_content

BODY = "café naïve — résumé"
JP = "日本語のテキスト"


def page(body: str, meta: str = "") -> str:
    return (f"<html><head>{meta}</head><body><article><p>{body}</p>"
            "</article></body></html>")


def test_plain_utf8():
    raw = page(BODY).encode("utf-8")
    assert sniff_encoding(raw) == "utf-8"
    assert BODY in sniff_decode(raw)[0]


def test_utf8_bom_stripped():
    raw = b"\xef\xbb\xbf" + page(BODY).encode("utf-8")
    text, enc = sniff_decode(raw)
    assert enc == "utf-8-sig"
    assert not text.startswith("﻿")


def test_utf16_bom():
    for codec in ("utf-16-le", "utf-16-be"):
        import codecs as c
        bom = c.BOM_UTF16_LE if codec.endswith("le") else c.BOM_UTF16_BE
        raw = bom + page(BODY).encode(codec)
        text, enc = sniff_decode(raw)
        assert enc == "utf-16"
        assert BODY in text


def test_cp1252_with_meta_charset():
    raw = page(BODY, '<meta charset="windows-1252">').encode("cp1252")
    text, enc = sniff_decode(raw)
    assert enc == "cp1252"
    assert BODY in text


def test_cp1252_http_equiv():
    meta = ('<meta http-equiv="Content-Type" '
            'content="text/html; charset=iso-8859-1">')
    raw = page(BODY, meta).encode("cp1252")  # WHATWG: latin-1 label == cp1252
    text, enc = sniff_decode(raw)
    assert enc == "cp1252"
    assert BODY in text


def test_shift_jis_meta():
    raw = page(JP, '<meta charset="shift_jis">').encode("shift_jis")
    text, enc = sniff_decode(raw)
    assert enc == "shift_jis"
    assert JP in text


def test_gb2312_label_decodes_gbk():
    raw = page("中文文本", '<meta charset="gb2312">'
               ).encode("gbk")
    text, enc = sniff_decode(raw)
    assert enc == "gbk"
    assert "中文文本" in text


def test_unlabeled_cp1252_fallback():
    raw = page(BODY).encode("cp1252")  # invalid as UTF-8, no declaration
    text, enc = sniff_decode(raw)
    assert enc == "cp1252"
    assert BODY in text


def test_bogus_declared_charset_falls_back():
    raw = page(BODY, '<meta charset="not-a-charset">').encode("cp1252")
    text, enc = sniff_decode(raw)
    assert enc == "cp1252"
    assert BODY in text


def test_valid_utf8_with_wrong_legacy_label_trusts_label():
    # non-ASCII valid-UTF-8 bytes but a declared legacy charset: browsers
    # honor the declaration (prescan happens before decoding)
    raw = page(BODY, '<meta charset="windows-1252">').encode("utf-8")
    assert sniff_encoding(raw) == "cp1252"


def test_ascii_with_legacy_label_is_utf8():
    raw = page("plain ascii only", '<meta charset="iso-8859-1">'
               ).encode("ascii")
    assert sniff_encoding(raw) == "utf-8"


def test_truncated_multibyte_never_raises():
    raw = page(JP, '<meta charset="shift_jis">').encode("shift_jis")[:-1]
    text, enc = sniff_decode(raw)
    assert enc == "shift_jis" and text


def test_meta_utf16_label_means_utf8():
    # HTML5 prescan rule: a meta-declared utf-16 label is a lie (a real
    # UTF-16 doc could not be prescanned as ASCII) and means UTF-8
    raw = page(BODY, '<meta charset="utf-16">').encode("utf-8")
    text, enc = sniff_decode(raw)
    assert enc == "utf-8"
    assert BODY in text


def test_non_text_codec_label_refused():
    # codecs.lookup('hex') succeeds but bytes.decode('hex') raises; the
    # label must be refused so the fallback chain applies
    raw = page(BODY, '<meta charset="hex">').encode("cp1252")
    text, enc = sniff_decode(raw)
    assert enc == "cp1252"
    assert BODY in text


def test_transport_charset_precedence():
    # HTTP Content-Type charset (HTML5: transport beats content) — the
    # only signal for legacy pages with no in-document declaration
    raw = page(JP).encode("shift_jis")
    text, enc = sniff_decode(raw, "text/html; charset=Shift_JIS")
    assert enc == "shift_jis"
    assert JP in text
    # transport wins over a conflicting meta declaration
    raw2 = page(JP, '<meta charset="gbk">').encode("shift_jis")
    text2, enc2 = sniff_decode(raw2, "text/html; charset=shift_jis")
    assert enc2 == "shift_jis" and JP in text2
    # bogus transport charset falls through to the content chain
    raw3 = page(BODY, '<meta charset="windows-1252">').encode("cp1252")
    text3, enc3 = sniff_decode(raw3, "text/html; charset=nonsense")
    assert enc3 == "cp1252" and BODY in text3


def test_sniff_encoding_agrees_with_sniff_decode():
    import codecs as c
    samples = [
        page(BODY).encode("utf-8"),
        page(BODY).encode("cp1252"),
        page(JP, '<meta charset="shift_jis">').encode("shift_jis"),
        c.BOM_UTF8 + page(BODY).encode("utf-8"),
        c.BOM_UTF16_LE + page(BODY).encode("utf-16-le"),
    ]
    for raw in samples:
        for transport in (None, "text/html", "text/html; charset=utf-8"):
            t, e = sniff_decode(raw, transport)
            assert e == sniff_encoding(raw, transport)
            assert t == raw.decode(e, errors="replace")


def test_extract_main_content_legacy_payload():
    raw = page(BODY, '<meta charset="windows-1252">').encode("cp1252")
    result = extract_main_content(raw)
    assert BODY in result.text
    assert "�" not in result.text


def test_extract_main_content_shift_jis_payload():
    raw = page(JP, '<meta charset="shift_jis">').encode("shift_jis")
    result = extract_main_content(raw)
    assert JP in result.text
    assert "�" not in result.text
