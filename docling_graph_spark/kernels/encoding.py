"""Charset sniffing for crawl HTML payloads (HTML5 encoding sniffing
algorithm, stdlib-only subset).

Real Common-Crawl payloads are ~85-90% UTF-8 but the tail is
windows-1252 / shift_jis / gbk / iso-8859-* with an in-document
``<meta charset>`` declaration — decoding those as UTF-8-with-replacement
destroys every non-ASCII character.  Mirrors what Trafilatura/Readability
do (and the reference's converter relies on its PDF/HTML libraries doing):

1. **BOM** wins (HTML5 §13.2.3.1): UTF-8 / UTF-16 LE/BE.
2. **Strict UTF-8 attempt** — the overwhelmingly common case, one C-level
   pass; valid UTF-8 that declares another charset is still decoded as
   UTF-8 only when the declaration ALSO says utf-8 (a strict-valid
   non-UTF-8 declaration defers to the declaration, matching browsers on
   mislabeled-but-ASCII pages where both agree anyway).
3. **Meta scan** of the first 2 KiB (the HTML5 prescan window):
   ``<meta charset=...>``, ``<meta http-equiv="content-type"
   content="...charset=...">``, or an XML declaration ``encoding=...``.
4. **windows-1252 fallback** (the HTML5 default for unlabeled non-UTF-8;
   superset of latin-1 in the 0x80-0x9F range browsers actually use).

Unknown/unsupported declared names fall through to windows-1252.  All
decoding uses ``errors="replace"`` so truncated multi-byte tails never
raise — zero-data-loss like the rest of the extract stage.
"""

from __future__ import annotations

import codecs
import re

# HTML5 prescan window
_SCAN_BYTES = 2048

_META_CHARSET = re.compile(
    rb"""<meta[^>]{0,200}?charset\s*=\s*["']?\s*([a-zA-Z0-9._:-]{2,40})""",
    re.IGNORECASE,
)
_XML_DECL = re.compile(
    rb"""<\?xml[^>]{0,200}?encoding\s*=\s*["']([a-zA-Z0-9._:-]{2,40})["']""",
    re.IGNORECASE,
)

# label -> codec, per the WHATWG encoding-label table subset that matters
# in crawls; everything else resolves through codecs.lookup
_LABEL_ALIASES = {
    "unicode-1-1-utf-8": "utf-8",
    "iso-8859-1": "cp1252",   # WHATWG: latin-1 label means windows-1252
    "latin1": "cp1252",
    "latin-1": "cp1252",
    "us-ascii": "cp1252",
    "ascii": "cp1252",
    "x-sjis": "shift_jis",
    "windows-31j": "cp932",
    "gb2312": "gbk",          # WHATWG maps the gb2312 label to GBK
}


def _resolve(label: str) -> str | None:
    name = _LABEL_ALIASES.get(label.strip().lower(), label.strip().lower())
    try:
        codec = codecs.lookup(name)
    except (LookupError, ValueError):
        return None
    # refuse non-text transforms (e.g. someone declaring charset=zip)
    return codec.name


def sniff_encoding(payload: bytes) -> str:
    """Return the codec name the payload should be decoded with."""
    if payload.startswith(codecs.BOM_UTF8):
        return "utf-8-sig"
    if payload.startswith(codecs.BOM_UTF16_LE):
        return "utf-16"      # utf-16 codec consumes the BOM itself
    if payload.startswith(codecs.BOM_UTF16_BE):
        return "utf-16"
    head = payload[:_SCAN_BYTES]
    m = _META_CHARSET.search(head) or _XML_DECL.search(head)
    declared = _resolve(m.group(1).decode("ascii", "ignore")) if m else None
    try:
        payload.decode("utf-8", errors="strict")
        # strict-valid UTF-8: trust it unless a non-UTF-8 charset is
        # declared AND actually changes the bytes' meaning (pure-ASCII
        # payloads decode identically either way, so UTF-8 is fine)
        if declared and declared not in ("utf-8",) and not _is_ascii(payload):
            return declared
        return "utf-8"
    except UnicodeDecodeError:
        pass
    if declared:
        return declared
    return "cp1252"


def _is_ascii(payload: bytes) -> bool:
    try:
        payload.decode("ascii")
        return True
    except UnicodeDecodeError:
        return False


def sniff_decode(payload: bytes) -> tuple[str, str]:
    """(decoded text, codec used).  Never raises.

    Fast path decodes exactly once: a strict UTF-8 attempt whose result is
    reused when UTF-8 wins the sniff (the ~90% case on real crawls)."""
    if not payload.startswith((codecs.BOM_UTF8, codecs.BOM_UTF16_LE,
                               codecs.BOM_UTF16_BE)):
        try:
            text = payload.decode("utf-8", errors="strict")
        except UnicodeDecodeError:
            pass
        else:
            head = payload[:_SCAN_BYTES]
            m = _META_CHARSET.search(head) or _XML_DECL.search(head)
            declared = (_resolve(m.group(1).decode("ascii", "ignore"))
                        if m else None)
            if (declared and declared != "utf-8"
                    and not _is_ascii(payload)):
                try:
                    return payload.decode(declared, errors="replace"), declared
                except Exception:
                    return text, "utf-8"
            return text, "utf-8"
    enc = sniff_encoding(payload)
    try:
        return payload.decode(enc, errors="replace"), enc
    except Exception:  # defensive: codec objects can still balk on state
        return payload.decode("utf-8", errors="replace"), "utf-8"
