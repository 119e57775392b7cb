"""Charset sniffing for crawl HTML payloads (HTML5 encoding sniffing
algorithm, stdlib-only subset).

Real Common-Crawl payloads are ~85-90% UTF-8 but the tail is
windows-1252 / shift_jis / gbk / iso-8859-* with an in-document
``<meta charset>`` declaration — decoding those as UTF-8-with-replacement
destroys every non-ASCII character.  Mirrors what Trafilatura/Readability
do (and the reference's converter relies on its PDF/HTML libraries doing):

1. **BOM** wins (HTML5 §13.2.3.1): UTF-8 / UTF-16 LE/BE.
2. **Transport layer** (the HTTP ``Content-Type: ...; charset=...`` a WARC
   response record carries) — HTML5 gives it precedence over the content.
3. **Strict UTF-8 attempt** — the overwhelmingly common case, one C-level
   pass; valid UTF-8 that declares another charset is still decoded as
   UTF-8 only when the declaration ALSO says utf-8 (a strict-valid
   non-UTF-8 declaration defers to the declaration, matching browsers on
   mislabeled-but-ASCII pages where both agree anyway).
4. **Meta scan** of the first 2 KiB (the HTML5 prescan window):
   ``<meta charset=...>``, ``<meta http-equiv="content-type"
   content="...charset=...">``, or an XML declaration ``encoding=...``.
   Per the HTML5 prescan rule, a meta-declared utf-16 label means the
   document is mislabeled (a real UTF-16 document could not be prescanned
   as ASCII) and is changed to UTF-8.
5. **windows-1252 fallback** (the HTML5 default for unlabeled non-UTF-8;
   superset of latin-1 in the 0x80-0x9F range browsers actually use).

Unknown / non-text declared names (``charset=zip``…) fall through to the
next step.  All decoding uses ``errors="replace"`` so truncated
multi-byte tails never raise — zero-data-loss like the rest of the
extract stage.
"""

from __future__ import annotations

import codecs
import re
from typing import Optional, Tuple

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
_CTYPE_CHARSET = re.compile(
    r"""charset\s*=\s*["']?\s*([a-zA-Z0-9._:-]{2,40})""", re.IGNORECASE
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


def _resolve(label: str, from_meta: bool = False) -> Optional[str]:
    name = _LABEL_ALIASES.get(label.strip().lower(), label.strip().lower())
    try:
        codec = codecs.lookup(name)
    except (LookupError, ValueError):
        return None
    # refuse non-text transforms (charset=hex/base64/zip…): lookup
    # succeeds for them but bytes.decode() would raise LookupError later
    if not getattr(codec, "_is_text_encoding", True):
        return None
    # HTML5 prescan: a meta-declared utf-16 label is a lie (a real UTF-16
    # document could not be scanned as ASCII) and means UTF-8
    if from_meta and codec.name.startswith("utf-16"):
        return "utf-8"
    return codec.name


def charset_from_content_type(content_type: Optional[str]) -> Optional[str]:
    """Codec name from an HTTP ``Content-Type`` header value, or None."""
    if not content_type:
        return None
    m = _CTYPE_CHARSET.search(content_type)
    return _resolve(m.group(1)) if m else None


def _declared_in_content(payload: bytes) -> Optional[str]:
    head = payload[:_SCAN_BYTES]
    m = _META_CHARSET.search(head) or _XML_DECL.search(head)
    return _resolve(m.group(1).decode("ascii", "ignore"),
                    from_meta=True) if m else None


def _sniff(payload: bytes,
           transport: Optional[str] = None) -> Tuple[str, Optional[str]]:
    """The one shared decision: (codec name, strict-UTF-8 text or None).

    The second element is the already-decoded text when the decision both
    attempted and settled on UTF-8 — callers reuse it so the common case
    decodes exactly once.
    """
    if payload.startswith(codecs.BOM_UTF8):
        return "utf-8-sig", None
    if payload.startswith((codecs.BOM_UTF16_LE, codecs.BOM_UTF16_BE)):
        return "utf-16", None      # utf-16 codec consumes the BOM itself
    hint = charset_from_content_type(transport)
    if hint:
        return hint, None
    declared = _declared_in_content(payload)
    try:
        text = payload.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return (declared or "cp1252"), None
    # strict-valid UTF-8: trust it unless a non-UTF-8 charset is declared
    # AND actually changes the bytes' meaning (pure-ASCII payloads decode
    # identically either way, so UTF-8 is fine)
    if declared and declared != "utf-8" and not payload.isascii():
        return declared, None
    return "utf-8", text


def sniff_encoding(payload: bytes,
                   transport: Optional[str] = None) -> str:
    """Return the codec name the payload should be decoded with.

    ``transport`` is an optional HTTP Content-Type header value; a charset
    parameter in it takes precedence over the content (HTML5 order:
    BOM > transport > content)."""
    return _sniff(payload, transport)[0]


def sniff_decode(payload: bytes,
                 transport: Optional[str] = None) -> Tuple[str, str]:
    """(decoded text, codec used).  Never raises.

    Fast path decodes exactly once: the strict UTF-8 attempt inside the
    sniff is reused when UTF-8 wins (the ~90% case on real crawls)."""
    enc, text = _sniff(payload, transport)
    if text is not None:
        return text, enc
    try:
        return payload.decode(enc, errors="replace"), enc
    except Exception:  # defensive: codec objects can still balk on state
        return payload.decode("utf-8", errors="replace"), "utf-8"
