"""Minimal real-PDF text extraction (pure stdlib, deterministic).

The reference hands PDFs to Docling's converter
(`/root/reference/docling_graph/core/extractors/document_processor.py:97-115`),
which this container cannot ship.  Instead of stopping at the fake-container
stub, this kernel implements a genuine — deliberately small — PDF content
parser for the common "simple" shape of machine-generated PDFs:

* object scan (``N G obj ... endobj``) without relying on the xref table
  (robust to linearized / appended files);
* stream decoding: raw or ``/Filter /FlateDecode`` via stdlib ``zlib``;
* page discovery via ``/Type /Page`` objects and their ``/Contents``
  references (single ref or array), pages ordered by object number;
* content-stream tokenization: literal strings with the full escape set
  (``\\n \\r \\t \\b \\f \\( \\) \\\\ \\ooo`` and line continuations), hex
  strings, arrays; text shown by ``Tj``, ``'``, ``"`` and ``TJ`` inside
  ``BT``/``ET`` blocks; newlines emitted for ``Td``/``TD``/``T*``/``'``;
* string decoding: UTF-16BE when BOM-prefixed, else Latin-1 (the identity
  superset of PDFDocEncoding for the printable range).

Everything is a pure function of the payload bytes — no clocks, no I/O —
so extracted text is byte-stable across runs and cluster sizes, which is
what the per-url byte-identity invariant requires.  Layout analysis
(columns, reading order, tables) is out of scope: that is the part a
production build swaps in behind the same function signature.
"""

from __future__ import annotations

import re
import zlib
from typing import List, Optional, Tuple

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_CONTENTS_REF_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[(.*?)\]", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_PAGE_TYPE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode\b")

# PDF delimiters for the content tokenizer
_WHITESPACE = b"\x00\t\n\x0c\r "
_DELIMS = b"()<>[]{}/%"


def _decode_pdf_string(raw: bytes) -> str:
    if raw[:2] == b"\xfe\xff":
        try:
            return raw[2:].decode("utf-16-be")
        except UnicodeDecodeError:
            pass
    return raw.decode("latin-1")


def _parse_literal_string(data: bytes, i: int) -> Tuple[bytes, int]:
    """Parse a ``( ... )`` literal starting at the '('; returns (bytes, next)."""
    assert data[i : i + 1] == b"("
    i += 1
    out = bytearray()
    depth = 1
    n = len(data)
    while i < n:
        c = data[i : i + 1]
        if c == b"\\":
            nxt = data[i + 1 : i + 2]
            if nxt in (b"n", b"r", b"t", b"b", b"f"):
                out += {b"n": b"\n", b"r": b"\r", b"t": b"\t",
                        b"b": b"\b", b"f": b"\x0c"}[nxt]
                i += 2
            elif nxt in (b"(", b")", b"\\"):
                out += nxt
                i += 2
            elif nxt.isdigit():  # \ddd octal, 1-3 digits
                j = i + 1
                digits = b""
                while j < n and len(digits) < 3 and data[j : j + 1].isdigit():
                    digits += data[j : j + 1]
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
            elif nxt in (b"\r", b"\n"):  # line continuation
                i += 2
                if nxt == b"\r" and data[i : i + 1] == b"\n":
                    i += 1
            else:  # unknown escape: drop the backslash (spec behavior)
                i += 1
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i  # unterminated: best effort


def _parse_hex_string(data: bytes, i: int) -> Tuple[bytes, int]:
    """Parse a ``<hex>`` string starting at '<'; returns (bytes, next)."""
    end = data.find(b">", i + 1)
    if end == -1:
        end = len(data)
    hex_digits = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1 : end])
    if len(hex_digits) % 2:
        hex_digits += b"0"
    return bytes.fromhex(hex_digits.decode("ascii")), end + 1


def extract_content_stream_text(data: bytes) -> str:
    """Extract shown text from one decoded content stream.

    Tokenizes the stream; inside BT/ET, ``Tj``/``'``/``\"`` show the last
    string, ``TJ`` shows every string element of the last array, and
    ``Td``/``TD``/``T*``/``'`` start a new output line.
    """
    out: List[str] = []
    line_open = False  # emitted text since last newline
    in_text = False
    # pending operands: keep last string and last array of strings
    last_str: Optional[bytes] = None
    arr_stack: List[List[bytes]] = []
    last_arr: Optional[List[bytes]] = None
    i = 0
    n = len(data)

    def newline() -> None:
        nonlocal line_open
        if line_open:
            out.append("\n")
            line_open = False

    def show(raw: Optional[bytes]) -> None:
        nonlocal line_open
        if raw:
            text = _decode_pdf_string(raw)
            if text:
                out.append(text)
                line_open = True

    while i < n:
        c = data[i : i + 1]
        if c in b"\x00\t\n\x0c\r ":
            i += 1
        elif c == b"%":  # comment to end of line
            j = data.find(b"\n", i)
            i = n if j == -1 else j + 1
        elif c == b"(":
            s, i = _parse_literal_string(data, i)
            if arr_stack:
                arr_stack[-1].append(s)
            last_str = s
        elif c == b"<":
            if data[i : i + 2] == b"<<":  # dictionary: skip balanced
                depth = 0
                while i < n:
                    if data[i : i + 2] == b"<<":
                        depth += 1
                        i += 2
                    elif data[i : i + 2] == b">>":
                        depth -= 1
                        i += 2
                        if depth == 0:
                            break
                    else:
                        i += 1
            else:
                s, i = _parse_hex_string(data, i)
                if arr_stack:
                    arr_stack[-1].append(s)
                last_str = s
        elif c == b"[":
            arr_stack.append([])
            i += 1
        elif c == b"]":
            last_arr = arr_stack.pop() if arr_stack else None
            i += 1
        elif c == b"/":  # name
            j = i + 1
            while j < n and data[j : j + 1] not in _WHITESPACE \
                    and data[j : j + 1] not in _DELIMS:
                j += 1
            i = j
        else:  # number or operator token
            j = i
            while j < n and data[j : j + 1] not in _WHITESPACE \
                    and data[j : j + 1] not in _DELIMS:
                j += 1
            tok = data[i:j]
            i = j if j > i else i + 1
            if tok == b"BT":
                in_text = True
            elif tok == b"ET":
                in_text = False
                newline()
            elif not in_text:
                continue
            elif tok == b"Tj":
                show(last_str)
                last_str = None
            elif tok == b"'":
                newline()
                show(last_str)
                last_str = None
            elif tok == b'"':
                newline()
                show(last_str)
                last_str = None
            elif tok == b"TJ":
                if last_arr:
                    for s in last_arr:
                        show(s)
                last_arr = None
            elif tok in (b"Td", b"TD", b"T*"):
                newline()
    newline()
    text = "".join(out)
    # collapse the trailing newline so single-line docs round-trip exactly
    return text[:-1] if text.endswith("\n") else text


_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b")
_STREAM_OPEN_RE = re.compile(rb"stream\r?\n")


def _decode_stream(obj_body: bytes) -> Optional[bytes]:
    """Return the decoded bytes of the stream in an object body, if any.

    Prefers the dict's /Length for the payload extent (a compressed stream
    may contain the literal bytes ``\\nendstream``, which would truncate a
    lazy regex match); falls back to the endstream scan when /Length is an
    indirect reference or absent.
    """
    m = _STREAM_RE.search(obj_body)
    if not m:
        return None
    raw = m.group(1)
    open_m = _STREAM_OPEN_RE.search(obj_body)
    len_m = _LENGTH_RE.search(obj_body[: open_m.start()]) if open_m else None
    if open_m and len_m:
        start = open_m.end()
        exact = obj_body[start : start + int(len_m.group(1))]
        # trust /Length only if endstream actually follows it
        if obj_body[start + len(exact) :].lstrip(b"\r\n").startswith(
            b"endstream"
        ):
            raw = exact
    if _FLATE_RE.search(obj_body[: m.start()]):
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return None
    return raw


def extract_real_pdf_text(payload: bytes) -> Tuple[str, Optional[str]]:
    """Extract text from a real (simple) PDF; returns (text, error).

    Pages are processed in object-number order; page texts are joined with
    a blank line.  Falls back to scanning every stream for text operators
    when no ``/Type /Page`` objects are found (e.g. stripped fragments).
    """
    objects = {}
    for m in _OBJ_RE.finditer(payload):
        objects.setdefault(int(m.group(1)), m.group(2))
    if not objects:
        return "", "unsupported PDF structure (no objects found)"

    page_texts: List[str] = []
    page_objs = [
        (num, body) for num, body in sorted(objects.items())
        if _PAGE_TYPE_RE.search(body) and b"stream" not in body[:64]
    ]
    for _, body in page_objs:
        content_ids: List[int] = []
        arr = _CONTENTS_ARR_RE.search(body)
        if arr:
            content_ids = [int(r.group(1)) for r in _REF_RE.finditer(arr.group(1))]
        else:
            ref = _CONTENTS_REF_RE.search(body)
            if ref:
                content_ids = [int(ref.group(1))]
        parts = []
        for cid in content_ids:
            stream = _decode_stream(objects.get(cid, b""))
            if stream is not None:
                t = extract_content_stream_text(stream)
                if t:
                    parts.append(t)
        page_texts.append("\n".join(parts))

    if not page_objs:
        # no page tree: best-effort over all decodable streams, object order
        for _, body in sorted(objects.items()):
            stream = _decode_stream(body)
            if stream is not None and b"BT" in stream:
                t = extract_content_stream_text(stream)
                if t:
                    page_texts.append(t)

    text = "\n\n".join(t for t in page_texts if t)
    if not text:
        return "", "no extractable text (scanned or unsupported encoding)"
    return text, None
