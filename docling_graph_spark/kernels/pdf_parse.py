"""Minimal real-PDF text extraction (pure stdlib, deterministic).

The reference hands PDFs to Docling's converter
(`/root/reference/docling_graph/core/extractors/document_processor.py:97-115`),
which this container cannot ship.  Instead of stopping at the fake-container
stub, this kernel implements a genuine — deliberately small — PDF content
parser for the common "simple" shape of machine-generated PDFs:

* object scan (``N G obj ... endobj``) without relying on the xref table
  (robust to linearized / appended files — and, round 4, to
  COMPRESSED-XREF files: ``/Type /ObjStm`` object streams are inflated
  and their member objects added to the object table, which is what
  PDF 1.5+ cross-reference-stream files need; the ``/Type /XRef``
  stream itself carries only object locations and is ignored);
* stream decoding (round 5: the full standard filter chain): raw,
  ``FlateDecode`` (stdlib zlib, bounded inflate), ``LZWDecode``
  (the shared early-change LZW kernel, EarlyChange=0 honored),
  ``ASCIIHexDecode``, ``ASCII85Decode`` and ``RunLengthDecode``,
  applied in /Filter array order, with PNG predictors 10-15
  (/DecodeParms Predictor/Columns/Colors/BitsPerComponent) undone via
  the shared PNG defilter; /Crypt and image-only filters route as
  undecodable rather than mis-extracting;
* page discovery via ``/Type /Page`` objects and their ``/Contents``
  references (single ref or array), pages ordered by object number;
* content-stream tokenization: literal strings with the full escape set
  (``\\n \\r \\t \\b \\f \\( \\) \\\\ \\ooo`` and line continuations), hex
  strings, arrays; text shown by ``Tj``, ``'``, ``"`` and ``TJ`` inside
  ``BT``/``ET`` blocks; newlines emitted for ``Td``/``TD``/``T*``/``'``;
* string decoding: UTF-16BE when BOM-prefixed, else Latin-1 (the identity
  superset of PDFDocEncoding for the printable range);
* CID/composite fonts (round 4): per-page ``/Resources /Font`` fonts
  (inherited through ``/Parent`` when absent) with a ``/ToUnicode``
  CMap get their show strings decoded as fixed-width character codes
  through the CMap (``begincodespacerange`` sets the code width;
  ``bfchar`` + ``bfrange``, including array destinations and the
  increment-last-unit range form, destinations UTF-16BE) — the path
  real-crawl Type0/Identity-H PDFs need; fonts without ToUnicode keep
  the Latin-1 byte path.

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
_FILTER_RE = re.compile(
    rb"/Filter\s*(/[A-Za-z0-9]+|\[(?:\s*/[A-Za-z0-9]+)*\s*\])")
_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")
_PRED_RE = re.compile(rb"/Predictor\s+(\d+)\b")
_COLUMNS_RE = re.compile(rb"/Columns\s+(\d+)\b")
_COLORS_RE = re.compile(rb"/Colors\s+(\d+)\b")
_BPC_RE = re.compile(rb"/BitsPerComponent\s+(\d+)\b")
_EARLY_RE = re.compile(rb"/EarlyChange\s+(\d+)\b")

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


def _parse_tounicode(data: bytes) -> dict:
    """Parse a ToUnicode CMap stream into {"nbytes": code width,
    "map": {int code -> str}}.  Handles ``begincodespacerange`` (code
    width from the first range's hex length), ``bfchar`` pairs, and
    ``bfrange`` in both forms — single destination (successive codes
    increment the destination value) and array destination.  All
    destinations are UTF-16BE hex."""
    nbytes = 2
    cs = re.search(rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", data)
    if cs:
        nbytes = max(1, len(cs.group(1)) // 2)

    def dst_text(hexs: bytes) -> str:
        return bytes.fromhex(hexs.decode("ascii")).decode(
            "utf-16-be", "replace")

    mp: dict = {}
    for sec in re.finditer(rb"beginbfchar(.*?)endbfchar", data,
                           re.DOTALL):
        for pm in re.finditer(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", sec.group(1)):
            mp[int(pm.group(1), 16)] = dst_text(pm.group(2))
    for sec in re.finditer(rb"beginbfrange(.*?)endbfrange", data,
                           re.DOTALL):
        for rm in re.finditer(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
                rb"(<[0-9A-Fa-f]+>|\[[^\]]*\])", sec.group(1)):
            lo, hi = int(rm.group(1), 16), int(rm.group(2), 16)
            dst = rm.group(3)
            if dst.startswith(b"["):
                dsts = re.findall(rb"<([0-9A-Fa-f]+)>", dst)
                for i, dh in enumerate(dsts):
                    if lo + i <= hi:
                        mp[lo + i] = dst_text(dh)
            else:
                dh = dst[1:-1]
                width = len(dh) // 2
                base = int(dh, 16)
                for i in range(hi - lo + 1):
                    try:
                        raw = (base + i).to_bytes(max(width, 2), "big")
                    except OverflowError:
                        # Malformed CMap whose range overruns the
                        # destination width: skip the out-of-range tail
                        # (routed-error contract — never abort the doc).
                        break
                    mp[lo + i] = raw.decode("utf-16-be", "replace")
    return {"nbytes": nbytes, "map": mp}


def _decode_with_cmap(raw: bytes, cmap: dict) -> str:
    nb = cmap["nbytes"]
    mp = cmap["map"]
    return "".join(
        mp.get(int.from_bytes(raw[k:k + nb], "big"), "�")
        for k in range(0, len(raw) - nb + 1, nb))


def extract_content_stream_text(data: bytes,
                                fontmaps: Optional[dict] = None) -> str:
    """Extract shown text from one decoded content stream.

    Tokenizes the stream; inside BT/ET, ``Tj``/``'``/``\"`` show the last
    string, ``TJ`` shows every string element of the last array, and
    ``Td``/``TD``/``T*``/``'`` start a new output line.  ``fontmaps``
    maps resource font names (e.g. ``F1``) to parsed ToUnicode CMaps;
    after ``/F1 12 Tf`` selects such a font, show strings decode as
    fixed-width character codes through its CMap instead of bytes.
    """
    out: List[str] = []
    line_open = False  # emitted text since last newline
    in_text = False
    # pending operands: keep last string and last array of strings
    last_str: Optional[bytes] = None
    arr_stack: List[List[bytes]] = []
    last_arr: Optional[List[bytes]] = None
    last_name: Optional[str] = None
    cur_cmap: Optional[dict] = None
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
            text = (_decode_with_cmap(raw, cur_cmap)
                    if cur_cmap is not None
                    else _decode_pdf_string(raw))
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
            last_name = data[i + 1:j].decode("latin-1")
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
            elif tok == b"Tf":
                cur_cmap = (fontmaps.get(last_name)
                            if fontmaps and last_name else None)
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


MAX_STREAM_BYTES = 1 << 26  # 64 MiB per decoded stream — deflate-bomb cap

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
    dct = obj_body[: m.start()]
    fm = _FILTER_RE.search(dct)
    if not fm:
        return raw
    filters = [n.decode("ascii") for n in _NAME_RE.findall(fm.group(1))]
    data = raw
    for name in filters:
        try:
            data = _apply_filter(name, data, dct)
        except (ValueError, NotImplementedError, zlib.error):
            return None
        if data is None or len(data) > MAX_STREAM_BYTES:
            return None
    return data


def _apply_filter(name: str, data: bytes, dct: bytes):
    """One standard stream filter (round 5: the full decode chain —
    Flate, LZW incl. EarlyChange, ASCIIHex, ASCII85, RunLength — plus
    the PNG predictors 10-15 via the shared png_codec defilter;
    /Crypt and image filters (DCT/JPX/CCITT/JBIG2) return None and
    route as undecodable rather than mis-extracting)."""
    if name == "FlateDecode":
        # bounded inflate: a deflate bomb in a content stream must not
        # expand past the cap (routed as undecodable, never an OOM)
        out = zlib.decompressobj().decompress(data,
                                              MAX_STREAM_BYTES + 1)
        if len(out) > MAX_STREAM_BYTES:
            return None
        return _unpredict(out, dct)
    if name == "LZWDecode":
        from .tiff_codec import _lzw_decode

        em = _EARLY_RE.search(dct)
        out = _lzw_decode(data, None,
                          early_change=(em is None
                                        or em.group(1) != b"0"))
        return _unpredict(out, dct)
    if name == "ASCIIHexDecode":
        body = data.split(b">")[0]
        hx = bytes(c for c in body
                   if c not in b" \t\r\n\x0c\x00")
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii"))
    if name == "ASCII85Decode":
        return _a85_decode(data)
    if name == "RunLengthDecode":
        return _rl_decode(data)
    return None


def _unpredict(data: bytes, dct: bytes) -> "Optional[bytes]":
    pm = _PRED_RE.search(dct)
    pred = int(pm.group(1)) if pm else 1
    if pred <= 1:
        return data
    if pred < 10:
        return None                      # TIFF predictor 2: rare, route
    cm = _COLUMNS_RE.search(dct)
    colm = _COLORS_RE.search(dct)
    bm = _BPC_RE.search(dct)
    columns = int(cm.group(1)) if cm else 1
    colors = int(colm.group(1)) if colm else 1
    bpc = int(bm.group(1)) if bm else 8
    bpp = max(1, (colors * bpc + 7) // 8)
    stride = (columns * colors * bpc + 7) // 8
    if stride <= 0 or len(data) % (stride + 1):
        return None
    from .png_codec import _defilter

    height = len(data) // (stride + 1)
    return bytes(_defilter(data, height, stride, bpp))


def _a85_decode(data: bytes) -> bytes:
    body = data.split(b"~>")[0]
    out = bytearray()
    group = []
    for c in body:
        if c in b" \t\r\n\x0c\x00":
            continue
        if c == 0x7A:                    # 'z' -> four zero bytes
            if group:
                raise ValueError("z inside ASCII85 group")
            out += b"\x00\x00\x00\x00"
            continue
        if not 0x21 <= c <= 0x75:
            raise ValueError("bad ASCII85 character")
        group.append(c - 33)
        if len(group) == 5:
            v = 0
            for g in group:
                v = v * 85 + g
            out += v.to_bytes(4, "big")
            group = []
    if group:
        k = len(group)
        if k == 1:
            raise ValueError("dangling ASCII85 digit")
        v = 0
        for g in group + [84] * (5 - k):
            v = v * 85 + g
        out += v.to_bytes(4, "big")[: k - 1]
    return bytes(out)


def _rl_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        ln = data[i]
        i += 1
        if ln == 128:                    # EOD
            break
        if ln < 128:
            out += data[i:i + ln + 1]
            i += ln + 1
        else:
            if i >= n:
                raise ValueError("truncated RunLength stream")
            out += bytes([data[i]]) * (257 - ln)
            i += 1
    return bytes(out)


_OBJSTM_RE = re.compile(rb"/Type\s*/ObjStm\b")
_N_RE = re.compile(rb"/N\s+(\d+)\b")
_FIRST_RE = re.compile(rb"/First\s+(\d+)\b")


def _expand_object_streams(objects: dict) -> None:
    """Inflate every ``/Type /ObjStm`` and add its member objects (the
    PDF 1.5 compressed-object form that cross-reference-stream files
    use).  The stream begins with N (objnum, offset) integer pairs;
    member bodies start at /First + offset.  Direct objects win on
    number collision (setdefault), matching incremental-update
    semantics where the newest (uncompressed) definition is live."""
    for body in [b for b in objects.values() if _OBJSTM_RE.search(b)]:
        data = _decode_stream(body)
        nm, fm = _N_RE.search(body), _FIRST_RE.search(body)
        if data is None or not (nm and fm):
            continue
        n_objs, first = int(nm.group(1)), int(fm.group(1))
        header = data[:first].split()
        if len(header) < 2 * n_objs:
            continue
        for k in range(n_objs):
            try:
                onum = int(header[2 * k])
                off = int(header[2 * k + 1])
                end = (int(header[2 * k + 3]) if k + 1 < n_objs
                       else len(data) - first)
            except ValueError:
                break
            objects.setdefault(onum, data[first + off:first + end])


_RES_REF_RE = re.compile(rb"/Resources\s+(\d+)\s+\d+\s+R")
_FONT_REF_RE = re.compile(rb"/Font\s+(\d+)\s+\d+\s+R")
_FONT_INLINE_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.DOTALL)
_FONT_ENTRY_RE = re.compile(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R")
_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_PARENT_RE = re.compile(rb"/Parent\s+(\d+)\s+\d+\s+R")


def _page_font_cmaps(body: bytes, objects: dict) -> Optional[dict]:
    """Resolve a page's /Resources /Font entries (inheriting through
    /Parent when the page has none) to {font_name: parsed ToUnicode
    CMap} for fonts that carry one; None when no mapped font exists
    (the cheap common path)."""
    hops = 0
    node = body
    while node is not None and hops < 8:
        if b"/Resources" in node:
            break
        pm = _PARENT_RE.search(node)
        node = objects.get(int(pm.group(1))) if pm else None
        hops += 1
    if node is None or b"/Resources" not in node:
        return None
    rm = _RES_REF_RE.search(node)
    res = objects.get(int(rm.group(1)), b"") if rm else node
    fi = _FONT_INLINE_RE.search(res)
    if fi:
        region = fi.group(1)
    else:
        fr = _FONT_REF_RE.search(res)
        region = objects.get(int(fr.group(1)), b"") if fr else b""
    cmaps = {}
    for m in _FONT_ENTRY_RE.finditer(region):
        fbody = objects.get(int(m.group(2)), b"")
        tm = _TOUNICODE_RE.search(fbody)
        if not tm:
            continue
        cm_data = _decode_stream(objects.get(int(tm.group(1)), b""))
        if cm_data is not None:
            cmaps[m.group(1).decode("latin-1")] = _parse_tounicode(
                cm_data)
    return cmaps or None


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
    enc_err = _maybe_decrypt(payload, objects)
    if enc_err is not None:
        return "", enc_err
    _expand_object_streams(objects)

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
        fontmaps = _page_font_cmaps(body, objects)
        parts = []
        for cid in content_ids:
            stream = _decode_stream(objects.get(cid, b""))
            if stream is not None:
                t = extract_content_stream_text(stream, fontmaps)
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


# ---------------------------------------------------------------------------
# Fixture encoder: compressed-xref (ObjStm + XRef stream) CID-font PDF
# ---------------------------------------------------------------------------


def encode_pdf_objstm_cid(text: str) -> bytes:
    """Build a genuine PDF 1.5 document exercising the two features
    that gate most real-crawl PDFs: the catalog/pages/page/font objects
    live COMPRESSED inside a ``/Type /ObjStm`` object stream located
    only via a ``/Type /XRef`` cross-reference STREAM (no classic xref
    table), and the text is shown through a Type0 ``/Identity-H``
    composite font as 2-byte character codes that only the font's
    ``/ToUnicode`` CMap can map back to Unicode.

    Character codes: digits get a contiguous CID block 0x00D0..0x00D9
    mapped by ONE ``bfrange`` (the increment form); every other
    distinct character of ``text`` (including the newline) gets
    0x0100+i mapped by ``bfchar`` entries (chunked 100/block per the
    CMap spec).  Decoding the result through
    :func:`extract_real_pdf_text` must reproduce ``text`` byte-for-byte
    — the same round-trip invariant the uncompressed fixture family
    checks.
    """
    digits = "0123456789"
    others = sorted({ch for ch in text if ch not in digits})
    cid_of = {ch: 0x00D0 + digits.index(ch) if ch in digits
              else 0x0100 + others.index(ch) for ch in set(text)}
    hex_codes = "".join(f"{cid_of[ch]:04X}" for ch in text)
    content = f"BT /F1 12 Tf <{hex_codes}> Tj ET".encode("ascii")
    content_z = zlib.compress(content)

    bfchars = []
    for ch in others:
        dst = ch.encode("utf-16-be").hex().upper()
        bfchars.append(f"<{0x0100 + others.index(ch):04X}> <{dst}>")
    blocks = []
    for i in range(0, len(bfchars), 100):
        chunk = bfchars[i:i + 100]
        blocks.append(f"{len(chunk)} beginbfchar\n"
                      + "\n".join(chunk) + "\nendbfchar")
    cmap = (
        "/CIDInit /ProcSet findresource begin\n"
        "12 dict begin\nbegincmap\n"
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        "1 beginbfrange\n<00D0> <00D9> <0030>\nendbfrange\n"
        + ("\n".join(blocks) + "\n" if blocks else "")
        + "endcmap\nCMapName currentdict /CMap defineresource pop\n"
          "end\nend\n"
    ).encode("ascii")
    cmap_z = zlib.compress(cmap)

    # members of the object stream: 1 catalog, 2 pages, 3 page, 5 font
    members = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>"),
        (5, b"<< /Type /Font /Subtype /Type0 /BaseFont /Fixture "
            b"/Encoding /Identity-H /ToUnicode 7 0 R >>"),
    ]
    offs, bodies, pos = [], [], 0
    for onum, b in members:
        offs.append(f"{onum} {pos}")
        bodies.append(b)
        pos += len(b) + 1
    header = (" ".join(offs) + "\n").encode("ascii")
    objstm_payload = header + b"\n".join(bodies) + b"\n"
    objstm_z = zlib.compress(objstm_payload)

    out = bytearray(b"%PDF-1.5\n")
    offsets = {}

    def emit(num: int, dict_bytes: bytes, stream: Optional[bytes] = None):
        offsets[num] = len(out)
        out.extend(f"{num} 0 obj\n".encode("ascii"))
        out.extend(dict_bytes)
        if stream is not None:
            out.extend(b"\nstream\n")
            out.extend(stream)
            out.extend(b"\nendstream")
        out.extend(b"\nendobj\n")

    emit(4, f"<< /Length {len(content_z)} /Filter /FlateDecode >>"
         .encode("ascii"), content_z)
    emit(7, f"<< /Length {len(cmap_z)} /Filter /FlateDecode >>"
         .encode("ascii"), cmap_z)
    emit(6, (f"<< /Type /ObjStm /N {len(members)} "
             f"/First {len(header)} /Length {len(objstm_z)} "
             f"/Filter /FlateDecode >>").encode("ascii"), objstm_z)

    # cross-reference STREAM (/W [1 2 2]): type-0 free, type-1 offset,
    # type-2 (objstm, index) for the compressed members
    member_index = {onum: i for i, (onum, _) in enumerate(members)}
    xref_pos = len(out)
    rows = []
    for num in range(9):
        if num == 0:
            rows.append(bytes([0]) + (0).to_bytes(2, "big")
                        + (65535).to_bytes(2, "big"))
        elif num in member_index:
            rows.append(bytes([2]) + (6).to_bytes(2, "big")
                        + member_index[num].to_bytes(2, "big"))
        elif num in offsets:
            rows.append(bytes([1]) + offsets[num].to_bytes(2, "big")
                        + (0).to_bytes(2, "big"))
        else:  # the xref stream itself
            rows.append(bytes([1]) + xref_pos.to_bytes(2, "big")
                        + (0).to_bytes(2, "big"))
    xref_data = b"".join(rows)
    emit(8, (f"<< /Type /XRef /Size 9 /W [1 2 2] /Root 1 0 R "
             f"/Length {len(xref_data)} >>").encode("ascii"), xref_data)
    out.extend(f"startxref\n{xref_pos}\n%%EOF\n".encode("ascii"))
    return bytes(out)


# ---------------------------------------------------------------------------
# Encrypted PDFs (standard security handler, RC4 V1/V2, empty password)
# ---------------------------------------------------------------------------

_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E,
    0x56, 0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68,
    0x3E, 0x80, 0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])

_ENCRYPT_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+\d+\s+R")
_ID_RE = re.compile(rb"/ID\s*\[\s*<([0-9A-Fa-f]+)>")
_P_RE = re.compile(rb"/P\s+(-?\d+)\b")
_V_RE = re.compile(rb"/V\s+(\d+)\b")
_R_RE = re.compile(rb"/R\s+(\d+)\b")
_KEYLEN_RE = re.compile(rb"/Length\s+(\d+)\b")
_O_RE = re.compile(rb"/O\s*(\(|<)")


def _rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


_U_RE = re.compile(rb"/U\s*(\(|<)")
_UE_RE = re.compile(rb"/UE\s*(\(|<)")


def _parse_str_entry(body: bytes, regex) -> Optional[bytes]:
    m = regex.search(body)
    if not m:
        return None
    if m.group(1) == b"(":
        raw, _ = _parse_literal_string(body, m.end() - 1)
        return raw
    raw, _ = _parse_hex_string(body, m.end() - 1)
    return raw


def _parse_o_entry(body: bytes) -> Optional[bytes]:
    return _parse_str_entry(body, _O_RE)


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=32)
def _hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """The R6 iterated hash (PDF 2.0 Algorithm 2.B): SHA-256 seed, then
    rounds of AES-128-CBC over 64 repetitions of (pw + K + udata) with
    the digest algorithm selected by the ciphertext — at least 64
    rounds, continuing while the last ciphertext byte > round - 32."""
    import hashlib

    from .aes128 import cbc_encrypt_nopad

    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    e = b"\xff"
    while i < 64 or e[-1] > i - 32:
        k1 = (password + k + udata) * 64
        e = cbc_encrypt_nopad(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = {0: hashlib.sha256, 1: hashlib.sha384,
             2: hashlib.sha512}[mod](e).digest()
        i += 1
    return k[:32]


def _r6_file_key(enc_body: bytes) -> Optional[bytes]:
    """AES-256 (V5/R6) file key for the EMPTY user password: validate
    against /U's hash + validation salt, then unwrap /UE with the
    key-salt-derived intermediate key (Algorithm 2.A).  None when the
    document needs a real password or the entries are malformed."""
    from .aes128 import cbc_decrypt_nopad

    u = _parse_str_entry(enc_body, _U_RE)
    ue = _parse_str_entry(enc_body, _UE_RE)
    if u is None or ue is None or len(u) < 48 or len(ue) < 32:
        return None
    vsalt, ksalt = u[32:40], u[40:48]
    if _hash_2b(b"", vsalt) != u[:32]:
        return None  # non-empty user password required
    ikey = _hash_2b(b"", ksalt)
    return cbc_decrypt_nopad(ikey, bytes(16), ue[:32])


def _file_key(enc_body: bytes, id0: bytes):
    """(key, cipher) for the EMPTY user password (PDF spec Algorithm 2)
    — the overwhelmingly common crawl case: documents encrypted only to
    restrict printing/copying, readable by anyone.  ``cipher`` is
    'rc4' (V1/V2) or 'aes' (V4 with an AESV2 crypt filter — AES-128-CBC
    streams).  Returns None for non-Standard filters, V5/AES-256, or
    V4 with a non-AESV2 filter, which the caller routes as an
    unsupported error."""
    import hashlib

    if b"/Standard" not in enc_body:
        return None
    v = int(_V_RE.search(enc_body).group(1)) if _V_RE.search(enc_body) \
        else 1
    if v == 5:
        if b"/AESV3" not in enc_body:
            return None
        fek = _r6_file_key(enc_body)
        return (fek, "aes256") if fek is not None else None
    if v in (1, 2):
        cipher = "rc4"
    elif v == 4 and b"/AESV2" in enc_body:
        cipher = "aes"
    else:
        return None  # exotic V4 crypt filters
    r = int(_R_RE.search(enc_body).group(1)) if _R_RE.search(enc_body) \
        else 2
    o = _parse_o_entry(enc_body)
    pm = _P_RE.search(enc_body)
    if o is None or pm is None:
        return None
    p = int(pm.group(1)) & 0xFFFFFFFF
    n = 5
    if v >= 2:
        # /Length is bits at the top level but BYTES inside crypt
        # filter dicts; normalize every occurrence (>= 40 means bits)
        lens = [int(g) for g in _KEYLEN_RE.findall(enc_body)]
        norm = [(x // 8 if x >= 40 else x) for x in lens]
        n = max(norm) if norm else (16 if v == 4 else 5)
    h = hashlib.md5()
    h.update(_PAD)
    h.update(o[:32])
    h.update(p.to_bytes(4, "little"))
    h.update(id0)
    if v == 4 and b"/EncryptMetadata false" in enc_body:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n], cipher


def _object_key(file_key: bytes, num: int, gen: int = 0,
                cipher: str = "rc4") -> bytes:
    import hashlib

    h = hashlib.md5()
    h.update(file_key)
    h.update(num.to_bytes(3, "little"))
    h.update(gen.to_bytes(2, "little"))
    if cipher == "aes256":
        return file_key       # V5: streams use the file key directly
    if cipher == "aes":
        h.update(b"sAlT")   # the AESV2 salt (PDF spec Algorithm 1)
    return h.digest()[: min(len(file_key) + 5, 16)]


def _decrypt_streams(objects: dict, file_key: bytes,
                     cipher: str = "rc4") -> None:
    """RC4-decrypt every object's stream payload in place (content
    streams, ToUnicode CMaps, ObjStms — everything the extractor
    reads lives in streams; /Type /XRef streams are never encrypted
    per spec).  Object generation is assumed 0 (the object scan drops
    it; nonzero generations are vanishingly rare in crawl PDFs)."""
    for num, body in list(objects.items()):
        if b"stream" not in body or b"/Type /XRef" in body \
                or b"/Type/XRef" in body:
            continue
        m = _STREAM_RE.search(body)
        if not m:
            continue
        open_m = _STREAM_OPEN_RE.search(body)
        raw = m.group(1)
        start, endpos = m.start(1), m.end(1)
        len_m = _LENGTH_RE.search(body[: open_m.start()]) if open_m \
            else None
        if open_m and len_m:
            s2 = open_m.end()
            exact = body[s2:s2 + int(len_m.group(1))]
            if body[s2 + len(exact):].lstrip(b"\r\n").startswith(
                    b"endstream"):
                start, endpos = s2, s2 + len(exact)
                raw = exact
        okey = _object_key(file_key, num, cipher=cipher)
        if cipher in ("aes", "aes256"):
            from .aes128 import cbc_decrypt

            if len(raw) % 16 and body[endpos:endpos + 2] == b"\r\n":
                # A stale plaintext /Length forced the regex path, and
                # the stream separator regex ate a trailing 0x0D that is
                # really the last ciphertext byte.  Reclaim it.
                raw, endpos = raw + b"\r", endpos + 1
            try:
                dec = cbc_decrypt(okey, raw)
            except ValueError:
                continue  # malformed/foreign stream: leave encrypted
        else:
            dec = _rc4(okey, raw)
        objects[num] = body[:start] + dec + body[endpos:]


def _maybe_decrypt(payload: bytes, objects: dict) -> Optional[str]:
    """Detect an /Encrypt trailer; decrypt in place when the standard
    RC4 handler applies.  Returns an error string for unsupported
    encryption, None otherwise."""
    em = _ENCRYPT_REF_RE.search(payload)
    if not em:
        return None
    enc_body = objects.get(int(em.group(1)))
    idm = _ID_RE.search(payload)
    if enc_body is None or idm is None:
        return "encrypted PDF without parsable /Encrypt + /ID"
    fk = _file_key(enc_body, bytes.fromhex(idm.group(1).decode()))
    if fk is None:
        return ("unsupported encryption (non-Standard filter, exotic "
                "crypt filter, or a non-empty user password)")
    key, cipher = fk
    _decrypt_streams(objects, key, cipher)
    return None


def encrypt_pdf_rc4(pdf: bytes, key_bits: int = 128,
                    cipher: str = "rc4") -> bytes:
    """Fixture encoder: wrap an unencrypted PDF in the standard
    security handler with an EMPTY user password — every stream
    RC4-encrypted under the per-object key, an /Encrypt dictionary
    appended, and a trailer carrying /Encrypt + /ID.  ``key_bits`` 40
    selects V1/R2, anything else V2/R3 with the 50-round key mix.
    Decrypting with :func:`extract_real_pdf_text` must reproduce the
    plaintext extraction byte-for-byte."""
    o_entry = bytes(range(0x40, 0x60))          # arbitrary owner hash
    id0 = bytes(range(0xA0, 0xB0))
    p = -44
    if cipher == "aes256":
        from .aes128 import cbc_encrypt_nopad

        fek = bytes(range(32, 64))
        vsalt, ksalt = b"VsaltVs8", b"KsaltKs8"
        u = _hash_2b(b"", vsalt) + vsalt + ksalt
        ue = cbc_encrypt_nopad(_hash_2b(b"", ksalt), bytes(16), fek)
        enc_body = (
            "<< /Filter /Standard /V 5 /R 6 /Length 256 "
            "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
            "/StmF /StdCF /StrF /StdCF "
            f"/P {p} /O <" + (o_entry + bytes(16)).hex().upper()
            + "> /OE <" + bytes(32).hex() + "> /U <" + u.hex().upper()
            + "> /UE <" + ue.hex().upper() + "> >>").encode("ascii")
        key, _cipher = _file_key(enc_body, id0)
        assert key == fek
    else:
        if cipher == "aes":
            v, r, key_bits = 4, 4, 128
            cf = ("/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
                  "/StmF /StdCF /StrF /StdCF ")
        elif key_bits == 40:
            v, r, cf = 1, 2, ""
        else:
            v, r, cf = 2, 3, ""
        enc_body = (f"<< /Filter /Standard /V {v} /R {r} {cf}"
                    f"/Length {key_bits} /P {p} /O <"
                    + o_entry.hex().upper() + "> /U <"
                    + (b"\x00" * 32).hex() + "> >>").encode("ascii")
        key, _cipher = _file_key(enc_body, id0)
        assert key is not None and len(key) == key_bits // 8

    out = bytearray()
    last = 0
    max_num = 0
    for m in _OBJ_RE.finditer(pdf):
        num = int(m.group(1))
        max_num = max(max_num, num)
        body = m.group(2)
        if b"stream" not in body or b"/Type /XRef" in body:
            continue
        sm = _STREAM_RE.search(body)
        if not sm:
            continue
        open_m = _STREAM_OPEN_RE.search(body)
        raw = sm.group(1)
        start, endpos = sm.start(1), sm.end(1)
        len_m = _LENGTH_RE.search(body[: open_m.start()]) if open_m \
            else None
        if open_m and len_m:
            s2 = open_m.end()
            exact = body[s2:s2 + int(len_m.group(1))]
            if body[s2 + len(exact):].lstrip(b"\r\n").startswith(
                    b"endstream"):
                start, endpos = s2, s2 + len(exact)
                raw = exact
        okey = _object_key(key, num, cipher=cipher)
        if cipher in ("aes", "aes256"):
            import hashlib

            from .aes128 import cbc_encrypt

            iv = hashlib.md5(b"iv" + num.to_bytes(4, "big")).digest()
            enc = cbc_encrypt(okey, iv, raw)
        else:
            enc = _rc4(okey, raw)
        abs_start = m.start(2) + start
        abs_end = m.start(2) + endpos
        if len_m is not None and len(enc) != len(raw):
            # AES lengthens the payload (IV + PKCS#7 padding): rewrite
            # /Length to the ciphertext size so decrypters can take the
            # exact-length path instead of the \r-swallowing regex one.
            dl_s = m.start(2) + len_m.start(1)
            dl_e = m.start(2) + len_m.end(1)
            out += pdf[last:dl_s]
            out += str(len(enc)).encode("ascii")
            out += pdf[dl_e:abs_start]
        else:
            out += pdf[last:abs_start]
        out += enc
        last = abs_end
    out += pdf[last:]
    enc_num = max_num + 1
    out += (f"\n{enc_num} 0 obj\n".encode("ascii") + enc_body
            + b"\nendobj\n")
    out += (f"trailer\n<< /Encrypt {enc_num} 0 R /ID [<"
            f"{id0.hex().upper()}> <{id0.hex().upper()}>] >>\n"
            .encode("ascii"))
    return bytes(out)


# ---------------------------------------------------------------------------
# Document metadata (trailer /Info dictionary)
# ---------------------------------------------------------------------------

_INFO_REF_RE = re.compile(rb"/Info\s+(\d+)\s+\d+\s+R")
_INFO_KEYS = {b"Title": "title", b"Author": "artist",
              b"Subject": "comment", b"Keywords": "keywords",
              b"Producer": "producer", b"CreationDate": "date"}


def extract_pdf_metadata(payload: bytes) -> dict:
    """Document metadata from the trailer's /Info dictionary: Title /
    Author / Subject / Keywords / Producer / CreationDate as literal
    or hex strings (UTF-16BE with BOM honored), keyword-mapped to the
    same normalized keys `kernels/media_tags.py` uses — PDF titles are
    corpus text like audio tags.  Encrypted documents return {} (the
    strings would be ciphertext); malformed structures degrade to
    partial/empty dicts, never an exception."""
    if _ENCRYPT_REF_RE.search(payload):
        # encrypted document: Info strings are ciphertext (the fixture
        # encrypter only rewrites streams, but real writers encrypt
        # strings too — returning plaintext-looking garbage would be
        # worse than returning nothing)
        return {}
    refs = _INFO_REF_RE.findall(payload)
    if not refs:
        return {}
    info_num = int(refs[-1])               # last trailer wins (updates)
    objects = {}
    for m in _OBJ_RE.finditer(payload):
        objects.setdefault(int(m.group(1)), m.group(2))
    try:
        _expand_object_streams(objects)
    except Exception:
        pass
    body = objects.get(info_num)
    if body is None:
        return {}
    out = {}
    for raw_key, key in _INFO_KEYS.items():
        m = re.search(rb"/" + raw_key + rb"\s*", body)
        if m is None:
            continue
        i = m.end()
        try:
            if body[i:i + 1] == b"(":
                raw, _ = _parse_literal_string(body, i)
            elif body[i:i + 1] == b"<" and body[i:i + 2] != b"<<":
                raw, _ = _parse_hex_string(body, i)
            else:
                continue
            txt = _decode_pdf_string(raw).strip()
        except Exception:
            continue
        if txt:
            out[key] = txt
    return out


def add_pdf_info(pdf: bytes, meta: dict) -> bytes:
    """Fixture: append an /Info object + updated trailer reference to
    a PDF (incremental-update style: the LAST /Info reference wins,
    which the reader honors)."""
    num = 900                               # clear of fixture objects
    rev = {"title": b"Title", "artist": b"Author",
           "comment": b"Subject", "keywords": b"Keywords",
           "producer": b"Producer", "date": b"CreationDate"}

    def pdf_string(s: str) -> bytes:
        if all(ord(c) < 128 for c in s):
            esc = s.replace("\\", r"\\").replace("(", r"\(") \
                .replace(")", r"\)")
            return b"(" + esc.encode("ascii") + b")"
        raw = b"\xfe\xff" + s.encode("utf-16-be")
        return b"<" + raw.hex().encode("ascii") + b">"

    entries = b" ".join(b"/" + rev.get(k, k.title().encode("ascii"))
                        + b" " + pdf_string(v)
                        for k, v in meta.items())
    obj = b"\n%d 0 obj\n<< %s >>\nendobj\n" % (num, entries)
    trailer = b"trailer\n<< /Info %d 0 R >>\n" % num
    return pdf + obj + trailer
