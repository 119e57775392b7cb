"""OOXML (DOCX / PPTX / XLSX) text extraction — stdlib only.

Office documents are a standing share of crawled binary payloads, and
the reference's converter scope includes them (docling's
DocumentConverter handles .docx/.pptx/.xlsx alongside PDF —
`core/input/types.py:39-105` routes them by extension/magic).  OOXML
is ZIP + XML, so a real extraction path needs nothing beyond
``zipfile`` and ``xml.etree``:

* **DOCX** — ``word/document.xml``: paragraphs (``w:p``) with their
  runs' text (``w:t``), tabs and breaks; Heading*N* paragraph styles
  surface as markdown-style ``#`` prefixes so the downstream
  heading-aware chunker sees structure; tables flatten row-wise with
  tab-separated cells.
* **PPTX** — ``ppt/slides/slideN.xml`` in numeric order: text runs
  (``a:t``) grouped per paragraph, slides separated by blank lines.
* **XLSX** — the shared-string table (``xl/sharedStrings.xml``,
  including rich-text runs) plus inline strings from each sheet, one
  cell per line.  Numeric cell values are layout, not text — skipped,
  like the HTML extractor skips style attributes.
* **ODT/ODS/ODP** (OpenDocument) — ``content.xml`` paragraphs,
  outline-leveled headings and row-flattened tables, the same shapes
  as the DOCX path.
* **EPUB** — XHTML chapters in OPF spine order, each routed through
  the SAME main-content extractor as crawled HTML (books get the
  boilerplate model, not a raw tag strip).

Decompression-bomb guard: OOXML members inflate through a byte-capped
read (MAX_TEXT_BYTES per member and total, member count capped), so a
zip bomb is a routed error in O(directory) work, never a pinned
executor — the same contract as every media decoder here.

Fixture builders emit deterministic archives (pinned ZIP timestamps,
fixed member order) so tests and oracles can reason about bytes.
"""

from __future__ import annotations

import io
import re
import struct
import zipfile
from typing import List, Optional, Tuple
from xml.etree import ElementTree

MAX_TEXT_BYTES = 1 << 26          # per-member AND total inflate cap
MAX_MEMBERS = 4096

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

ZIP_MAGIC = b"PK\x03\x04"


def is_ooxml(payload: Optional[bytes]) -> bool:
    return bool(payload) and payload[: 4] == ZIP_MAGIC


def sniff_ooxml_kind(payload: bytes) -> str:
    """docx / pptx / xlsx / zip by the member names in the central
    directory (no inflate needed)."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
        names = set(zf.namelist()[:MAX_MEMBERS])
    except Exception:
        return "zip"
    if "word/document.xml" in names:
        return "docx"
    if any(n.startswith("ppt/slides/") for n in names):
        return "pptx"
    if "xl/workbook.xml" in names:
        return "xlsx"
    return "zip"


def _read_member(zf: zipfile.ZipFile, name: str,
                 budget: List[int]) -> bytes:
    """Byte-capped member read: at most MAX_TEXT_BYTES from this
    member and from the whole archive (``budget`` is the mutable
    remaining-total box)."""
    with zf.open(name) as fh:
        data = fh.read(min(MAX_TEXT_BYTES, budget[0]) + 1)
    if len(data) > MAX_TEXT_BYTES or len(data) > budget[0]:
        raise ValueError(
            f"OOXML member {name!r} exceeds the {MAX_TEXT_BYTES}-byte "
            "inflate guard (decompression-bomb protection)")
    budget[0] -= len(data)
    return data


def _docx_paragraph_text(p) -> str:
    parts: List[str] = []
    for node in p.iter():
        if node.tag == _W + "t":
            parts.append(node.text or "")
        elif node.tag == _W + "tab":
            parts.append("\t")
        elif node.tag == _W + "br":
            parts.append("\n")
    return "".join(parts)


_HEADING_RE = re.compile(r"[Hh]eading(\d)")


def _docx_heading_level(p) -> int:
    ppr = p.find(_W + "pPr")
    if ppr is None:
        return 0
    style = ppr.find(_W + "pStyle")
    if style is None:
        return 0
    m = _HEADING_RE.fullmatch(style.get(_W + "val", ""))
    return int(m.group(1)) if m else 0


def extract_docx_text(payload: bytes) -> str:
    budget = [MAX_TEXT_BYTES]
    zf = zipfile.ZipFile(io.BytesIO(payload))
    root = ElementTree.fromstring(
        _read_member(zf, "word/document.xml", budget))
    body = root.find(_W + "body")
    if body is None:
        return ""
    out: List[str] = []
    for child in body:
        if child.tag == _W + "p":
            txt = _docx_paragraph_text(child).strip()
            if not txt:
                continue
            lvl = _docx_heading_level(child)
            out.append(("#" * lvl + " " + txt) if lvl else txt)
        elif child.tag == _W + "tbl":
            for row in child.iter(_W + "tr"):
                cells = []
                for tc in row.iter(_W + "tc"):
                    cells.append(" ".join(
                        _docx_paragraph_text(p).strip()
                        for p in tc.iter(_W + "p")).strip())
                if any(cells):
                    out.append("\t".join(cells))
    return "\n\n".join(out)


def extract_pptx_text(payload: bytes) -> str:
    budget = [MAX_TEXT_BYTES]
    zf = zipfile.ZipFile(io.BytesIO(payload))
    slide_re = re.compile(r"ppt/slides/slide(\d+)\.xml$")
    slides = sorted(
        ((int(m.group(1)), n) for n in zf.namelist()[:MAX_MEMBERS]
         for m in [slide_re.fullmatch(n)] if m))
    out: List[str] = []
    for _, name in slides:
        root = ElementTree.fromstring(_read_member(zf, name, budget))
        paras: List[str] = []
        for p in root.iter(_A + "p"):
            txt = "".join(t.text or "" for t in p.iter(_A + "t")).strip()
            if txt:
                paras.append(txt)
        if paras:
            out.append("\n".join(paras))
    return "\n\n".join(out)


def extract_xlsx_text(payload: bytes) -> str:
    budget = [MAX_TEXT_BYTES]
    zf = zipfile.ZipFile(io.BytesIO(payload))
    names = zf.namelist()[:MAX_MEMBERS]
    out: List[str] = []
    if "xl/sharedStrings.xml" in names:
        root = ElementTree.fromstring(
            _read_member(zf, "xl/sharedStrings.xml", budget))
        for si in root.iter(_S + "si"):
            txt = "".join(t.text or "" for t in si.iter(_S + "t")).strip()
            if txt:
                out.append(txt)
    sheet_re = re.compile(r"xl/worksheets/sheet(\d+)\.xml$")
    for _, name in sorted(((int(m.group(1)), n) for n in names
                           for m in [sheet_re.fullmatch(n)] if m)):
        root = ElementTree.fromstring(_read_member(zf, name, budget))
        for c in root.iter(_S + "c"):
            if c.get("t") == "inlineStr":
                txt = "".join(t.text or ""
                              for t in c.iter(_S + "t")).strip()
                if txt:
                    out.append(txt)
    return "\n".join(out)


def extract_ooxml_text(payload: bytes) -> Tuple[str, str,
                                                Optional[str]]:
    """(text, kind, error) for a ZIP payload — the one call the
    extraction operator routes to.  Plain ZIPs (not OOXML) and
    malformed archives return an error string, never raise."""
    try:
        kind = sniff_zip_kind(payload)
        if kind == "docx":
            return extract_docx_text(payload), kind, None
        if kind == "pptx":
            return extract_pptx_text(payload), kind, None
        if kind == "xlsx":
            return extract_xlsx_text(payload), kind, None
        if kind in ("odt", "ods", "odp"):
            return extract_odf_text(payload), kind, None
        if kind == "epub":
            return extract_epub_text(payload), kind, None
        return "", "zip", "ZIP archive is not a known document format"
    except ValueError as exc:          # bomb guard: keep the message
        return "", "zip", str(exc)
    except Exception as exc:
        return "", "zip", f"malformed OOXML archive: {exc}"


# ------------------------------------------------------------- fixtures

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types"><Default Extension="xml" ContentType="application/'
    'xml"/><Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>{overrides}</Types>')

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
    'openxmlformats.org/officeDocument/2006/relationships/'
    'officeDocument" Target="{target}"/></Relationships>')


def _zip_bytes(members: List[Tuple[str, str]]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in members:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, content)
    return buf.getvalue()


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def make_docx(blocks: List) -> bytes:
    """Deterministic DOCX fixture.  Each block is a plain-paragraph
    string, ``(level, text)`` for a heading, or a list of row-lists
    for a table."""
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    parts: List[str] = []
    for b in blocks:
        if isinstance(b, tuple):
            lvl, txt = b
            parts.append(
                f'<w:p><w:pPr><w:pStyle w:val="Heading{lvl}"/></w:pPr>'
                f'<w:r><w:t>{_xml_escape(txt)}</w:t></w:r></w:p>')
        elif isinstance(b, list):
            rows = "".join(
                "<w:tr>" + "".join(
                    f'<w:tc><w:p><w:r><w:t>{_xml_escape(c)}</w:t>'
                    "</w:r></w:p></w:tc>" for c in row) + "</w:tr>"
                for row in b)
            parts.append(f"<w:tbl>{rows}</w:tbl>")
        else:
            parts.append(f'<w:p><w:r><w:t xml:space="preserve">'
                         f"{_xml_escape(b)}</w:t></w:r></w:p>")
    doc = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           f'<w:document xmlns:w="{w}"><w:body>{"".join(parts)}'
           f"</w:body></w:document>")
    ct = _CONTENT_TYPES.format(overrides=(
        '<Override PartName="/word/document.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.'
        'wordprocessingml.document.main+xml"/>'))
    return _zip_bytes([
        ("[Content_Types].xml", ct),
        ("_rels/.rels", _RELS.format(target="word/document.xml")),
        ("word/document.xml", doc),
    ])


def make_pptx(slides: List[List[str]]) -> bytes:
    """Deterministic PPTX fixture: one shape per paragraph string."""
    a = "http://schemas.openxmlformats.org/drawingml/2006/main"
    p = "http://schemas.openxmlformats.org/presentationml/2006/main"
    members: List[Tuple[str, str]] = []
    for i, paras in enumerate(slides, start=1):
        body = "".join(
            f"<a:p><a:r><a:t>{_xml_escape(t)}</a:t></a:r></a:p>"
            for t in paras)
        members.append((
            f"ppt/slides/slide{i}.xml",
            f'<?xml version="1.0"?><p:sld xmlns:p="{p}" xmlns:a="{a}">'
            f"<p:cSld><p:spTree><p:sp><p:txBody>{body}</p:txBody>"
            f"</p:sp></p:spTree></p:cSld></p:sld>"))
    ct = _CONTENT_TYPES.format(overrides="".join(
        f'<Override PartName="/ppt/slides/slide{i}.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.'
        'presentationml.slide+xml"/>'
        for i in range(1, len(slides) + 1)))
    return _zip_bytes([
        ("[Content_Types].xml", ct),
        ("_rels/.rels", _RELS.format(target="ppt/presentation.xml")),
        *members,
    ])


def make_xlsx(shared: List[str],
              inline: "List[str] | None" = None) -> bytes:
    """Deterministic XLSX fixture: a shared-string table plus one
    sheet with optional inline-string cells."""
    s = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sst = (f'<?xml version="1.0"?><sst xmlns="{s}" count='
           f'"{len(shared)}" uniqueCount="{len(shared)}">'
           + "".join(f"<si><t>{_xml_escape(t)}</t></si>"
                     for t in shared) + "</sst>")
    cells = "".join(
        f'<c r="A{i + 1}" t="inlineStr"><is><t>{_xml_escape(t)}</t>'
        "</is></c>" for i, t in enumerate(inline or []))
    sheet = (f'<?xml version="1.0"?><worksheet xmlns="{s}">'
             f"<sheetData><row r=\"1\">{cells}</row></sheetData>"
             f"</worksheet>")
    ct = _CONTENT_TYPES.format(overrides=(
        '<Override PartName="/xl/workbook.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.'
        'spreadsheetml.sheet.main+xml"/>'))
    return _zip_bytes([
        ("[Content_Types].xml", ct),
        ("_rels/.rels", _RELS.format(target="xl/workbook.xml")),
        ("xl/workbook.xml",
         f'<?xml version="1.0"?><workbook xmlns="{s}"/>'),
        ("xl/sharedStrings.xml", sst),
        ("xl/worksheets/sheet1.xml", sheet),
    ])


def make_zip_bomb(depth_bytes: int = 1 << 28) -> bytes:
    """A DOCX whose document.xml inflates past the guard."""
    doc = "<pad>" + "A" * depth_bytes + "</pad>"
    ct = _CONTENT_TYPES.format(overrides=(
        '<Override PartName="/word/document.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.'
        'wordprocessingml.document.main+xml"/>'))
    return _zip_bytes([
        ("[Content_Types].xml", ct),
        ("word/document.xml", doc),
    ])


# ------------------------------------------------ OpenDocument + EPUB

_T = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"
_TBL = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_OFF = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"


def _odf_node_text(node) -> str:
    """Text of an ODF paragraph/heading with text:s (spaces), text:tab
    and text:line-break expanded."""
    parts: List[str] = []

    def walk(n):
        if n.tag == _T + "s":
            parts.append(" " * int(n.get(_T + "c", "1") or "1"))
        elif n.tag == _T + "tab":
            parts.append("\t")
        elif n.tag == _T + "line-break":
            parts.append("\n")
        if n.text:
            parts.append(n.text)
        for c in n:
            walk(c)
            if c.tail:
                parts.append(c.tail)

    for c in node:
        walk(c)
        if c.tail:
            parts.append(c.tail)
    if node.text:
        parts.insert(0, node.text)
    return "".join(parts)


def extract_odf_text(payload: bytes) -> str:
    """OpenDocument text: ``content.xml`` paragraphs (``text:p``),
    headings (``text:h`` with outline level -> markdown prefix) and
    table cells (row-flattened, tab-separated) — covers ODT and the
    text content of ODS/ODP the same way."""
    budget = [MAX_TEXT_BYTES]
    zf = zipfile.ZipFile(io.BytesIO(payload))
    root = ElementTree.fromstring(
        _read_member(zf, "content.xml", budget))
    out: List[str] = []

    def walk(node):
        if node.tag == _T + "h":
            lvl = int(node.get(_T + "outline-level", "1") or "1")
            txt = _odf_node_text(node).strip()
            if txt:
                out.append("#" * max(lvl, 1) + " " + txt)
            return
        if node.tag == _T + "p":
            txt = _odf_node_text(node).strip()
            if txt:
                out.append(txt)
            return
        if node.tag == _TBL + "table":
            # a table is one unit: rows flatten tab-separated, and
            # the cell paragraphs are NOT revisited as standalone text
            for row in node.iter(_TBL + "table-row"):
                cells = [" ".join(_odf_node_text(p).strip()
                                  for p in tc.iter(_T + "p")).strip()
                         for tc in row.iter(_TBL + "table-cell")]
                if any(cells):
                    out.append("\t".join(cells))
            return
        for c in node:
            walk(c)

    walk(root)
    return "\n\n".join(out)


def extract_epub_text(payload: bytes) -> str:
    """EPUB: the XHTML chapters (in OPF spine order when the manifest
    parses, member order otherwise), each routed through the SAME
    main-content extractor the HTML path uses — books are documents,
    so they get the boilerplate model, not a raw tag strip."""
    from .html_main import extract_main_content

    budget = [MAX_TEXT_BYTES]
    zf = zipfile.ZipFile(io.BytesIO(payload))
    names = zf.namelist()[:MAX_MEMBERS]
    order: List[str] = []
    opf = next((n for n in names if n.endswith(".opf")), None)
    if opf is not None:
        try:
            root = ElementTree.fromstring(_read_member(zf, opf, budget))
            ns = "{http://www.idpf.org/2007/opf}"
            base = opf.rsplit("/", 1)[0] + "/" if "/" in opf else ""
            hrefs = {i.get("id"): i.get("href") for i in
                     root.iter(ns + "item")}
            for ref in root.iter(ns + "itemref"):
                href = hrefs.get(ref.get("idref"))
                if href and base + href in names:
                    order.append(base + href)
        except Exception:
            order = []
    if not order:
        order = [n for n in names
                 if n.endswith((".xhtml", ".html", ".htm"))]
    chapters: List[str] = []
    for name in order:
        try:
            html = _read_member(zf, name, budget)
            text = extract_main_content(html).text.strip()
            if text:
                chapters.append(text)
        except ValueError:
            raise                     # bomb guard propagates
        except Exception:
            continue                  # malformed chapter: skip
    return "\n\n".join(chapters)


def sniff_zip_kind(payload: bytes) -> str:
    """docx / pptx / xlsx / odt / ods / odp / epub / zip."""
    kind = sniff_ooxml_kind(payload)
    if kind != "zip":
        return kind
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
        names = zf.namelist()[:MAX_MEMBERS]
    except Exception:
        return "zip"
    if "mimetype" in names:
        try:
            mt = zf.read("mimetype")[:100].decode("ascii", "replace")
        except Exception:
            mt = ""
        if mt.startswith("application/epub"):
            return "epub"
        tail = {"application/vnd.oasis.opendocument.text": "odt",
                "application/vnd.oasis.opendocument.spreadsheet": "ods",
                "application/vnd.oasis.opendocument.presentation":
                    "odp"}
        for k, v in tail.items():
            if mt.startswith(k):
                return v
    if "content.xml" in names:
        return "odt"
    if any(n.endswith(".opf") for n in names):
        return "epub"
    return "zip"


def make_odt(blocks: List) -> bytes:
    """Deterministic ODT fixture: paragraph strings, ``(level, text)``
    headings, or row-list tables."""
    t = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
    tbl = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
    off = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
    parts: List[str] = []
    for b in blocks:
        if isinstance(b, tuple):
            lvl, txt = b
            parts.append(f'<text:h text:outline-level="{lvl}">'
                         f"{_xml_escape(txt)}</text:h>")
        elif isinstance(b, list):
            rows = "".join(
                "<table:table-row>" + "".join(
                    f"<table:table-cell><text:p>{_xml_escape(c)}"
                    "</text:p></table:table-cell>" for c in row)
                + "</table:table-row>" for row in b)
            parts.append(f"<table:table>{rows}</table:table>")
        else:
            parts.append(f"<text:p>{_xml_escape(b)}</text:p>")
    content = (f'<?xml version="1.0"?><office:document-content '
               f'xmlns:office="{off}" xmlns:text="{t}" '
               f'xmlns:table="{tbl}"><office:body><office:text>'
               f'{"".join(parts)}</office:text></office:body>'
               f"</office:document-content>")
    return _zip_bytes([
        ("mimetype", "application/vnd.oasis.opendocument.text"),
        ("content.xml", content),
    ])


def make_epub(chapters: List[str],
              with_opf: bool = True) -> bytes:
    """Deterministic EPUB fixture: each chapter is an XHTML body with
    real boilerplate around it (nav + footer) so the main-content
    extractor has something to strip; with ``with_opf`` the spine
    REVERSES member order to prove spine ordering is honored."""
    members: List[Tuple[str, str]] = [
        ("mimetype", "application/epub+zip"),
    ]
    n = len(chapters)
    for i, body in enumerate(chapters, start=1):
        members.append((
            f"OEBPS/ch{i}.xhtml",
            "<html><head><title>c</title></head><body>"
            "<nav><a href='/'>home</a> <a href='/toc'>contents</a>"
            "</nav><main>" + "".join(
                f"<p>{_xml_escape(p)}</p>"
                for p in body.split("\n")) + "</main>"
            "<footer>copyright notice</footer></body></html>"))
    if with_opf:
        ns = "http://www.idpf.org/2007/opf"
        items = "".join(
            f'<item id="c{i}" href="ch{i}.xhtml" media-type='
            '"application/xhtml+xml"/>' for i in range(1, n + 1))
        spine = "".join(f'<itemref idref="c{i}"/>'
                        for i in range(1, n + 1))
        members.append((
            "OEBPS/content.opf",
            f'<?xml version="1.0"?><package xmlns="{ns}">'
            f"<manifest>{items}</manifest><spine>{spine}</spine>"
            f"</package>"))
        # reverse the chapter member order: spine must restore it
        members = [members[0], *reversed(members[1:n + 1]),
                   members[n + 1]]
    return _zip_bytes(members)
