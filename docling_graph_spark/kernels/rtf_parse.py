r"""RTF text extraction — stdlib only.

RTF is the legacy rich-text interchange format that still rides
crawls as e-mail attachments and old office exports.  The format is a
token stream — groups ``{...}``, control words ``\word[N]``, control
symbols ``\x`` and plain text — so extraction is a single pass with a
group stack:

* destination groups that carry no document text (font/color/style
  tables, document info, headers/footers, embedded pictures/objects,
  and any ``{\*...}`` destination unknown to us) are skipped whole;
* ``\par``/``\line`` break paragraphs/lines, ``\tab``/``\cell``
  tabulate, ``\row`` ends a table row, ``\sect``/``\page`` separate
  sections;
* ``\'hh`` hex escapes decode through cp1252 (the Windows default
  RTF writers use), ``\uN`` emits the Unicode scalar and skips the
  following ``\uc``-many fallback bytes (the count is group-scoped,
  default 1, per spec);
* ``\{ \} \\`` are literals, ``\~`` a space, ``\-`` discarded.

Unknown control words are ignored (the spec's forward-compatibility
rule).  Input is size-capped; malformed streams degrade to whatever
text was readable — extraction metadata, never an executor crash.

The reference's converter treats .rtf as out of scope (binary route);
here it joins the document family next to OOXML/ODF/EPUB
(`kernels/ooxml_parse.py`).  The module also carries the subtitle
extractors (WebVTT by magic, SRT by cue-head structure): transcripts
are crawl text too.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

MAX_RTF_BYTES = 1 << 26

# destinations whose content is not document text
_SKIP_DESTS = {
    "fonttbl", "colortbl", "stylesheet", "info", "header", "footer",
    "headerl", "headerr", "headerf", "footerl", "footerr", "footerf",
    "pict", "object", "themedata", "colorschememapping", "fchars",
    "lchars", "listtable", "listoverridetable", "revtbl", "xmlnstbl",
    "generator", "datastore",
}

_CW_RE = re.compile(rb"\\([a-zA-Z]{1,32})(-?\d{1,10})? ?")


def is_rtf(payload: Optional[bytes]) -> bool:
    return bool(payload) and payload[:5] == b"{\\rtf"


def extract_rtf_text(payload: bytes) -> str:
    b = payload[:MAX_RTF_BYTES]
    out: List[str] = []
    # group stack entries: (skipping, uc_count)
    stack: List[Tuple[bool, int]] = []
    skipping = False
    uc = 1
    pending_skip = 0          # fallback bytes to swallow after \uN
    i = 0
    n = len(b)
    while i < n:
        c = b[i:i + 1]
        if c == b"{":
            stack.append((skipping, uc))
            i += 1
            # {\* ...}: skippable destination unless we know better
            if b[i:i + 2] == b"\\*":
                skipping = True
                i += 2
            continue
        if c == b"}":
            if stack:
                skipping, uc = stack.pop()
            i += 1
            continue
        if c == b"\\":
            nxt = b[i + 1:i + 2]
            if nxt == b"'":
                byte = b[i + 2:i + 4]
                i += 4
                if pending_skip > 0:
                    pending_skip -= 1
                    continue
                if not skipping:
                    try:
                        out.append(bytes.fromhex(
                            byte.decode("ascii")).decode("cp1252"))
                    except Exception:
                        pass
                continue
            if nxt in (b"{", b"}", b"\\"):
                i += 2
                if not skipping and pending_skip == 0:
                    out.append(nxt.decode("ascii"))
                elif pending_skip > 0:
                    pending_skip -= 1
                continue
            if nxt == b"~":
                i += 2
                if not skipping:
                    out.append(" ")
                continue
            if nxt in (b"-", b"_", b"*"):
                i += 2
                continue
            m = _CW_RE.match(b, i)
            if m is None:
                i += 2                  # lone control symbol: skip
                continue
            word = m.group(1).decode("ascii")
            param = m.group(2)
            i = m.end()
            if word == "u":
                # \uN + \uc-many fallback bytes to swallow
                if not skipping and param is not None:
                    cp = int(param)
                    if cp < 0:
                        cp += 65536
                    try:
                        out.append(chr(cp))
                    except ValueError:
                        pass
                pending_skip = uc
                continue
            pending_skip = 0
            if word == "uc":
                uc = int(param or 1)
            elif word in ("par", "line"):
                if not skipping:
                    out.append("\n")
            elif word in ("tab", "cell"):
                if not skipping:
                    out.append("\t")
            elif word == "row":
                if not skipping:
                    out.append("\n")
            elif word in ("sect", "page"):
                if not skipping:
                    out.append("\n\n")
            elif word in _SKIP_DESTS:
                skipping = True
            # any other control word: ignored (forward compatibility)
            continue
        j = i
        while j < n and b[j:j + 1] not in (b"{", b"}", b"\\"):
            j += 1
        if not skipping:
            chunk = b[i:j].replace(b"\r", b"").replace(b"\n", b"")
            if pending_skip:
                take = min(pending_skip, len(chunk))
                chunk = chunk[take:]
                pending_skip -= take
            if chunk:
                out.append(chunk.decode("cp1252", "replace"))
        i = j
    text = "".join(out)
    # collapse the run-on whitespace RTF writers leave behind
    text = re.sub(r"[ \t]*\n[ \t]*", "\n", text)
    return re.sub(r"\n{3,}", "\n\n", text).strip()


def make_rtf(paragraphs: List[str]) -> bytes:
    r"""Deterministic RTF fixture: a font table destination (must be
    skipped), cp1252-escaped non-ASCII, \uN escapes with fallback
    chars, and \par paragraph breaks."""
    body: List[str] = []
    for p in paragraphs:
        enc: List[str] = []
        for ch in p:
            o = ord(ch)
            if ch in "\\{}":
                enc.append("\\" + ch)
            elif o < 128:
                enc.append(ch)
            else:
                try:
                    byte = ch.encode("cp1252")
                    enc.append(f"\\'{byte[0]:02x}")
                except UnicodeEncodeError:
                    cp = o if o < 32768 else o - 65536
                    enc.append(f"\\u{cp}?")
            # (the '?' is the 1-byte ANSI fallback \uc1 swallows)
        body.append("".join(enc))
    doc = ("{\\rtf1\\ansi\\ansicpg1252\\deff0\\uc1"
           "{\\fonttbl{\\f0\\fswiss Helvetica;}}"
           "{\\*\\generator docling-graph-spark fixtures;}"
           + "\\par ".join(body) + "}")
    return doc.encode("ascii")


# ------------------------------------------- subtitles (WebVTT / SRT)

_VTT_NOTE_RE = re.compile(r"^(?:NOTE|STYLE|REGION)\b")
_CUE_TAG_RE = re.compile(r"</?[a-zA-Z][^>]*>|\{\\?an?\d\}")


def is_webvtt(payload: Optional[bytes]) -> bool:
    return bool(payload) and payload.lstrip(
        b"\xef\xbb\xbf")[:6] == b"WEBVTT"


def is_srt(payload: Optional[bytes]) -> bool:
    """SRT has no magic: accept when the head matches the
    counter/timestamp cue structure (first two non-blank lines are a
    number then a ``-->`` timing line)."""
    if not payload:
        return False
    head = payload.lstrip(b"\xef\xbb\xbf")[:256]
    lines = [ln.strip() for ln in head.splitlines() if ln.strip()]
    return (len(lines) >= 2 and lines[0].isdigit()
            and b"-->" in lines[1])


def extract_subtitle_text(payload: bytes) -> str:
    """Cue text of a WebVTT or SRT file: counters, timing lines,
    NOTE/STYLE/REGION blocks and inline cue tags (``<i>``, ``<c.cls>``,
    ``{\\an8}``) stripped; consecutive cue lines join with newlines,
    cues separate with blank lines — the transcript a text corpus
    keeps."""
    text = payload[:MAX_RTF_BYTES].lstrip(b"\xef\xbb\xbf") \
        .decode("utf-8", "replace")
    out: List[str] = []
    in_note = False
    cue: List[str] = []
    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            if cue:
                out.append("\n".join(cue))
                cue = []
            in_note = False
            continue
        if line.startswith("WEBVTT"):
            continue
        if _VTT_NOTE_RE.match(line):
            in_note = True
            continue
        if in_note:
            continue
        if line.isdigit() and not cue:
            continue                    # SRT cue counter
        if "-->" in line:
            continue                    # timing line
        cleaned = _CUE_TAG_RE.sub("", line).strip()
        if cleaned:
            cue.append(cleaned)
    if cue:
        out.append("\n".join(cue))
    return "\n\n".join(out)


def make_webvtt(cues: List[str]) -> bytes:
    body = ["WEBVTT", "", "NOTE generated fixture", ""]
    t = 0
    for c in cues:
        body.append(f"00:00:{t:02d}.000 --> 00:00:{t + 2:02d}.000")
        body.append(f"<i>{c}</i>")
        body.append("")
        t += 3
    return "\n".join(body).encode("utf-8")


def make_srt(cues: List[str]) -> bytes:
    body: List[str] = []
    t = 0
    for i, c in enumerate(cues, start=1):
        body.append(str(i))
        body.append(f"00:00:{t:02d},000 --> 00:00:{t + 2:02d},000")
        body.append(c)
        body.append("")
        t += 3
    return "\n".join(body).encode("utf-8")
