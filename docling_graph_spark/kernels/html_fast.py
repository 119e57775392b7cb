"""Fast single-pass HTML tokenizer, token-for-token identical to stdlib
``html.parser.HTMLParser(convert_charrefs=True)`` fed the whole document
once and closed.

Why: profiling the extraction stage shows >80% of kernel time inside the
stdlib parser's bookkeeping (``goahead`` re-dispatch, ``updatepos`` line
counting, incremental-buffer handling) — none of which matters when the
full document is in hand.  This module inlines the exact same state
machine for that one-shot case, reusing the stdlib's own compiled
regexes (``tagfind_tolerant``, ``attrfind_tolerant``,
``locatestarttagend_tolerant``, ``endtagfind``) so the emitted token
stream — and therefore the extracted text, which the north rule requires
to be byte-identical per url — cannot diverge on any input the regexes
decide.  Constructs outside the replicated subset (SGML marked sections,
``<![...]>``) raise :class:`Fallback` and the caller re-parses with the
stdlib builder.

Differential guarantees are enforced by tests/test_html_fast.py: the
full test corpus plus adversarial + hypothesis-fuzzed inputs must
produce identical trees through both paths.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import (
    attrfind_tolerant,
    endtagfind,
    locatestarttagend_tolerant,
    tagfind_tolerant,
)

from _markupbase import _commentclose  # same close-scan the stdlib uses

_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script\s*>", re.I),
    "style": re.compile(r"</\s*style\s*>", re.I),
}
_ASCII_LETTERS = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
_TAG_TAIL_CHARS = frozenset("abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ")


class Fallback(Exception):
    """Raised for constructs the fast path does not replicate."""


# Strict-shape start tag: the overwhelmingly common case, parsed with one
# regex instead of the stdlib's three.  Deliberately conservative so the
# stdlib regexes provably agree on every string this matches: alnum-only
# tag name, ASCII-whitespace separators only (the stdlib's \s is
# unicode-aware but its tag-name charset ISN'T, so a unicode space between
# attrs parses differently — such inputs must take the exact path), attr
# names in [-a-zA-Z0-9_:.], single '=', quoted values free of the quote
# char / '<' / '&' (no unescape needed), optional '/' directly before '>'.
_SIMPLE_TAG = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:[ \t\n\r\f]+[a-zA-Z_:][-a-zA-Z0-9_:.]*"
    r"(?:=(?:\"[^\"<&]*\"|'[^'<&]*'))?)*)"
    r"[ \t\n\r\f]*(/?)>"
)
_SIMPLE_ATTR = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)"
    r"(?:=(?:\"([^\"<&]*)\"|'([^'<&]*)'))?"
)
# Strict-shape end tag (no whitespace, alnum name) — agrees with
# endtagfind wherever it matches.
_SIMPLE_END = re.compile(r"</([a-zA-Z][a-zA-Z0-9]*)>")


def _whole_start_tag_end(rawdata: str, i: int) -> int:
    """Inline of HTMLParser.check_for_whole_start_tag with the buffer
    treated as complete (feed-once + close): -1 means EOF mid-tag."""
    m = locatestarttagend_tolerant.match(rawdata, i)
    j = m.end()
    nxt = rawdata[j : j + 1]
    if nxt == ">":
        return j + 1
    if nxt == "/":
        if rawdata.startswith("/>", j):
            return j + 2
        return -1  # '/' not followed by '>' is the stdlib's -1 branch
    if nxt == "":
        return -1
    if nxt in _TAG_TAIL_CHARS:
        return -1
    return j if j > i else i + 1


def _parse_starttag(rawdata: str, i: int, builder) -> tuple[int, str | None]:
    """Inline of HTMLParser.parse_starttag. Returns (next index or -1,
    cdata element entered or None)."""
    endpos = _whole_start_tag_end(rawdata, i)
    if endpos < 0:
        return endpos, None
    m = tagfind_tolerant.match(rawdata, i + 1)
    k = m.end()
    tag = m.group(1).lower()
    attrs = []
    while k < endpos:
        ma = attrfind_tolerant.match(rawdata, k)
        if not ma:
            break
        attrname, rest, attrvalue = ma.group(1, 2, 3)
        if not rest:
            attrvalue = None
        elif attrvalue[:1] == "'" == attrvalue[-1:] or \
                attrvalue[:1] == '"' == attrvalue[-1:]:
            attrvalue = attrvalue[1:-1]
        if attrvalue:
            attrvalue = unescape(attrvalue)
        attrs.append((attrname.lower(), attrvalue))
        k = ma.end()
    end = rawdata[k:endpos].strip()
    if end not in (">", "/>"):
        builder.handle_data(rawdata[i:endpos])  # raw, as the stdlib does
        return endpos, None
    if end.endswith("/>"):
        builder.handle_startendtag(tag, attrs)
        return endpos, None
    builder.handle_starttag(tag, attrs)
    if tag == "script" or tag == "style":  # HTMLParser.CDATA_CONTENT_ELEMENTS
        return endpos, tag
    return endpos, None


def _parse_endtag(rawdata: str, i: int, builder,
                  cdata_elem: str | None) -> tuple[int, str | None]:
    """Inline of HTMLParser.parse_endtag. Returns (next index or -1,
    remaining cdata element)."""
    gt = rawdata.find(">", i + 1)
    if gt < 0:
        return -1, cdata_elem
    gtpos = gt + 1
    m = endtagfind.match(rawdata, i)
    if not m:
        if cdata_elem is not None:
            builder.handle_data(rawdata[i:gtpos])
            return gtpos, cdata_elem
        nm = tagfind_tolerant.match(rawdata, i + 2)
        if not nm:
            if rawdata[i : i + 3] == "</>":
                return i + 3, None
            # bogus comment: consumed to '>', reported to a no-op handler
            pos = rawdata.find(">", i + 2)
            return (pos + 1 if pos != -1 else -1), None
        tagname = nm.group(1).lower()
        gtpos = rawdata.find(">", nm.end()) + 1
        builder.handle_endtag(tagname)
        return gtpos, None
    elem = m.group(1).lower()
    if cdata_elem is not None and elem != cdata_elem:
        builder.handle_data(rawdata[i:gtpos])
        return gtpos, cdata_elem
    builder.handle_endtag(elem)
    return gtpos, None


def fast_feed(rawdata: str, builder) -> None:
    """Emit the exact token stream of
    ``HTMLParser(convert_charrefs=True).feed(rawdata); close()``
    into ``builder`` (which only implements handle_starttag /
    handle_startendtag / handle_endtag / handle_data).

    Raises :class:`Fallback` on SGML marked sections (``<![``) — the one
    stdlib construct not replicated here (it can raise AssertionError
    inside the stdlib, which callers swallow; replicating that exactly is
    not worth the code).
    """
    n = len(rawdata)
    i = 0
    cdata_elem: str | None = None
    handle_data = builder.handle_data
    find = rawdata.find
    startswith = rawdata.startswith
    while i < n:
        if cdata_elem is None:
            j = find("<", i)
            if j < 0:
                j = n
            if i < j:
                chunk = rawdata[i:j]
                if "&" in chunk:
                    chunk = unescape(chunk)
                handle_data(chunk)
        else:
            m = _CDATA_CLOSE[cdata_elem].search(rawdata, i)
            if m is None:
                return  # unterminated cdata: stdlib drops the tail
            j = m.start()
            if i < j:
                handle_data(rawdata[i:j])  # cdata text is never unescaped
        i = j
        if i == n:
            return
        c = rawdata[i + 1 : i + 2]
        if c in _ASCII_LETTERS:
            m = _SIMPLE_TAG.match(rawdata, i)
            if m is not None:
                tag, rawattrs, slash = m.group(1, 2, 3)
                tag = tag.lower()
                attrs = (
                    {
                        a.group(1).lower():
                            a.group(2) if a.group(2) is not None else a.group(3)
                        for a in _SIMPLE_ATTR.finditer(rawattrs)
                    }
                    if rawattrs else {}
                )
                k = m.end()
                if slash:
                    builder.leaf_node(tag, attrs)
                else:
                    builder.start_node(tag, attrs)
                    if tag == "script" or tag == "style":
                        cdata_elem = tag
            else:
                k, entered = _parse_starttag(rawdata, i, builder)
                if entered is not None:
                    cdata_elem = entered
        elif startswith("</", i):
            if cdata_elem is None:
                m = _SIMPLE_END.match(rawdata, i)
                if m is not None:
                    builder.handle_endtag(m.group(1).lower())
                    k = m.end()
                else:
                    k, cdata_elem = _parse_endtag(rawdata, i, builder, cdata_elem)
            else:
                k, cdata_elem = _parse_endtag(rawdata, i, builder, cdata_elem)
        elif startswith("<!--", i):
            m = _commentclose.search(rawdata, i + 4)
            k = m.end() if m else -1
        elif startswith("<?", i):
            pos = find(">", i + 2)
            k = pos + 1 if pos >= 0 else -1
        elif startswith("<!", i):
            if startswith("<![", i):
                raise Fallback("marked section")
            if rawdata[i : i + 9].lower() == "<!doctype":
                pos = find(">", i + 9)
                k = pos + 1 if pos != -1 else -1
            else:
                # bogus comment (includes '<!>' and a bare trailing '<!')
                pos = find(">", i + 2)
                k = pos + 1 if pos != -1 else -1
        elif i + 1 < n:
            handle_data("<")
            i += 1
            continue
        else:
            break
        if k < 0:
            # the stdlib's end-of-input recovery: swallow to the next
            # '>' (inclusive) / '<' (exclusive) / one char, emit as data
            k = find(">", i + 1)
            if k < 0:
                k = find("<", i + 1)
                if k < 0:
                    k = i + 1
            else:
                k += 1
            chunk = rawdata[i:k]
            if cdata_elem is None:
                handle_data(unescape(chunk))
            else:
                handle_data(chunk)
        i = k
    if i < n and cdata_elem is None:
        handle_data(unescape(rawdata[i:n]))
