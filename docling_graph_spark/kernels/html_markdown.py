"""Deterministic HTML → Markdown serialization (docling-style markdown
writeback: the reference renders every converted document to markdown
before chunking — `docling` `export_to_markdown`; this is the
crawl-native analogue over raw page HTML).

Serialization rules (GFM-flavoured, chosen so output is a pure function
of the input bytes):

* ``<head>`` and machinery tags (script/style/form/... — the extractor's
  DROP_TAGS) are dropped wholly;
* ``h1..h6`` → ``#``·k heading lines; ``p``/``blockquote``/``pre`` →
  their own blocks (blockquote prefixed ``> `` per line, pre fenced);
* ``ul``/``ol`` items → ``- `` / ``1.``-numbered lines, one block per
  list;
* ``table`` → GFM pipes: the FIRST row is always the header row and the
  separator width is its cell count (deterministic even for headerless
  layout tables);
* inline: ``a`` → ``[text](href)``, ``b/strong`` → ``**..**``,
  ``i/em`` → ``*..*``, ``code`` → `` `..` ``, ``br`` → newline, ``img``
  → ``![alt](src)``;
* text inside explicit blocks is kept VERBATIM (no whitespace
  normalisation — same contract as the main-content extractor, so a
  page whose content is a known text round-trips exactly); runs of
  loose inline content between blocks flush as one implicit paragraph,
  stripped at both ends;
* blocks join with one blank line.

Stdlib only, no recursion limits hit in practice (the DOM walk recurses
per nesting level; crawl nesting bombs already fall back upstream in
build_dom's tolerant parse).
"""

from __future__ import annotations

from typing import List

from .html_main import DROP_TAGS, _Node, build_dom

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_SKIP = DROP_TAGS | {"head"}


def _inline(node: _Node) -> str:
    """Serialize a node's content as inline markdown text."""
    out: List[str] = []
    for ch in node.children:
        if isinstance(ch, str):
            out.append(ch)
            continue
        t = ch.tag
        if t in _SKIP:
            continue
        if t == "a":
            out.append(f"[{_inline(ch)}]({ch.attrs.get('href', '')})")
        elif t in ("b", "strong"):
            out.append(f"**{_inline(ch)}**")
        elif t in ("i", "em"):
            out.append(f"*{_inline(ch)}*")
        elif t == "code":
            out.append(f"`{_inline(ch)}`")
        elif t == "br":
            out.append("\n")
        elif t == "img":
            out.append(f"![{ch.attrs.get('alt', '')}]"
                       f"({ch.attrs.get('src', '')})")
        else:
            out.append(_inline(ch))
    return "".join(out)


def _table_block(node: _Node) -> str:
    rows: List[List[str]] = []

    def walk(n: _Node) -> None:
        for ch in n.children:
            if not isinstance(ch, _Node):
                continue
            if ch.tag == "tr":
                cells = [_inline(c).strip() for c in ch.children
                         if isinstance(c, _Node) and c.tag in ("td", "th")]
                if cells:
                    rows.append(cells)
            elif ch.tag in ("thead", "tbody", "tfoot"):
                walk(ch)

    walk(node)
    if not rows:
        return ""
    lines = ["| " + " | ".join(rows[0]) + " |",
             "| " + " | ".join(["---"] * len(rows[0])) + " |"]
    for r in rows[1:]:
        lines.append("| " + " | ".join(r) + " |")
    return "\n".join(lines)


def _list_block(node: _Node, ordered: bool) -> str:
    lines: List[str] = []
    i = 0
    for ch in node.children:
        if isinstance(ch, _Node) and ch.tag == "li":
            i += 1
            marker = f"{i}." if ordered else "-"
            lines.append(f"{marker} {_inline(ch).strip()}")
    return "\n".join(lines)


def _walk(node: _Node, blocks: List[str]) -> None:
    loose: List[str] = []

    def flush() -> None:
        para = "".join(loose).strip()
        loose.clear()
        if para:
            blocks.append(para)

    for ch in node.children:
        if isinstance(ch, str):
            loose.append(ch)
            continue
        t = ch.tag
        if t in _SKIP:
            continue
        if t in _HEADINGS:
            flush()
            blocks.append("#" * _HEADINGS[t] + " " + _inline(ch).strip())
        elif t == "p":
            flush()
            # emit even when empty: an empty <p> between two blocks must
            # contribute its blank-line separators so text containing
            # \n\n\n\n round-trips byte-identically (same contract as the
            # main-content extractor's block list)
            blocks.append(_inline(ch))
        elif t == "blockquote":
            flush()
            txt = _inline(ch).strip()
            if txt:
                blocks.append("\n".join("> " + ln
                                        for ln in txt.split("\n")))
        elif t == "pre":
            flush()
            blocks.append("```\n" + _inline(ch) + "\n```")
        elif t in ("ul", "ol"):
            flush()
            lst = _list_block(ch, ordered=(t == "ol"))
            if lst:
                blocks.append(lst)
        elif t == "table":
            flush()
            tbl = _table_block(ch)
            if tbl:
                blocks.append(tbl)
        elif t in ("a", "b", "strong", "i", "em", "code", "br", "img",
                   "span", "small", "sup", "sub", "u", "s", "abbr",
                   "time", "mark"):
            loose.append(_inline_one(ch))
        else:
            flush()
            _walk(ch, blocks)
    flush()


def _inline_one(node: _Node) -> str:
    """Inline-serialize a single node (wrap it so _inline sees it as a
    child)."""
    holder = _Node("#h", {}, None, 0)
    holder.children = [node]
    return _inline(holder)


def html_to_markdown(html: bytes | str, transport: str | None = None) -> str:
    """Render a crawl page to markdown; pure function of the bytes."""
    blocks: List[str] = []
    _walk(build_dom(html, transport), blocks)
    return "\n\n".join(blocks)
