"""Deterministic HTML main-content extraction (boilerplate stripping).

New code required by the north star (the reference has no HTML path — its
text handler is identity: `/root/reference/docling_graph/core/input/handlers.py:45-121`).
Implements the public Readability / Trafilatura recipe with stdlib only:

1. build a DOM tree (``html.parser``, entity refs decoded);
2. hard-drop non-content machinery (script/style/form/...) and classic
   boilerplate blocks by tag (nav/header/footer/aside) or id/class hints
   (menu, sidebar, comment, banner, ad, ...);
3. score every container by the link-density-penalised text mass of its
   block-level descendants (``sum(max(0, text_len - 2*link_text_len))``)
   with a bonus multiplier for semantic containers (<article>, <main>,
   content-ish class names);
4. the best-scoring container wins (document order breaks ties); its block
   elements are emitted in document order, joined with a blank line.

The function is a pure function of the input bytes — no models, no RNG —
so extracted text per url is reproducible byte-for-byte, which is the
correctness invariant the driver checks.  Whitespace inside text nodes is
preserved verbatim (no normalisation) so that a page whose main content is a
known text reconstructs that text exactly.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

from .encoding import sniff_decode
from .html_fast import fast_feed

DROP_TAGS = frozenset({
    "script", "style", "noscript", "template", "svg", "iframe", "canvas",
    "form", "button", "input", "select", "textarea", "object", "embed",
})
BOILERPLATE_TAGS = frozenset({"nav", "footer", "header", "aside"})
BOILERPLATE_HINT = re.compile(
    r"(?:^|[\s_-])(?:nav|menu|footer|sidebar|side-bar|comment|banner|advert|"
    r"ads?|breadcrumb|share|social|related|promo|cookie|popup|masthead)(?:$|[\s_-])",
    re.IGNORECASE,
)
CONTENT_HINT = re.compile(
    r"(?:^|[\s_-])(?:article|main|content|body|post|entry|text|story)(?:$|[\s_-])",
    re.IGNORECASE,
)
BLOCK_TAGS = frozenset({
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre", "blockquote",
    "td", "th", "dd", "dt", "figcaption", "caption",
})
CONTAINER_TAGS = frozenset({
    "article", "main", "section", "div", "body", "html", "table", "ul",
    "ol", "dl",
})
VOID_TAGS = frozenset({
    "br", "hr", "img", "meta", "link", "area", "base", "col",
    "embed", "source", "track", "wbr",
})
SEMANTIC_BONUS = {"article": 2.0, "main": 2.0}


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent", "order")

    def __init__(self, tag: str, attrs: Dict[str, str], parent: Optional["_Node"], order: int):
        self.tag = tag
        self.attrs = attrs
        self.children: List[Any] = []  # _Node or str
        self.parent = parent
        self.order = order


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {}, None, 0)
        self._cur = self.root
        self._n = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        self.start_node(tag, dict(attrs))

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.leaf_node(tag, dict(attrs))

    # attrs-already-a-dict entry points (the fast tokenizer builds the dict
    # directly, skipping the list-of-tuples round trip)
    def start_node(self, tag: str, attrs: Dict[str, str]) -> None:
        if tag in VOID_TAGS:
            self.leaf_node(tag, attrs)
            return
        self._n += 1
        node = _Node(tag, attrs, self._cur, self._n)
        self._cur.children.append(node)
        self._cur = node

    def leaf_node(self, tag: str, attrs: Dict[str, str]) -> None:
        self._n += 1
        node = _Node(tag, attrs, self._cur, self._n)
        self._cur.children.append(node)

    def handle_endtag(self, tag: str) -> None:
        # pop to the nearest matching open tag (tolerates bad nesting)
        node = self._cur
        while node is not self.root and node.tag != tag:
            node = node.parent
        if node is not self.root:
            self._cur = node.parent

    def handle_data(self, data: str) -> None:
        if data:
            self._cur.children.append(data)


class BlockSpan(NamedTuple):
    start: int  # offset into the extracted text
    end: int
    tag: str


class ExtractionResult(NamedTuple):
    text: str
    spans: List[BlockSpan]
    bytes_stripped: int


def _is_boilerplate(node: _Node) -> bool:
    if node.tag in BOILERPLATE_TAGS:
        return True
    hint = f"{node.attrs.get('id', '')} {node.attrs.get('class', '')}"
    return bool(hint.strip()) and bool(BOILERPLATE_HINT.search(hint))


def _analyze(node: _Node, out: List[Tuple[float, int, "_Node"]]) -> Tuple[int, int, float]:
    """Single post-order pass fusing _prune + _measure + _score_containers
    (kept below as the readable spec; differential-tested equal).

    Returns ``(text_len, link_text_len, block_score)`` of the kept subtree,
    where ``block_score`` is the sum of ``max(0, t - 2*l)`` over the node's
    MAXIMAL block-tag descendants — exactly what the stack walk in
    _score_containers computes per container, but shared bottom-up instead
    of recomputed per ancestor.  All partial sums are integer-valued floats
    (< 2**53), so summation order cannot change the winner.

    Recursive — the fast shape for real page depths (tens of levels).
    Crawl nesting bombs that blow the recursion limit retry through
    `_analyze_iter` (extract_main_content catches RecursionError; pruning
    only removes children, so a partially-pruned tree re-analyzes to the
    identical result)."""
    kept: List[Any] = []
    total = 0
    linked = 0
    bscore = 0.0
    for child in node.children:
        if isinstance(child, str):
            kept.append(child)
            total += len(child.strip())
            continue
        if child.tag in DROP_TAGS or _is_boilerplate(child):
            continue
        t, l, bs = _analyze(child, out)
        kept.append(child)
        total += t
        linked += t if child.tag == "a" else l
        if child.tag in BLOCK_TAGS:
            bscore += max(0.0, t - 2.0 * l)
        else:
            bscore += bs
    node.children = kept
    tag = node.tag
    if bscore > 0 and (tag in CONTAINER_TAGS or tag == "#root"):
        bonus = SEMANTIC_BONUS.get(tag, 1.0)
        if tag != "#root":
            attrs = node.attrs
            hint = f"{attrs.get('id', '')} {attrs.get('class', '')}"
            if hint.strip() and CONTENT_HINT.search(hint):
                bonus *= 1.5
        out.append((bscore * bonus, node.order, node))
    return total, linked, bscore


def _analyze_iter(root: _Node, out: List[Tuple[float, int, "_Node"]]) -> Tuple[int, int, float]:
    """Depth-proof _analyze (explicit stacks): same result on any tree,
    ~25% slower on common pages — used only when the recursive pass hits
    the recursion limit (nesting-bomb documents)."""
    # phase 1: top-down prune; record nodes so that children come after
    # their parent (reverse order = valid post-order evaluation order)
    topo: List[_Node] = []
    stack: List[_Node] = [root]
    while stack:
        node = stack.pop()
        kept: List[Any] = []
        for child in node.children:
            if isinstance(child, str):
                kept.append(child)
                continue
            if child.tag in DROP_TAGS or _is_boilerplate(child):
                continue
            kept.append(child)
            stack.append(child)
        node.children = kept
        topo.append(node)
    # phase 2: children-first accumulation
    measures: Dict[int, Tuple[int, int, float]] = {}
    for node in reversed(topo):
        total = 0
        linked = 0
        bscore = 0.0
        for child in node.children:
            if isinstance(child, str):
                total += len(child.strip())
                continue
            t, l, bs = measures[id(child)]
            total += t
            linked += t if child.tag == "a" else l
            if child.tag in BLOCK_TAGS:
                bscore += max(0.0, t - 2.0 * l)
            else:
                bscore += bs
        measures[id(node)] = (total, linked, bscore)
        tag = node.tag
        if bscore > 0 and (tag in CONTAINER_TAGS or tag == "#root"):
            bonus = SEMANTIC_BONUS.get(tag, 1.0)
            if tag != "#root":
                attrs = node.attrs
                hint = f"{attrs.get('id', '')} {attrs.get('class', '')}"
                if hint.strip() and CONTENT_HINT.search(hint):
                    bonus *= 1.5
            out.append((bscore * bonus, node.order, node))
    return measures[id(root)]


def _prune(node: _Node) -> None:
    kept: List[Any] = []
    for child in node.children:
        if isinstance(child, str):
            kept.append(child)
            continue
        if child.tag in DROP_TAGS or _is_boilerplate(child):
            continue
        _prune(child)
        kept.append(child)
    node.children = kept


def _text_of(node: _Node) -> str:
    parts: List[str] = []
    for child in node.children:
        if isinstance(child, str):
            parts.append(child)
        elif child.tag == "br":
            parts.append("\n")
        else:
            parts.append(_text_of(child))
    return "".join(parts)


def _text_of_iter(node: _Node) -> str:
    # depth-proof _text_of: iterative pre-order (document order)
    parts: List[str] = []
    stack: List[Any] = list(reversed(node.children))
    while stack:
        child = stack.pop()
        if isinstance(child, str):
            parts.append(child)
        elif child.tag == "br":
            parts.append("\n")
        else:
            stack.extend(reversed(child.children))
    return "".join(parts)


def _measure(node: _Node, cache: Dict[int, Tuple[int, int]]) -> Tuple[int, int]:
    """(text_len, link_text_len) over all descendants."""
    total = 0
    linked = 0
    for child in node.children:
        if isinstance(child, str):
            total += len(child.strip())
        else:
            t, l = _measure(child, cache)
            total += t
            linked += t if child.tag == "a" else l
    cache[id(node)] = (total, linked)
    return total, linked


def _score_containers(node: _Node, cache: Dict[int, Tuple[int, int]],
                      out: List[Tuple[float, int, _Node]]) -> None:
    if node.tag in CONTAINER_TAGS or node.tag == "#root":
        score = 0.0
        stack = [node]
        while stack:
            cur = stack.pop()
            for child in cur.children:
                if isinstance(child, str):
                    continue
                if child.tag in BLOCK_TAGS:
                    t, l = cache[id(child)]
                    score += max(0.0, t - 2.0 * l)
                else:
                    stack.append(child)
        hint = f"{node.attrs.get('id', '')} {node.attrs.get('class', '')}" if node.tag != "#root" else ""
        bonus = SEMANTIC_BONUS.get(node.tag, 1.0)
        if hint.strip() and CONTENT_HINT.search(hint):
            bonus *= 1.5
        if score > 0:
            out.append((score * bonus, node.order, node))
    for child in node.children:
        if not isinstance(child, str):
            _score_containers(child, cache, out)


def _collect_blocks(node: _Node, out: List[Tuple[str, str]]) -> None:
    """Emit (tag, text) for block elements in document order; text outside
    any block element inside the container is attached as anonymous blocks."""
    loose: List[str] = []

    def flush_loose() -> None:
        if loose:
            joined = "".join(loose)
            if joined.strip():
                out.append(("_text", joined.strip()))
            loose.clear()

    for child in node.children:
        if isinstance(child, str):
            loose.append(child)
        elif child.tag in BLOCK_TAGS:
            flush_loose()
            out.append((child.tag, _text_of(child)))
        elif child.tag == "br":
            loose.append("\n")
        else:
            flush_loose()
            _collect_blocks(child, out)
    flush_loose()


def _collect_blocks_iter(node: _Node, out: List[Tuple[str, str]]) -> None:
    """Depth-proof _collect_blocks: one frame (child iterator + loose-text
    buffer) per descended container level, mirroring the recursive
    formulation's per-level buffering."""

    def flush(loose: List[str]) -> None:
        if loose:
            joined = "".join(loose)
            if joined.strip():
                out.append(("_text", joined.strip()))
            loose.clear()

    frames: List[Tuple[Any, List[str]]] = [(iter(node.children), [])]
    while frames:
        it, loose = frames[-1]
        descended = False
        for child in it:
            if isinstance(child, str):
                loose.append(child)
            elif child.tag in BLOCK_TAGS:
                flush(loose)
                out.append((child.tag, _text_of_iter(child)))
            elif child.tag == "br":
                loose.append("\n")
            else:
                flush(loose)
                frames.append((iter(child.children), []))
                descended = True
                break
        if not descended:
            flush(loose)
            frames.pop()


def build_dom(html: bytes | str,
              transport: Optional[str] = None) -> _Node:
    """Decode + parse crawl bytes into the module's DOM tree (shared by
    the main-content extractor and the markdown serializer).

    Bytes go through the charset sniff (BOM -> transport -> strict UTF-8
    -> meta prescan -> cp1252): real crawl payloads are ~10% legacy
    encodings with a declaration; decoding those as UTF-8-with-replacement
    destroys every non-ASCII character (kernels/encoding.py).

    Parsing takes the fast path first: a one-shot tokenizer emitting the
    stdlib parser's exact token stream (kernels/html_fast.py).  Any
    construct it does not replicate — or any unexpected error — falls
    back to a from-scratch stdlib parse, so the output is the stdlib
    output on every input by construction (differentially enforced in
    tests/test_html_fast.py)."""
    if isinstance(html, bytes):
        markup, _enc = sniff_decode(html, transport)
    else:
        markup = html
    builder = _TreeBuilder()
    try:
        fast_feed(markup, builder)
    except Exception:
        builder = _TreeBuilder()
        try:
            builder.feed(markup)
            builder.close()
        except Exception:
            pass  # html.parser is forgiving; keep whatever tree we built
    return builder.root


def extract_main_content(html: bytes | str,
                         transport: Optional[str] = None) -> ExtractionResult:
    """Strip boilerplate and return (main text, block spans, bytes_stripped).

    ``transport`` is an optional HTTP Content-Type header value (a WARC
    response record carries one): its charset parameter takes precedence
    over the in-document declaration, per the HTML5 order."""
    raw_len = (len(html) if isinstance(html, bytes)
               else len(html.encode("utf-8")))
    root = build_dom(html, transport)
    # recursive analysis is the fast shape for real page depths; crawl
    # nesting bombs retry through the depth-proof iterative twins (pruning
    # only removes children, so re-analyzing a partially-pruned tree gives
    # the identical result)
    candidates: List[Tuple[float, int, _Node]] = []
    try:
        _analyze(root, candidates)
    except RecursionError:
        candidates = []
        _analyze_iter(root, candidates)

    if candidates:
        # max score; ties broken by earliest document order
        best = max(candidates, key=lambda c: (c[0], -c[1]))[2]
        blocks: List[Tuple[str, str]] = []
        try:
            _collect_blocks(best, blocks)
        except RecursionError:
            blocks = []
            _collect_blocks_iter(best, blocks)
    else:
        blocks = []

    pieces: List[str] = []
    spans: List[BlockSpan] = []
    offset = 0
    for i, (tag, btext) in enumerate(blocks):
        if i > 0:
            offset += 2  # "\n\n" separator
        spans.append(BlockSpan(offset, offset + len(btext), tag))
        pieces.append(btext)
        offset += len(btext)
    text = "\n\n".join(pieces)
    return ExtractionResult(text, spans, raw_len - len(text.encode("utf-8")))
