"""Differential tests: the fast one-shot HTML tokenizer
(kernels/html_fast.py) must build the exact same tree as the stdlib
``html.parser`` path on every input — that identity is what keeps the
north rule's byte-identical-extracted-text-per-url invariant intact
after the hot-path rewrite.
"""

import random

import pytest

import docling_graph_spark.kernels.html_main as hm
from docling_graph_spark.kernels.html_fast import Fallback, fast_feed
from docling_graph_spark.kernels.html_main import extract_main_content


def _tree_stdlib(markup: str):
    b = hm._TreeBuilder()
    try:
        b.feed(markup)
        b.close()
    except Exception:
        pass
    return b.root


def _tree_fast(markup: str):
    b = hm._TreeBuilder()
    fast_feed(markup, b)
    return b.root


def _dump(node):
    out = []

    def rec(x):
        if isinstance(x, str):
            out.append(("T", x))
            return
        out.append(("N", x.tag, tuple(sorted(x.attrs.items())), x.order))
        for c in x.children:
            rec(c)

    rec(node)
    return out


def _assert_same(markup: str):
    try:
        fast = _dump(_tree_fast(markup))
    except Fallback:
        return  # declared fallback construct: stdlib path is used in prod
    assert fast == _dump(_tree_stdlib(markup)), repr(markup)


ADVERSARIAL = [
    "", "<", "a<b", "a < b", "<p>x&amp;y</p>", "<p>x&ampy", "text&#65;more",
    "t&#x41;x", "<!DOCTYPE html><p>a</p>", "<!doctype", "<!>", "<!-- c -->x",
    "<!--unterminated", "<?pi?>x", "<?unterminated", "</>", "</ bogus>x",
    "</p attr='>'>tail", "<script>if(a<b){x='</notscript>'}</script>after",
    "<script>unterminated", "<ScRiPt>a</sCrIpT>b", "<style>p{c:red}</style>q",
    "<a href='x&amp;y'>l</a>", '<a href="u" broken=>t</a>', "<a href=>x</a>",
    "<div class='c' 'lone'>x</div>", "<br/>", "<img src=x>", "<p/>q", "<p",
    "<p class='x", "<a b=c/d>x", "<a b='c' / >x", "<a/ >x", "<em  >x</em  >",
    "<p>a<p>b", "<b><i>x</b>y</i>", "<td>z", "<a\nhref='q'>m</a>", "<p>x</p",
    "<p>tail&", "<p>tail&am", "<p>tail&amp", "&unknownentity;",
    "<p>&lt;tag&gt;</p>", "<script src='x'/>after", "<script>a</script >b",
    "<div a=1 a=2>x</div>", "<div =bogus>x</div>", "<1notatag>", "< p>x</ p>",
    "<p>é&eacute;</p>", "x&#;y", "x&#q", "<!--->", "<!---->", "<!-- -- >x",
    "<a b=\"c\" b=\"d\">dup</a>", "</P >", "</p\t>", "</p x>", "</td",
    "<em\xa0x='1'>u</em>", "<a\x0bb>v</a>", "<a b==\"c\">w</a>",
    "<x-y z='1'>hyphenated</x-y>", "<a  b \t= \n\"c\" >spaced</a>",
]


@pytest.mark.parametrize("markup", ADVERSARIAL, ids=range(len(ADVERSARIAL)))
def test_adversarial_identical(markup):
    _assert_same(markup)


def test_marked_section_falls_back():
    with pytest.raises(Fallback):
        _tree_fast("before<![CDATA[x]]>after")
    # the public entry point still succeeds via the stdlib path
    res = extract_main_content("<div><p>before<![CDATA[x]]>after</p></div>")
    assert "before" in res.text


FRAGMENTS = [
    "<div>", "</div>", '<p class="x y">', '<a href="u?a=1&amp;b=2">', "text ",
    "&amp;", "&", "<", ">", '"', "'", "<br/>", "<script>", "</script>", "a<b ",
    "<img src=x>", "<!-- c -->", "<!doctype html>", "<?php ?>", "</p>", "<p>",
    '<a b = "c">', "<a b=c>", "<A HREF='q'>", "<em\xa0x=\"1\">", "<td>",
    "&#65;", "&#x41;", "</P >", "</p\t>", "</ p>", "</p x>", "<!",
    '<a b=="c">', "<p 1bad=2>", '<x-y z="1">', "<a\x0bb>", "&eacute;",
    "é", '<a b="c"d="e">', '<a  b \t= \n"c" >', "<a/>", "<a />", "<a/ >",
    "</td", "<ul><li>i</li></ul>", "\n", " ", '<span style="a:b;c:d">',
]


def test_fuzz_identical():
    rng = random.Random(20260818)
    for _ in range(1500):
        markup = "".join(
            rng.choice(FRAGMENTS) for _ in range(rng.randint(1, 12))
        )
        _assert_same(markup)


def test_corpus_identical(spark, sf_smoke_dir):
    from docling_graph_spark.sources.web_pages import synthesize_web_pages

    rows = (
        synthesize_web_pages(spark, sf_smoke_dir)
        .select("html").collect()
    )
    assert rows
    for r in rows:
        _assert_same(bytes(r.html).decode("utf-8", errors="replace"))


def test_extraction_reconstructs_known_page():
    body = "First paragraph.\n\nSecond & final <paragraph>."
    page = (
        "<!DOCTYPE html><html><head><script>nav&&track()</script></head>"
        "<body><nav class='menu'><a href='/'>Home</a></nav>"
        "<article><p>First paragraph.</p>"
        "<p>Second &amp; final &lt;paragraph&gt;.</p></article>"
        "<footer>© example</footer></body></html>"
    )
    res = extract_main_content(page)
    assert res.text == body
    assert [s.tag for s in res.spans] == ["p", "p"]


def _spec_candidates(markup: str):
    """The readable recursive spec: _prune + _measure + _score_containers."""
    root = _tree_stdlib(markup)
    hm._prune(root)
    cache = {}
    hm._measure(root, cache)
    out = []
    hm._score_containers(root, cache, out)
    return sorted((round(s, 6), o) for s, o, _ in out)


def _fused_candidates(markup: str):
    root = _tree_stdlib(markup)
    out = []
    hm._analyze(root, out)
    return sorted((round(s, 6), o) for s, o, _ in out)


def test_analyze_matches_recursive_spec(spark, sf_smoke_dir):
    from docling_graph_spark.sources.web_pages import synthesize_web_pages

    rows = (
        synthesize_web_pages(spark, sf_smoke_dir)
        .limit(200).select("html").collect()
    )
    for r in rows:
        m = bytes(r.html).decode("utf-8", errors="replace")
        assert _fused_candidates(m) == _spec_candidates(m)


def test_nesting_bomb_extracts_without_error():
    """A 50k-deep <div> chain (real crawls contain these) must extract the
    content, not blow the recursion limit into an error row."""
    depth = 50_000
    page = (
        "<body>" + "<div>" * depth
        + "<p>needle in the deep</p>"
        + "</div>" * depth + "</body>"
    )
    res = extract_main_content(page)
    assert res.text == "needle in the deep"
    assert [s.tag for s in res.spans] == ["p"]


def test_deep_inline_chain_in_block():
    depth = 20_000
    page = ("<div><p>" + "<em>" * depth + "core" + "</em>" * depth
            + "</p></div>")
    res = extract_main_content(page)
    assert res.text == "core"
