"""HTML -> Markdown serializer (kernels/html_markdown.py)."""

from __future__ import annotations

from docling_graph_spark.kernels.html_markdown import html_to_markdown


def test_headings_and_paragraphs():
    md = html_to_markdown(
        "<h1>Top</h1><h2>Sub</h2><h6>Deep</h6><p>body text</p>")
    assert md == "# Top\n\n## Sub\n\n###### Deep\n\nbody text"


def test_head_and_machinery_dropped():
    md = html_to_markdown(
        "<html><head><title>t</title><script>x=1;</script>"
        '<style>p{}</style><script type="application/ld+json">{"a":1}'
        "</script></head><body><p>kept</p><script>y</script></body></html>")
    assert md == "kept"


def test_inline_formats():
    md = html_to_markdown(
        '<p>a <b>bold</b> <em>it</em> <code>c()</code> '
        '<a href="/x">link</a> <img src="i.png" alt="pic"> end</p>')
    assert md == "a **bold** *it* `c()` [link](/x) ![pic](i.png) end"


def test_lists():
    md = html_to_markdown(
        "<ul><li>first</li><li>second</li></ul>"
        "<ol><li>one</li><li>two</li></ol>")
    assert md == "- first\n- second\n\n1. one\n2. two"


def test_table_first_row_is_header():
    md = html_to_markdown(
        "<table><thead><tr><th>a</th><th>b</th></tr></thead>"
        "<tbody><tr><td>1</td><td>2</td></tr></tbody></table>")
    assert md == "| a | b |\n| --- | --- |\n| 1 | 2 |"
    # headerless layout table: first row still becomes the header
    md2 = html_to_markdown(
        "<table><tr><td>x</td><td>y</td></tr></table>")
    assert md2 == "| x | y |\n| --- | --- |"


def test_blockquote_and_pre():
    md = html_to_markdown("<blockquote>l1\nl2</blockquote><pre>raw</pre>")
    assert md == "> l1\n> l2\n\n```\nraw\n```"


def test_empty_p_preserves_separators():
    # '<p>a</p><p></p><p>b</p>' must round-trip a\n\n\n\nb
    md = html_to_markdown("<p>a</p><p></p><p>b</p>")
    assert md == "a\n\n\n\nb"


def test_loose_inline_flushes_as_paragraph():
    md = html_to_markdown(
        '<div><a href="/a">A</a> <a href="/b">B</a><p>block</p></div>')
    assert md == "[A](/a) [B](/b)\n\nblock"


def test_entities_decoded_and_bad_nesting_tolerated():
    md = html_to_markdown("<p>x &amp; y &lt;z&gt;</p><b>stray")
    assert md.startswith("x & y <z>")


def test_bytes_input_charset_sniffed():
    md = html_to_markdown("<p>café</p>".encode("utf-8"))
    assert md == "café"
