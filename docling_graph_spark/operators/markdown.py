"""Markdown writeback over crawl HTML (kernels/html_markdown.py lifted
to a corpus operator) — the reference renders every converted document
to markdown before chunking (docling ``export_to_markdown``; the repo's
chunk templates consume that shape).  This operator renders raw pages.

Scale shape: one Arrow-batched pandas UDF (the serializer is pure
Python over a stdlib DOM — the same cost class as the main-content
extraction UDF it runs beside), then a map-side-combinable per-lang
aggregate.  PDF payload rows are filtered out scan-side by magic-byte
prefix, before any Python runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def markdown_udf():
    import pandas as pd  # noqa: F401

    @F.pandas_udf("string")
    def md(s):
        from ..kernels.html_markdown import html_to_markdown

        return s.map(lambda b: None if b is None else html_to_markdown(b))

    return md


def markdown_stats(pages: DataFrame, lang_col: str = "lang",
                   html_col: str = "html") -> DataFrame:
    """Per-lang markdown-render rollup: page count, total markdown
    characters, and the md5-prefix checksum over every rendered document
    (gates the full serialized BYTES — headings, link syntax, GFM
    tables, list markers, paragraph separators)."""
    s = F.col(html_col).cast("string")
    html_rows = pages.filter(
        s.isNotNull() & ~s.startswith("%PDF")
    ).select(F.col(lang_col).alias("lang"),
             markdown_udf()(F.col(html_col)).alias("md"))
    md5 = F.md5(F.col("md").cast("binary"))
    return html_rows.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_md_docs"),
        F.sum(F.length("md")).cast("long").alias("md_chars"),
        F.sum(F.conv(F.substring(md5, 1, 12), 16, 10).cast("long"))
        .cast("long").alias("md_checksum"),
    )
