"""Per-page crawl metadata extraction: title, declared language, heading,
outlink count — one codegen'd regexp pass in the scan stage.

WET/WAT-style header fields every crawl-processing pipeline records next
to the extracted text (the reference extracts per-document metadata into
its graph nodes via LLM templates — `docling_graph/core/converters/
graph_converter.py` node attributes; this is the deterministic page-level
analogue over the `(url, html)` relation).

Scale: pure `pyspark.sql.functions` column expressions (CAST + three
regexp_extract + one regexp_extract_all), no Python row path, no shuffle
— the whole operator fuses into the scan's WholeStageCodegen span.
Non-HTML payloads (PDF bytes, images) simply match nothing and yield
empty strings / zero counts, so no type routing is needed upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .linkgraph import HREF_RE  # one anchor pattern: n_links must agree
                                # with the link graph / anchor oracles

TITLE_RE = "<title>([^<]*)</title>"
HTML_LANG_RE = '<html lang="([^"]+)"'
H1_RE = "<h1>([^<]*)</h1>"


def page_metadata(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html",
                  keep_cols: "tuple[str, ...]" = ()) -> DataFrame:
    """(url, html, ...) -> (url, *keep_cols, title, html_lang, h1,
    n_links).

    Fields are '' / 0 when absent — never NULL — so downstream
    aggregations need no null routing and match SQL oracles that use
    regexp_extract's empty-string no-match convention.  A NULL payload
    (failed fetch rows in real crawl tables) coalesces to the empty
    string up front, so the no-NULL contract holds for it too.
    ``keep_cols`` pass through projection-only (no join-back needed)."""
    s = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    return pages.select(
        F.col(url_col).alias("url"),
        *[F.col(c) for c in keep_cols],
        F.regexp_extract(s, TITLE_RE, 1).alias("title"),
        F.regexp_extract(s, HTML_LANG_RE, 1).alias("html_lang"),
        F.regexp_extract(s, H1_RE, 1).alias("h1"),
        F.size(F.expr(
            f"regexp_extract_all(coalesce(CAST({html_col} AS STRING), ''), "
            f"'{HREF_RE}', 1)"
        )).cast("long").alias("n_links"),
    )


def metadata_stats(pages: DataFrame, lang_col: str = "lang",
                   url_col: str = "url",
                   html_col: str = "html") -> DataFrame:
    """Per-declared-corpus-lang rollup: page counts, title coverage and
    volume, html-lang agreement with the corpus label, outlink totals."""
    meta = page_metadata(
        pages.withColumnRenamed(lang_col, "_lang"),
        url_col, html_col, keep_cols=("_lang",),
    )
    return (
        meta.groupBy(F.col("_lang").alias("lang"))
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.when(F.col("title") != "", 1).otherwise(0))
             .alias("n_with_title"),
            F.sum(F.length("title").cast("long")).alias("title_chars"),
            F.sum(F.when(F.col("html_lang") == F.col("_lang"), 1)
                  .otherwise(0)).alias("n_lang_match"),
            F.sum("n_links").alias("total_links"),
        )
        .orderBy("lang")
    )


# document-metadata head fields (the Trafilatura/Newspaper metadata set:
# publication date, author, canonical url) — group-1 extraction, empty
# string when absent, same no-NULL contract as page_metadata
PUBLISHED_RE = '<meta property="article:published_time" content="([^"]*)"'
AUTHOR_RE = '<meta name="author" content="([^"]*)"'
CANONICAL_RE = '<link rel="canonical" href="([^"]*)"'


def head_metadata(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html",
                  keep_cols: "tuple[str, ...]" = ()) -> DataFrame:
    """(url, html, ...) -> (url, *keep_cols, published, author,
    canonical): the document-metadata triple real extraction pipelines
    pull from page heads (publication date for freshness
    filtering/temporal splits, author for attribution, rel=canonical as
    the crawl-dedup consolidation signal).  One codegen'd regexp pass in
    the scan stage, like page_metadata."""
    s = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    return pages.select(
        F.col(url_col).alias("url"),
        *[F.col(c) for c in keep_cols],
        F.regexp_extract(s, PUBLISHED_RE, 1).alias("published"),
        F.regexp_extract(s, AUTHOR_RE, 1).alias("author"),
        F.regexp_extract(s, CANONICAL_RE, 1).alias("canonical"),
    )


def head_meta_stats(pages: DataFrame, lang_col: str = "lang",
                    url_col: str = "url",
                    html_col: str = "html") -> DataFrame:
    """Per-lang head-metadata rollup: publication-date coverage and
    byte-gating checksum (md5-prefix sum over the extracted date strings
    — proves the extracted BYTES, not just the count), distinct-author
    count, and canonical-link accounting (self vs consolidating).  Single
    map-side-combinable aggregation over the scan-stage extraction."""
    hm = head_metadata(
        pages.withColumnRenamed(lang_col, "_lang"),
        url_col, html_col, keep_cols=("_lang",),
    )
    pub_md5 = F.md5(F.col("published").cast("binary"))
    return (
        hm.groupBy(F.col("_lang").alias("lang"))
        .agg(
            F.sum((F.col("published") != "").cast("long"))
            .cast("long").alias("n_published"),
            F.sum(F.when(F.col("published") != "",
                         F.conv(F.substring(pub_md5, 1, 12), 16, 10)
                         .cast("long")).otherwise(F.lit(0)))
            .cast("long").alias("published_checksum"),
            F.countDistinct(F.when(F.col("author") != "",
                                   F.col("author")))
            .cast("long").alias("n_authors"),
            F.sum(((F.col("canonical") != "")
                   & (F.col("canonical") == F.col("url"))).cast("long"))
            .cast("long").alias("n_canonical_self"),
            F.sum(((F.col("canonical") != "")
                   & (F.col("canonical") != F.col("url"))).cast("long"))
            .cast("long").alias("n_canonical_other"),
        )
    )
