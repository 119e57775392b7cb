"""Synthetic Common-Crawl-style web_pages table, derived deterministically
from the driver's documents.parquet (TESTDATA.md) — no external data.

Per FIXTURES.md §1 / BASELINE.json input_hint the table has columns
``(url string, warc_ts timestamp, html binary, text string, lang string)``:

* ``url`` — power-law host distribution (40% of rows land on 7 hot hosts,
  the rest spread over 211) to exercise salted-repartition skew handling;
* ``html`` — the document text wrapped in deterministic boilerplate
  (header/nav/aside/footer with high link density) with the main content in
  ``<article><p>...`` blocks, HTML-escaped; every ~50th row instead carries a
  ``%PDF``-magic binary payload to exercise the binary routing branch;
* ``text`` — ground truth: the byte-parity oracle for extracted text.

Everything is a pure column expression (JVM-side, no UDF) so the same table
is reproducible in DuckDB SQL for the correctness oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --- deterministic host skew: doc_id % 5 < 2 -> one of 7 hot hosts
HOT_HOSTS = 7
COLD_HOSTS = 211
PDF_EVERY = 50  # doc_id % PDF_EVERY == PDF_EVERY-1 -> fake-PDF payload row


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _estimated_scan_partitions(path: str,
                               max_partition_bytes: int = 128 << 20) -> int:
    """Estimate how many input splits a parquet scan of ``path`` yields,
    from local file sizes (split size = spark.sql.files.maxPartitionBytes,
    128m session default).  Avoids ``df.rdd.getNumPartitions()``, which costs
    seconds of driver-side plan->RDD conversion.  Non-local / unreadable
    paths return a huge value, i.e. "assume parallel enough" — callers can
    force with min_partitions."""
    import os

    try:
        if os.path.isfile(path):
            sizes = [os.path.getsize(path)]
        else:
            sizes = [
                e.stat().st_size for e in os.scandir(path)
                if e.is_file() and not e.name.startswith(("_", "."))
            ]
        if not sizes:
            return 1 << 30
        return sum(max(1, -(-s // max_partition_bytes)) for s in sizes)
    except OSError:
        return 1 << 30


def host_id_expr(doc_id):
    return F.when(doc_id % 5 < 2, doc_id % HOT_HOSTS).otherwise(
        HOT_HOSTS + doc_id % COLD_HOSTS
    )


def url_expr(doc_id):
    return F.concat(
        F.lit("https://host"),
        host_id_expr(doc_id).cast("string"),
        F.lit(".example.com/doc/"),
        doc_id.cast("string"),
    )


def _escape_html(col):
    # minimal standard HTML escaping (order matters: & first)
    col = F.replace(col, F.lit("&"), F.lit("&amp;"))
    col = F.replace(col, F.lit("<"), F.lit("&lt;"))
    col = F.replace(col, F.lit(">"), F.lit("&gt;"))
    return col


def aside_tables_expr(doc_id):
    """Deterministic `<table>` markup for the ``with_tables`` corpus variant
    (sources/web_pages.py twin: queries._ASIDE_TABLES_SQL).

    Two WDC-style table populations, both INSIDE the boilerplate-classed
    sidebar so main-content extraction byte-parity is untouched (`td`/`th`
    are BLOCK_TAGS and `table` a scored container in kernels/html_main.py —
    a content-positioned data table could outscore a short document's
    article and break the extracted-text invariant):

    * a layout/navigation table (every 3rd doc): one row, two link cells —
      the "table used for page layout" class every web-table miner filters;
    * a relational data table (6 of every 7 docs): `<th>` header row +
      1..4 data rows of (metric, integer value, unit) cells.
    """
    layout = F.when(
        doc_id % 3 == 0,
        F.lit('<table class="nav"><tr><td><a href="/l1">One</a></td>'
              '<td><a href="/l2">Two</a></td></tr></table>'),
    ).otherwise(F.lit(""))
    row = (
        lambda i: F.concat(
            F.lit("<tr><td>m"), ((doc_id + i) % 10).cast("string"),
            F.lit("</td><td>"), ((doc_id * 17 + i * 3) % 1000).cast("string"),
            F.lit("</td><td>u"), ((doc_id + i) % 5).cast("string"),
            F.lit("</td></tr>"),
        )
    )
    data = F.when(
        doc_id % 7 != 6,
        F.concat(
            F.lit('<table id="stats"><tr><th>metric</th><th>value</th>'
                  "<th>unit</th></tr>"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0).cast("long"), doc_id % 4), row
                ),
                "",
            ),
            F.lit("</table>"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(layout, data)


def head_meta_expr(doc_id):
    """Deterministic document-metadata head markup for the rich corpus
    variant (queries._HEAD_META_SQL twin) — the three fields a
    Trafilatura-style metadata extractor pulls from real pages:

    * ``article:published_time`` (6 of 7 docs): date derived from doc_id
      (year 2020+id%5, month 1+id%12, day 1+id%28), ISO-8601 Zulu;
    * ``author`` meta (2 of 3 docs): 23 distinct author names;
    * ``rel=canonical`` link (every HTML doc): self-referential except
      doc_id % 11 == 7, which declares the PREVIOUS doc canonical — the
      duplicate-consolidation signal crawl dedup folds.

    Head-only markup: main-content extraction byte-parity is untouched.
    """
    y = (doc_id % 5 + 2020).cast("string")
    m = F.lpad((doc_id % 12 + 1).cast("string"), 2, "0")
    dd = F.lpad((doc_id % 28 + 1).cast("string"), 2, "0")
    pub = F.when(
        doc_id % 7 != 2,
        F.concat(F.lit('<meta property="article:published_time" '
                       'content="'),
                 y, F.lit("-"), m, F.lit("-"), dd,
                 F.lit('T00:00:00Z">')),
    ).otherwise(F.lit(""))
    auth = F.when(
        doc_id % 3 != 1,
        F.concat(F.lit('<meta name="author" content="Author '),
                 (doc_id % 23).cast("string"), F.lit('">')),
    ).otherwise(F.lit(""))
    canon_id = F.when((doc_id % 11 == 7) & (doc_id >= 1), doc_id - 1) \
        .otherwise(doc_id)
    canon = F.concat(F.lit('<link rel="canonical" href="'),
                     url_expr(canon_id), F.lit('">'))
    return F.concat(pub, auth, canon)


def ld_json_expr(doc_id):
    """Deterministic schema.org JSON-LD block for the ``with_ld_json``
    corpus variant (queries._LD_JSON_SQL twin) — the structured-data
    markup a WAT-style miner extracts from real pages:

    * Article (doc_id % 4 == 0) / NewsArticle (% 4 == 2): headline +
      integer ``wordCount`` (100 + doc_id % 900);
    * Product (% 4 == 1): name + NESTED ``offers.price`` decimal string
      (exercises real JSON path extraction, not just flat regexps);
    * no block for doc_id % 4 == 3 — the coverage gap every miner must
      count correctly.

    Head-only markup: main-content extraction byte-parity is untouched.
    """
    n = doc_id.cast("string")
    article = F.concat(
        F.lit('{"@context":"https://schema.org","@type":"'),
        F.when(doc_id % 4 == 0, F.lit("Article")).otherwise(
            F.lit("NewsArticle")),
        F.lit('","headline":"doc '), n,
        F.lit('","wordCount":'), (doc_id % 900 + 100).cast("string"),
        F.lit("}"),
    )
    product = F.concat(
        F.lit('{"@context":"https://schema.org","@type":"Product",'
              '"name":"doc '), n,
        F.lit('","offers":{"@type":"Offer","price":"'),
        (doc_id % 500 + 1).cast("string"),
        F.lit("."), F.lpad((doc_id % 100).cast("string"), 2, "0"),
        F.lit('","priceCurrency":"USD"}}'),
    )
    body = F.when(doc_id % 4 == 1, product).when(
        doc_id % 4 != 3, article).otherwise(F.lit(None))
    return F.when(
        body.isNotNull(),
        F.concat(F.lit('<script type="application/ld+json">'), body,
                 F.lit("</script>")),
    ).otherwise(F.lit(""))


def html_page_expr(doc_id, text, lang, with_tables: bool = False,
                   with_head_meta: bool = False,
                   with_ld_json: bool = False):
    """Deterministic page: boilerplate chrome wrapping the escaped text.

    Paragraph structure: the generator splits text on blank lines into <p>
    blocks; the extractor joins block texts with blank lines — an exact
    round-trip.  Splitting is done with a single replace of the separator by
    the paragraph-break markup, keeping the whole expression JVM-side.

    ``with_tables`` appends the deterministic web-table markup inside the
    sidebar aside (see aside_tables_expr) — opt-in so every oracle over the
    default corpus is byte-identical to round 1.  ``with_head_meta``
    likewise appends document-metadata markup (published_time/author/
    canonical, see head_meta_expr) after the title — head-only, so text
    extraction is unaffected.
    """
    body = _escape_html(text)
    body = F.replace(body, F.lit("\n\n"), F.lit("</p><p>"))
    nav_n = (doc_id % 10).cast("string")
    aside_extra = (
        aside_tables_expr(doc_id) if with_tables else F.lit("")
    )
    head_extra = head_meta_expr(doc_id) if with_head_meta else F.lit("")
    ld_extra = ld_json_expr(doc_id) if with_ld_json else F.lit("")
    return F.concat(
        F.lit("<!DOCTYPE html><html lang=\""), lang, F.lit("\"><head>"),
        F.lit("<title>doc "), doc_id.cast("string"), F.lit("</title>"),
        head_extra,
        ld_extra,
        F.lit("<script>var t=1;</script><style>p{margin:0}</style></head><body>"),
        F.lit("<header><h1>Site host"), host_id_expr(doc_id).cast("string"),
        F.lit("</h1><nav><a href=\"/\">Home</a> <a href=\"/a"), nav_n,
        F.lit("\">Section "), nav_n, F.lit("</a> <a href=\"/about\">About</a>"
              " <a href=\"/contact\">Contact</a></nav></header>"),
        F.lit("<aside class=\"sidebar\"><a href=\"/x\">Trending</a>"
              " <a href=\"/y\">Popular</a> <a href=\"/z\">Latest</a>"),
        aside_extra,
        F.lit("</aside>"),
        F.lit("<div id=\"content\"><article><p>"), body, F.lit("</p></article></div>"),
        F.lit("<footer><a href=\"/terms\">Terms</a> <a href=\"/privacy\">Privacy</a>"
              # two deterministic CROSS-HOST outlinks (absolute URLs) so the
              # corpus carries a real host-level link graph: one
              # popularity-skewed link into the hot hosts (inlinks
              # concentrate, like real crawls) and one long-tail link.
              # Boilerplate-positioned (footer), so main-content extraction
              # byte-parity is unaffected; the SQL twin is
              # queries._HTML_PAGE_SQL.
              " <a href=\"https://host"), (doc_id % HOT_HOSTS).cast("string"),
        F.lit(".example.com/\">Top</a> <a href=\"https://host"),
        ((doc_id * 13 + 5) % (HOT_HOSTS + COLD_HOSTS)).cast("string"),
        F.lit(".example.com/doc/"), ((doc_id * 31 + 11) % 997).cast("string"),
        F.lit("\">Related</a> <p>© 2024 host"),
        host_id_expr(doc_id).cast("string"),
        F.lit(".example.com</p></footer></body></html>"),
    )


def synthesize_web_pages(spark: SparkSession, sf_dir: str,
                         with_pdf_rows: bool = True,
                         min_partitions: int = 0,
                         fatten_to_bytes: int = 0,
                         with_tables: bool = False,
                         with_head_meta: bool = False,
                         with_ld_json: bool = False) -> DataFrame:
    """documents.parquet -> (url, warc_ts, html binary, text, lang).

    The source parquet is a single small file (one scan split), while the
    payload-construction expressions multiply bytes ~4×: repartition the
    narrow source rows FIRST so the expensive concat/encode runs in parallel
    — shuffling after the projection would both serialize the build on one
    task and move 4× the bytes.  Default: the session's defaultParallelism.
    """
    docs = load_documents(spark, sf_dir)
    target = min_partitions or spark.sparkContext.defaultParallelism
    if _estimated_scan_partitions(f"{sf_dir}/documents.parquet") < target:
        docs = docs.repartition(target, F.col("doc_id"))
    if fatten_to_bytes > 0:
        # Realistic-page-size mode: the driver corpus averages <1 KB of text
        # per document while real crawl pages run 50-100 KB.  Repeat each
        # document's text (blank-line separated, i.e. extra <p> blocks after
        # html_page_expr's split) until the body reaches ~fatten_to_bytes.
        # Pure column expression; the `text` ground-truth column goes through
        # the SAME transform, so the byte-parity invariant (extracted text ==
        # text per url) still holds exactly.
        k = F.when(
            F.length(F.trim(F.col("text"))) == 0, F.lit(1)
        ).otherwise(
            F.greatest(
                F.lit(1),
                F.ceil(F.lit(fatten_to_bytes)
                       / (F.length(F.col("text").cast("binary")) + F.lit(2))),
            )
        ).cast("int")
        docs = docs.withColumn(
            "text", F.array_join(F.array_repeat(F.col("text"), k), "\n\n")
        )
    d = F.col("doc_id")
    html_str = html_page_expr(d, F.col("text"), F.col("lang"),
                              with_tables=with_tables,
                              with_head_meta=with_head_meta,
                              with_ld_json=with_ld_json)
    if with_pdf_rows:
        from ..kernels.pdf_stub import make_fake_pdf  # noqa: F401 (docs)
        # fake-PDF payload built with the same byte layout as
        # kernels.pdf_stub.make_fake_pdf, as a pure column expression
        body_len = F.length(F.col("text").cast("binary"))
        pdf_str = F.concat(
            F.lit("%PDF-1.4\n%dgspark synthetic single-stream document\n"
                  "1 0 obj\n<< /Type /DGText /Length "),
            body_len.cast("string"),
            F.lit(" >>\nstream\n"),
            F.col("text"),
            F.lit("\nendstream\nendobj\ntrailer\n%%EOF\n"),
        )
        payload = F.when(d % PDF_EVERY == PDF_EVERY - 1, pdf_str).otherwise(html_str)
    else:
        payload = html_str
    out = docs.select(
        url_expr(d).alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=d.cast("double"))).alias("warc_ts"),
        F.encode(payload, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    # parallelism is guaranteed above; tag the DF so downstream
    # ensure_parallel_input skips its (driver-expensive) .rdd partition probe
    out._dgspark_parallel_ok = True
    return out


# DuckDB-SQL equivalents of the derivation, for oracle queries that need to
# reconstruct url/host from doc_id.
URL_SQL = ("concat('https://host', CAST(CASE WHEN doc_id % 5 < 2 THEN doc_id % 7 "
           "ELSE 7 + doc_id % 211 END AS VARCHAR), '.example.com/doc/', "
           "CAST(doc_id AS VARCHAR))")
HOST_SQL = ("concat('host', CAST(CASE WHEN doc_id % 5 < 2 THEN doc_id % 7 "
            "ELSE 7 + doc_id % 211 END AS VARCHAR), '.example.com')")
