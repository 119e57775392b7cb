"""Query catalog: every implemented operator exposed as a (spark_fn, oracle)
pair for the driver's correctness gate (__spark_entry__.py).

Each entry runs the REAL Spark operators (full extraction pipeline where
relevant) and, where the semantics are ANSI-SQL-expressible, ships an
equivalent DuckDB SQL over the same parquet tables.  Column names/aliases are
identical on both sides (the driver hash-compares after sorting columns by
name).  Float-valued aggregates are avoided in oracle-checked queries
(order-dependent double summation is not bit-stable across engines);
money/quantity sums use integer cents.

Flagship pipeline queries run the documents corpus through
synthesize_web_pages → extract → chunk → mention → graph; their oracles
re-derive the result from first principles (the corpus is delimiter-free, so
the reference greedy chunker degenerates to fixed-width slices — verified by
the kernel parity tests; the oracle exploits that closed form).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators import entities as op_entities
from .operators import graph as op_graph
from .operators import stats as op_stats
from .pipeline import PipelineConfig, PipelineResult, run_on_testdata

MAX_TOKENS = 25          # 100-char chunks on the test corpus
BATCH_CONTEXT = 1200     # available=200 -> 2 chunks per batch (cost<=90 each)

# --------------------------------------------------------------------------
# cached pipeline run per sf_dir (queries share the lazy plans + persisted
# extraction so the driver's per-query invocations don't re-extract)

_CACHE: Dict[Tuple[str, str], PipelineResult] = {}


def _pipeline(spark: SparkSession, sf_dir: str) -> PipelineResult:
    key = (sf_dir, "std")
    if key not in _CACHE:
        cfg = PipelineConfig(max_tokens=MAX_TOKENS, id_mode="xxhash64")
        res = run_on_testdata(spark, sf_dir, cfg)
        res.extracted.persist()
        res.chunks.persist()
        _CACHE[key] = res
    return _CACHE[key]


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# --------------------------------------------------------------------------
# shared oracle SQL fragments

_HOST_ID = "CASE WHEN doc_id % 5 < 2 THEN doc_id % 7 ELSE 7 + doc_id % 211 END"
_URL = ("concat('https://host', CAST(" + _HOST_ID + " AS VARCHAR), "
        "'.example.com/doc/', CAST(doc_id AS VARCHAR))")

# fixed-width chunk slices (delimiter-free corpus, max_chars=100)
_CHUNKS_CTE = f"""
chunks AS (
  SELECT d.doc_id, d.lang, {_URL} AS url, i AS chunk_id,
         substr(d.text, CAST(i*100 + 1 AS BIGINT), 100) AS raw
  FROM documents d,
       LATERAL (SELECT unnest(generate_series(0,
                CAST(ceil(length(d.text)/100.0) AS BIGINT) - 1)) AS i)
)
"""

_MENTIONS_CTE = _CHUNKS_CTE + """,
mentions AS (
  SELECT doc_id, lang, url, chunk_id,
         unnest(regexp_extract_all(lower(trim(raw)), '[a-z]{5,}')) AS term
  FROM chunks
)
"""

# exact reconstruction of the synthetic page payload (sources/web_pages.py)
_PAYLOAD_BYTES = f"""
CASE WHEN doc_id % 50 = 49 THEN strlen(
  '%PDF-1.4' || chr(10) || '%dgspark synthetic single-stream document'
  || chr(10) || '1 0 obj' || chr(10) || '<< /Type /DGText /Length '
  || CAST(strlen(text) AS VARCHAR) || ' >>' || chr(10) || 'stream'
  || chr(10) || text || chr(10) || 'endstream' || chr(10) || 'endobj'
  || chr(10) || 'trailer' || chr(10) || '%%EOF' || chr(10))
ELSE strlen(
  '<!DOCTYPE html><html lang="' || lang || '"><head>'
  || '<title>doc ' || CAST(doc_id AS VARCHAR) || '</title>'
  || '<script>var t=1;</script><style>p{{margin:0}}</style></head><body>'
  || '<header><h1>Site host' || CAST({_HOST_ID} AS VARCHAR)
  || '</h1><nav><a href="/">Home</a> <a href="/a' || CAST(doc_id % 10 AS VARCHAR)
  || '">Section ' || CAST(doc_id % 10 AS VARCHAR)
  || '</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav></header>'
  || '<aside class="sidebar"><a href="/x">Trending</a> <a href="/y">Popular</a> <a href="/z">Latest</a></aside>'
  || '<div id="content"><article><p>'
  || replace(replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), chr(10)||chr(10), '</p><p>')
  || '</p></article></div>'
  || '<footer><a href="/terms">Terms</a> <a href="/privacy">Privacy</a> <p>© 2024 host'
  || CAST({_HOST_ID} AS VARCHAR) || '.example.com</p></footer></body></html>')
END
""".replace("{{", "{").replace("}}", "}")


# --------------------------------------------------------------------------
# pipeline-backed queries


def q_doc_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extraction byte-identity at aggregate level: per-lang doc counts and
    total extracted characters must equal the source-text totals."""
    res = _pipeline(spark, sf_dir)
    return res.extracted.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
    ).orderBy("lang")


SQL_DOC_STATS = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def q_chunk_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 chunking: docs per chunk-count bucket."""
    res = _pipeline(spark, sf_dir)
    per_doc = res.chunks.groupBy("url").agg(F.count("*").alias("n_chunks"))
    return per_doc.groupBy("n_chunks").agg(
        F.count("*").alias("n_docs")
    ).orderBy("n_chunks")


SQL_CHUNK_DISTRIBUTION = """
SELECT CAST(ceil(length(text)/100.0) AS BIGINT) AS n_chunks,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1 ORDER BY 1
"""


def q_chunk_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chunk relation itself: ids, span offsets and text per chunk."""
    res = _pipeline(spark, sf_dir)
    return res.chunks.select(
        "url",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "start", "end", "text",
    ).orderBy("url", "chunk_id")


SQL_CHUNK_ROWS = f"""
WITH {_CHUNKS_CTE}
SELECT url, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(chunk_id*100 + (length(raw) - length(ltrim(raw))) AS BIGINT) AS start,
       CAST(chunk_id*100 + (length(raw) - length(ltrim(raw)))
            + length(trim(raw)) AS BIGINT) AS "end",
       trim(raw) AS text
FROM chunks ORDER BY url, chunk_id
"""


def q_batch_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+W2 greedy pack + undersized merge with a 1200-token context:
    available=200, per-chunk cost<=90 -> exactly 2 chunks per batch."""
    from .operators import chunk as op_chunk

    res = _pipeline(spark, sf_dir)
    # re-chunk with the small context (chunk boundaries identical)
    chunks = op_chunk.chunk_documents(
        res.extracted, MAX_TOKENS, BATCH_CONTEXT, 0.85
    )
    per_doc = chunks.groupBy("url").agg(
        (F.max("batch_id") + 1).cast("long").alias("n_batches")
    )
    return per_doc.groupBy("n_batches").agg(
        F.count("*").alias("n_docs")
    ).orderBy("n_batches")


SQL_BATCH_COUNTS = """
SELECT CAST(ceil(ceil(length(text)/100.0)/2.0) AS BIGINT) AS n_batches,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1 ORDER BY 1
"""


def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mention extraction: top-50 terms by total mentions."""
    res = _pipeline(spark, sf_dir)
    return (
        res.doc_mentions.filter(F.col("kind") == "term")
        .groupBy("term")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_mentions").alias("total_mentions"),
        )
        .orderBy(F.desc("total_mentions"), "term")
        .limit(50)
    )


SQL_TOP_TERMS = f"""
WITH {_MENTIONS_CTE}
SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS total_mentions
FROM mentions GROUP BY term
ORDER BY total_mentions DESC, term LIMIT 50
"""


def q_graph_node_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph assembly + cleanup: nodes per label."""
    res = _pipeline(spark, sf_dir)
    return res.nodes.groupBy("label").agg(
        F.count("*").alias("n")
    ).orderBy("label")


SQL_GRAPH_NODE_COUNTS = f"""
WITH {_MENTIONS_CTE}
SELECT * FROM (
  SELECT 'WebDocument' AS label, CAST(count(*) AS BIGINT) AS n FROM documents
  UNION ALL
  SELECT 'Chunk', CAST(sum(CAST(ceil(length(text)/100.0) AS BIGINT)) AS BIGINT)
  FROM documents
  UNION ALL
  SELECT 'Term', CAST(count(DISTINCT term) AS BIGINT) FROM mentions
) ORDER BY label
"""


def q_graph_edge_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph edges per label (has_chunk + mentions, post-cleanup)."""
    res = _pipeline(spark, sf_dir)
    return res.edges.groupBy("label").agg(
        F.count("*").alias("n")
    ).orderBy("label")


SQL_GRAPH_EDGE_COUNTS = f"""
WITH {_MENTIONS_CTE}
SELECT * FROM (
  SELECT 'has_chunk' AS label,
         CAST(sum(CAST(ceil(length(text)/100.0) AS BIGINT)) AS BIGINT) AS n
  FROM documents
  UNION ALL
  SELECT 'mentions', CAST(count(*) AS BIGINT) FROM (
    SELECT DISTINCT doc_id, term FROM mentions
  )
) ORDER BY label
"""


def q_doc_degree_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree analytics over the graph: top-20 documents by degree
    (n_chunks + n distinct terms)."""
    res = _pipeline(spark, sf_dir)
    degrees = op_stats.degree_distribution(res.edges)
    docs = res.nodes.filter(F.col("label") == "WebDocument").select(
        "id", F.col("properties")["url"].alias("url")
    )
    return (
        docs.join(degrees, "id")
        .select("url", "degree")
        .orderBy(F.desc("degree"), "url")
        .limit(20)
    )


SQL_DOC_DEGREE_TOPK = f"""
WITH {_MENTIONS_CTE},
deg AS (
  SELECT m.url,
         CAST(count(DISTINCT m.term)
              + any_value(CAST(ceil(length(d.text)/100.0) AS BIGINT))
              AS BIGINT) AS degree
  FROM mentions m JOIN documents d ON m.doc_id = d.doc_id
  GROUP BY m.url
)
SELECT url, degree FROM deg ORDER BY degree DESC, url LIMIT 20
"""


def q_bytes_stripped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule lineage metric: per-lang boilerplate bytes stripped by the
    main-content extractor (html chrome + pdf container overhead)."""
    res = _pipeline(spark, sf_dir)
    return res.extracted.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("bytes_stripped").alias("stripped"),
    ).orderBy("lang")


SQL_BYTES_STRIPPED = f"""
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(({_PAYLOAD_BYTES}) - strlen(text)) AS BIGINT) AS stripped
FROM documents GROUP BY lang ORDER BY lang
"""


def q_extraction_metrics_by_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: per-partition (url host) extraction metrics."""
    res = _pipeline(spark, sf_dir)
    return res.metrics.select(
        "partition_key", "docs_parsed", "bytes_stripped", "errors"
    ).orderBy("partition_key")


SQL_EXTRACTION_METRICS = f"""
SELECT concat('host', CAST({_HOST_ID} AS VARCHAR), '.example.com') AS partition_key,
       CAST(count(*) AS BIGINT) AS docs_parsed,
       CAST(sum(({_PAYLOAD_BYTES}) - strlen(text)) AS BIGINT) AS bytes_stripped,
       CAST(0 AS BIGINT) AS errors
FROM documents GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# relational operator coverage on the TPC-H-ish tables (SURVEY §2.3-2.7)


def q_lineitem_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-class aggregation (TPC-H Q1 shape), integer-cents sums."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .alias("sum_base_cents"),
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("long")
            ).alias("sum_disc_cents"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_LINEITEM_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_orders_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast equi-joins customer⋈nation (dims) with orders (fact)."""
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("total_cents"),
        )
        .orderBy("n_name")
    )


SQL_ORDERS_PER_NATION = """
SELECT n_name, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


def q_orders_no_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (J1 validation shape)."""
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey").distinct()
    missing = orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
    return missing.agg(F.count("*").alias("n_orders_without_items"))


SQL_ORDERS_NO_LINEITEM = """
SELECT CAST(count(*) AS BIGINT) AS n_orders_without_items
FROM orders WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
"""


def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 ranking window: top-3 orders per customer by price."""
    orders = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", F.col("rnk").cast("long").alias("rnk"), "o_orderkey")
        .orderBy("o_custkey", "rnk")
    )


SQL_TOP_ORDERS_PER_CUSTOMER = """
SELECT o_custkey, CAST(rnk AS BIGINT) AS rnk, o_orderkey FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders
) WHERE rnk <= 3 ORDER BY o_custkey, rnk
"""


def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag window (30-min inactivity gap)."""
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts"))
    gap = F.when(epoch - F.lag(epoch).over(w) > 1800, 1).otherwise(0)
    sessions = ev.withColumn("new_session", gap).groupBy("user_id").agg(
        (F.sum("new_session") + 1).alias("n_sessions"),
        F.count("*").alias("n_events"),
    )
    return sessions.orderBy("user_id")


SQL_EVENT_SESSIONS = """
SELECT user_id,
       CAST(sum(new_session) + 1 AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_events
FROM (
  SELECT user_id,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
              (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
) GROUP BY user_id ORDER BY user_id
"""


# --------------------------------------------------------------------------
# text-analysis operators over documents


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex), per source."""
    docs = _read(spark, sf_dir, "documents")
    ws = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0))
    bpe = F.size(
        F.regexp_extract_all(
            F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"), 0
        )
    )
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(ws.cast("long")).alias("ws_tokens"),
        F.sum(bpe.cast("long")).alias("bpe_tokens"),
    ).orderBy("source")


SQL_TOKEN_STATS = r"""
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(regexp_extract_all(text, '\S+'))) AS BIGINT) AS ws_tokens,
       CAST(sum(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]'))) AS BIGINT) AS bpe_tokens
FROM documents GROUP BY source ORDER BY source
"""


def q_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring signals per lang (integer components)."""
    docs = _read(spark, sf_dir, "documents")
    alpha = F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(F.col("text"), r"[^.,;:!?]", ""))
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text").cast("long")).alias("sum_chars"),
        F.sum(alpha.cast("long")).alias("sum_alpha"),
        F.sum(punct.cast("long")).alias("sum_punct"),
    ).orderBy("lang")


SQL_QUALITY_SIGNALS = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS sum_chars,
       CAST(sum(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))) AS BIGINT) AS sum_alpha,
       CAST(sum(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))) AS BIGINT) AS sum_punct
FROM documents GROUP BY lang ORDER BY lang
"""


def q_langid_votes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID (n-gram heuristic family), claimed vs
    detected distribution."""
    docs = _read(spark, sf_dir, "documents")

    def votes(words: str):
        return F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(rf"\b(?:{words})\b"), 0)
        )

    en = votes("the|and|of|to|in|is")
    es = votes("el|la|los|de|que|y")
    de = votes("der|die|das|und|ist")
    detected = (
        F.when((en >= es) & (en >= de) & (en > 0), "en")
        .when((es >= de) & (es > 0), "es")
        .when(de > 0, "de")
        .otherwise("und")
    )
    return docs.select(F.col("lang"), detected.alias("detected")).groupBy(
        "lang", "detected"
    ).agg(F.count("*").alias("n")).orderBy("lang", "detected")


SQL_LANGID_VOTES = r"""
WITH scored AS (
  SELECT lang,
    length(regexp_extract_all(lower(text), '\b(?:the|and|of|to|in|is)\b')) AS en,
    length(regexp_extract_all(lower(text), '\b(?:el|la|los|de|que|y)\b')) AS es,
    length(regexp_extract_all(lower(text), '\b(?:der|die|das|und|ist)\b')) AS de
  FROM documents
)
SELECT lang,
  CASE WHEN en >= es AND en >= de AND en > 0 THEN 'en'
       WHEN es >= de AND es > 0 THEN 'es'
       WHEN de > 0 THEN 'de' ELSE 'und' END AS detected,
  CAST(count(*) AS BIGINT) AS n
FROM scored GROUP BY 1, 2 ORDER BY lang, detected
"""


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: distinct-text counts per lang (hash-groupBy shape)."""
    docs = _read(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("text").alias("n_distinct_texts"),
    ).orderBy("lang")


SQL_EXACT_DEDUP = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts
FROM documents GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
# embeddings: similarity search


def q_embedding_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbours for the first 8 vectors.
    JVM-side dot products via zip_with/aggregate; rank-only output (float
    similarity values are not hash-stable across engines)."""
    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    pairs = queries.join(F.broadcast(emb), F.col("vec_id") != F.col("query_id"))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    sim = dot(F.col("q"), F.col("embedding")) / (
        F.sqrt(dot(F.col("q"), F.col("q")))
        * F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        pairs.select("query_id", F.col("vec_id").alias("neighbor_id"),
                     sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", F.col("rank").cast("long").alias("rank"),
                "neighbor_id")
        .orderBy("query_id", "rank")
    )


SQL_EMBEDDING_KNN = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q, embeddings e WHERE e.vec_id <> q.query_id
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM pairs
) WHERE rank <= 5 ORDER BY query_id, rank
"""


# --------------------------------------------------------------------------
# registry


def catalog() -> Dict[str, Tuple[Callable[[SparkSession, str], DataFrame],
                                 Optional[str]]]:
    """name -> (spark function, oracle SQL or None for rows-only checks)."""
    return {
        # pipeline
        "doc_stats_by_lang": (q_doc_stats_by_lang, SQL_DOC_STATS),
        "chunk_distribution": (q_chunk_distribution, SQL_CHUNK_DISTRIBUTION),
        "chunk_rows": (q_chunk_rows, SQL_CHUNK_ROWS),
        "batch_counts": (q_batch_counts, SQL_BATCH_COUNTS),
        "top_terms": (q_top_terms, SQL_TOP_TERMS),
        "graph_node_counts": (q_graph_node_counts, SQL_GRAPH_NODE_COUNTS),
        "graph_edge_counts": (q_graph_edge_counts, SQL_GRAPH_EDGE_COUNTS),
        "doc_degree_topk": (q_doc_degree_topk, SQL_DOC_DEGREE_TOPK),
        "bytes_stripped": (q_bytes_stripped, SQL_BYTES_STRIPPED),
        "extraction_metrics_by_host": (q_extraction_metrics_by_host,
                                       SQL_EXTRACTION_METRICS),
        # relational coverage
        "lineitem_pricing": (q_lineitem_pricing, SQL_LINEITEM_PRICING),
        "orders_per_nation": (q_orders_per_nation, SQL_ORDERS_PER_NATION),
        "orders_no_lineitem": (q_orders_no_lineitem, SQL_ORDERS_NO_LINEITEM),
        "top_orders_per_customer": (q_top_orders_per_customer,
                                    SQL_TOP_ORDERS_PER_CUSTOMER),
        "event_sessions": (q_event_sessions, SQL_EVENT_SESSIONS),
        # text analysis
        "token_stats": (q_token_stats, SQL_TOKEN_STATS),
        "quality_signals": (q_quality_signals, SQL_QUALITY_SIGNALS),
        "langid_votes": (q_langid_votes, SQL_LANGID_VOTES),
        "exact_dedup": (q_exact_dedup, SQL_EXACT_DEDUP),
        # similarity
        "embedding_knn": (q_embedding_knn, SQL_EMBEDDING_KNN),
    }
