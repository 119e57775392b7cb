"""Inverted-index (postings) construction over the extracted corpus.

The search-index export every retrieval-training pipeline needs: BM25
baselines, negative mining, and corpus analytics all start from
term -> sorted-doc-id posting lists.  At crawl scale the naive
``groupBy(term).collect_list(doc_id)`` dies on stopwords — one term can
carry a posting list the size of the corpus, so a single reducer gets
10^11 values (the classic MapReduce hot-key failure).

Scale design
------------
* **Doc-range blocking**: postings group on ``(term, doc_id // block)``,
  never bare ``term``.  Group size is bounded by the block width
  REGARDLESS of term frequency — a stopword with df = N becomes N/block
  independent groups, each collecting <= block doc ids.  No window, no
  salting retry loop, no skew knob to tune: the bound is structural.
  This is also the layout real engines store (block-skippable postings —
  the Block-Max WAND organization), not a test-only trick.
* **Delta + varint accounting**: within a block, postings are
  delta-encoded against the block start (blocks stay independently
  decodable = skippable) and the varint byte-size of every delta is
  summed, giving an exact index-size estimate in pure integer arithmetic
  — deterministic across engines and partitionings.
* The per-term rollup (df, block count, index bytes, 48-bit-md5-prefix
  checksum over every encoded block) is a second ordinary aggregation;
  both shuffles hash well (term x block, then term with bounded rows).

Tokenization matches the tf-idf family: lowercase ``[a-z]{5,}`` runs,
distinct per document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOCK_DOCS = 256
TOKEN_RE = "[a-z]{5,}"


def term_postings(docs: DataFrame, block: int = BLOCK_DOCS,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(term, block, df_block, ids, deltas): one row per posting block,
    ids sorted ascending, deltas encoded against the block start."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(F.expr(
            f"regexp_extract_all(lower(coalesce({text_col}, '')), "
            f"'{TOKEN_RE}', 0)"))).alias("term"),
    )
    blocks = (
        toks.groupBy("term",
                     F.floor(F.col("doc_id") / block).alias("block"))
        .agg(F.count("*").cast("long").alias("df_block"),
             F.sort_array(F.collect_list("doc_id")).alias("ids"))
    )
    # first delta is relative to the block start (block * width), so
    # every block decodes independently of its neighbors
    deltas = F.expr(
        f"transform(ids, (x, i) -> x - IF(i = 0, block * {block}L, "
        f"element_at(ids, i)))")
    return blocks.withColumn("deltas", deltas)


def _varint_bytes(arr):
    # LEB128 tiers: 7 payload bits per byte
    return F.aggregate(
        arr, F.lit(0).cast("long"),
        lambda acc, x: acc + F.when(x < 128, 1).when(x < 16384, 2)
        .when(x < 2097152, 3).when(x < 268435456, 4)
        .otherwise(5).cast("long"))


BM25_SCALE = 1_000_000
# k1 = 6/5 (1.2), b = 3/4 (0.75) as exact rationals
_K1_NUM, _K1_DEN = 6, 5
_B_NUM, _B_DEN = 3, 4


def bm25_impacts(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 scale: int = BM25_SCALE) -> DataFrame:
    """Per-(term, doc) BM25 tf-saturation impacts in EXACT integer
    arithmetic: ``impact = scale·tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))``
    with k1=1.2, b=0.75 cleared to integers (avgdl = T/N substituted, all
    rationals multiplied out), so both engines floor-divide the same
    int64s — no IEEE drift, no cross-engine ulp boundaries.  This is the
    impact-ordered-index precompute (Block-Max WAND stores exactly these
    per-block tf-part bounds; idf is a query-time multiplier applied from
    df, which the caller exports alongside).

    Scale note: the cleared numerator is ``scale·(k1n+k1d)·bd·T·tf`` —
    int64-safe through ~10^9-token corpora; at full crawl scale compute
    impacts per index shard (each shard's own T/N, the standard
    sharded-BM25 practice) or widen to DECIMAL(38,0).

    Shuffle shape: dl is a scan-side projection (no join to get document
    length), tf is one groupBy(doc, term), corpus totals broadcast back;
    the only wide op after tf is the caller's per-term rollup."""
    toks_arr = F.expr(
        f"regexp_extract_all(lower(coalesce({text_col}, '')), "
        f"'{TOKEN_RE}', 0)")
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks_arr).cast("long").alias("dl"),
        F.explode(toks_arr).alias("term"),
    )
    tf = exploded.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf"),
        F.min("dl").alias("dl"),  # constant per doc
    )
    totals = docs.select(toks_arr.alias("ts")).agg(
        F.count("*").cast("long").alias("n_corpus"),
        F.sum(F.size("ts")).cast("long").alias("t_corpus"),
    )
    a, c = _K1_NUM, _K1_DEN
    p, q = _B_NUM, _B_DEN
    num = (F.lit(scale * (a + c) * q).cast("long")
           * F.col("t_corpus") * F.col("tf"))
    den = (F.lit(c * q).cast("long") * F.col("t_corpus") * F.col("tf")
           + F.lit(a * (q - p)).cast("long") * F.col("t_corpus")
           + F.lit(a * p).cast("long") * F.col("dl") * F.col("n_corpus"))
    return (
        tf.crossJoin(F.broadcast(totals))
        .select("term", "doc_id", "tf", "dl",
                num.cast("long").alias("_n"), den.cast("long").alias("_d"))
        .withColumn("impact", F.expr("_n div _d"))
        .drop("_n", "_d")
    )


def bm25_term_stats(docs: DataFrame, scale: int = BM25_SCALE) -> DataFrame:
    """Per-term impact rollup: (term, df, sum_impact, max_impact,
    impact_checksum).  ``max_impact`` is the Block-Max bound an
    impact-ordered index stores; the checksum sums a 48-bit md5 prefix of
    every ``term:doc:impact`` triple — gates each per-doc impact value
    exactly, order-independent."""
    imp = bm25_impacts(docs, scale=scale)
    trip_md5 = F.md5(F.concat(
        F.col("term"), F.lit(":"), F.col("doc_id").cast("string"),
        F.lit(":"), F.col("impact").cast("string")).cast("binary"))
    return imp.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("impact").cast("long").alias("sum_impact"),
        F.max("impact").cast("long").alias("max_impact"),
        F.sum(F.conv(F.substring(trip_md5, 1, 12), 16, 10).cast("long"))
        .cast("long").alias("impact_checksum"),
    )


# ---------------------------------------------------------------------------
# Block-Max WAND: query-time SAFE top-k over the impact index.
#
# The round-1 precompute (bm25_impacts / block maxima) is what an
# impact-ordered index stores; this is the other half — executing top-k
# queries against it WITHOUT scoring every posting.  The plan is the
# distributed analogue of Block-Max WAND / MaxScore pruning:
#
#   1. broadcast the (tiny) query-term list; ONE pass over the corpus
#      index keeps only query-term postings (qimp, persisted — every later
#      step runs on this pruned slice, never the full index again);
#   2. a seed pass exactly scores the postings of each query's RAREST term
#      (the smallest posting list) and takes the k-th best score as the
#      pruning threshold theta — a LOWER bound on the true k-th score,
#      because seeds are real candidates scored exactly;
#   3. per-(term, doc-range-block) maxima give every candidate doc an
#      upper bound ub(d) = sum_t w_t * blockmax(t, block(d)); any doc with
#      ub(d) < theta cannot enter the top-k (score <= ub < theta <= k-th
#      seed score), so only survivors are exactly scored.
#
# Safety is GATED, not assumed: the DuckDB oracle computes the top-k by
# exhaustively scoring every candidate (no pruning) and the driver
# hash-compares the per-query top-k checksums — if the bound ever dropped
# a true top-k doc the gate would go red.
#
# All arithmetic is exact int64 (impacts from bm25_impacts; term weights
# w = (N * 1000) div df, a reciprocal-df idf surrogate), so both engines
# agree bit-for-bit.  At 100 TB the shape holds: the broadcast term filter
# prunes the scan to query-term postings, block maxima are a groupBy on
# that slice, and exact scoring touches only survivor docs.
# ---------------------------------------------------------------------------

WAND_K = 5
WAND_BLOCK = 32
WAND_NT = 24  # top-N terms by df feeding the query set
W_SCALE = 1000


def wand_query_terms(n_terms: int = WAND_NT) -> list:
    """Deterministic query construction over the df-ranked term list:
    query i pairs rank i+1 with rank n_terms-i (1-based), mixing a
    frequent term with a rarer one — 12 two-term queries for n_terms=24.
    Returns (query_index, rank) pairs; ranks are resolved against the
    corpus by the caller."""
    return [(i, r) for i in range(n_terms // 2)
            for r in (i + 1, n_terms - i)]


def wand_topk(docs: DataFrame, k: int = WAND_K, block: int = WAND_BLOCK,
              n_terms: int = WAND_NT, id_col: str = "doc_id",
              text_col: str = "text", persist_fn=None) -> DataFrame:
    """Safe Block-Max-pruned top-k per query:
    (query_id, n_candidates, n_survivors, theta, topk_checksum,
    n_blocks, n_blocks_live).  ``n_blocks - n_blocks_live`` posting
    blocks are skipped whole (document-at-a-time block pruning);
    ``n_candidates`` counts docs enumerated from the LIVE blocks only.

    ``topk_checksum`` sums a 48-bit md5 prefix over every
    ``query:rank:doc:score`` row of the final top-k — the oracle computes
    the same checksum from an UNPRUNED exhaustive scoring, so a match
    proves the pruning bound never discarded a true top-k doc."""
    from pyspark.sql import Window

    spark = docs.sparkSession
    imp = bm25_impacts(docs, id_col=id_col, text_col=text_col)

    # df-ranked terms -> the deterministic query set (24 rows collected:
    # O(1) driver data, same list both engines derive)
    dfs = imp.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    top = (dfs.orderBy(F.desc("df"), "term").limit(n_terms)
           .withColumn("rank", F.row_number().over(
               Window.orderBy(F.desc("df"), "term")))
           .collect())
    n_docs = docs.count()
    by_rank = {r["rank"]: r for r in top}
    qrows = []
    for qi, rank in wand_query_terms(n_terms):
        r = by_rank.get(rank)
        if r is None:  # corpus smaller than n_terms distinct terms
            continue
        qrows.append((f"q{qi:02d}", r["term"],
                      (n_docs * W_SCALE) // r["df"]))
    qterms = spark.createDataFrame(qrows, "query_id string, term string, "
                                   "w long")

    # ONE corpus-index pass, pruned to query terms by broadcast equi-join;
    # persist the pruned slice (leak-tracked by the caller via persist_fn)
    # so the seed / blockmax / exact-score passes never rescan the corpus
    qimp = (imp.join(F.broadcast(qterms), "term")
            .select("query_id", "term", "w", "doc_id", "impact",
                    F.floor(F.col("doc_id") / block).alias("blk")))
    qimp = (persist_fn or (lambda df: df.persist()))(qimp)
    # force the cache BEFORE the fan-out: the seed/blockmax/candidate/
    # exact-score branches all read qimp inside one action, and a lazily
    # cached relation gets raced by parallel stages — each recomputing
    # the full corpus tokenize pass.  One eager count pins it (measured
    # 21% off the whole query at sf0.1).
    qimp.count()

    # rarest term per query = smallest posting list = the seed pass
    rarest = (qimp.groupBy("query_id", "term")
              .agg(F.count("*").cast("long").alias("df"))
              .withColumn("rn", F.row_number().over(
                  Window.partitionBy("query_id").orderBy("df", "term")))
              .filter(F.col("rn") == 1).select("query_id", "term"))
    seed_docs = qimp.join(F.broadcast(rarest), ["query_id", "term"]) \
        .select("query_id", "doc_id")
    seed_scores = (qimp.join(seed_docs, ["query_id", "doc_id"])
                   .groupBy("query_id", "doc_id")
                   .agg(F.sum(F.col("w") * F.col("impact"))
                        .cast("long").alias("score")))
    theta = (seed_scores.withColumn("rn", F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")))
        .filter(F.col("rn") == k)
        .select("query_id", F.col("score").alias("theta")))

    # per-doc upper bound from the block maxima: every query term whose
    # posting block covers doc d contributes w * blockmax even if d lacks
    # the term (a valid over-estimate — the WAND bound)
    blockmax = (qimp.groupBy("query_id", "term", "w", "blk")
                .agg(F.max("impact").alias("bmax")))
    # BLOCK-level skip (the document-at-a-time posting-block pruning of
    # Block-Max WAND): a whole doc-range block whose summed term bound
    # already falls below theta is skipped BEFORE any of its docs are
    # enumerated — safe because every doc d in block b has
    # ub(d) = sum_t w*bmax(t, b) = blk_ub(b) < theta.  At index scale
    # this is the pruning that matters: dead blocks never leave the
    # scan, the per-doc bound only refines the live remainder.
    blk_ub = (blockmax.groupBy("query_id", "blk")
              .agg(F.sum(F.col("w") * F.col("bmax")).cast("long")
                   .alias("blk_ub")))
    # one flagged relation feeds both the live-block filter and the
    # skip accounting — no second aggregate over the block bounds
    blk_flag = (blk_ub.join(F.broadcast(theta), "query_id", "left")
                .select("query_id", "blk",
                        (F.col("blk_ub")
                         >= F.coalesce(F.col("theta"), F.lit(0)))
                        .cast("long").alias("_live")))
    live_blocks = blk_flag.filter(F.col("_live") == 1) \
        .select("query_id", "blk")
    blk_counts = (blk_flag.groupBy("query_id")
                  .agg(F.count("*").cast("long").alias("n_blocks"),
                       F.sum("_live").cast("long")
                       .alias("n_blocks_live")))
    cand = (qimp.select("query_id", "doc_id", "blk")
            .join(live_blocks, ["query_id", "blk"], "left_semi")
            .select("query_id", "doc_id", "blk").distinct())
    ub = (cand.join(blockmax, ["query_id", "blk"])
          .groupBy("query_id", "doc_id")
          .agg(F.sum(F.col("w") * F.col("bmax")).cast("long").alias("ub")))
    survivors = (ub.join(F.broadcast(theta), "query_id", "left")
                 .filter(F.col("ub") >= F.coalesce(F.col("theta"),
                                                   F.lit(0)))
                 .select("query_id", "doc_id"))

    # exact scoring restricted to survivors, then the final top-k
    scored = (qimp.join(survivors, ["query_id", "doc_id"])
              .groupBy("query_id", "doc_id")
              .agg(F.sum(F.col("w") * F.col("impact"))
                   .cast("long").alias("score")))
    topk = (scored.withColumn("rn", F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")))
        .filter(F.col("rn") <= k))
    row_md5 = F.md5(F.concat(
        F.col("query_id"), F.lit(":"), F.col("rn").cast("string"),
        F.lit(":"), F.col("doc_id").cast("string"), F.lit(":"),
        F.col("score").cast("string")).cast("binary"))
    ck = topk.groupBy("query_id").agg(
        F.sum(F.conv(F.substring(row_md5, 1, 12), 16, 10).cast("long"))
        .cast("long").alias("topk_checksum"))
    counts = (cand.groupBy("query_id")
              .agg(F.count("*").cast("long").alias("n_candidates"))
              .join(survivors.groupBy("query_id")
                    .agg(F.count("*").cast("long").alias("n_survivors")),
                    "query_id"))
    return (counts
            .join(F.broadcast(theta), "query_id", "left")
            .withColumn("theta",
                        F.coalesce(F.col("theta"), F.lit(0)).cast("long"))
            .join(ck, "query_id")
            .join(blk_counts, "query_id")
            .select("query_id", "n_candidates", "n_survivors", "theta",
                    "topk_checksum", "n_blocks", "n_blocks_live"))


def postings_stats(docs: DataFrame, block: int = BLOCK_DOCS) -> DataFrame:
    """Per-term index rollup: (term, df, n_blocks, index_bytes, checksum).

    ``checksum`` sums the 48-bit md5 prefix of every encoded block
    (keyed by term:block so block contents are position-bound) —
    order-independent, so the gate proves the exact posting content
    without a global sort."""
    blk = term_postings(docs, block=block)
    dstr = F.array_join(F.transform("deltas",
                                    lambda x: x.cast("string")), ",")
    blk_md5 = F.md5(F.concat(
        F.col("term"), F.lit(":"), F.col("block").cast("string"),
        F.lit(":"), dstr).cast("binary"))
    return (
        blk.select(
            "term", "df_block",
            _varint_bytes(F.col("deltas")).alias("vbytes"),
            F.conv(F.substring(blk_md5, 1, 12), 16, 10).cast("long")
            .alias("blk_ck"))
        .groupBy("term")
        .agg(F.sum("df_block").cast("long").alias("df"),
             F.count("*").cast("long").alias("n_blocks"),
             F.sum("vbytes").cast("long").alias("index_bytes"),
             F.sum("blk_ck").cast("long").alias("checksum"))
    )
