"""Retrieval-training data mining: hard negatives + positive ranks over a
(link → embedding) corpus.

The contrastive-retrieval recipe (DPR / SimCSE / E5): each hyperlink gives a
*positive* (query doc → linked doc); the *hard negatives* are the corpus
docs most similar to the query that are NOT linked from it.  Models trained
with mined hard negatives beat in-batch-only negatives by wide margins, so
every web-scale retrieval pipeline runs exactly this join.  The reference's
graph edges (`/root/reference/docling_graph/core/converters/graph_converter.py`
node/edge emission) are the link substrate; this operator family turns them
into training triples.

Scale design
------------
* The query/link side is the SMALL side (mining runs per query batch, not
  per corpus row): it is broadcast, so the corpus embedding scan never
  shuffles — same plan shape as `operators/ann.brute_force_knn`.
* The linked-pair exclusion is a broadcast left-anti join BEFORE the
  ranking window, so a positive landing in the top-k can never silently
  shrink the negative set to k-1.
* Exactness is the oracle baseline; at 100 TB the candidate generation
  step swaps to the bucketed/IVF plans in `operators/ann.py` (equi-join on
  bucket = partition-pruned probe) with this module's exclusion + ranking
  unchanged.
* Rank-only public outputs: float similarities are not hash-stable across
  engines, ranks (with a deterministic id tie-break) are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .ann import dot, with_norm
from .partitioning import ensure_min_partitions


def _scored_pairs(emb: DataFrame, queries: DataFrame,
                  id_col: str, vec_col: str) -> DataFrame:
    """(query_id, neighbor_id, _sim): every query × corpus cosine pair,
    self-pairs excluded.  Queries broadcast; corpus partition-local."""
    corpus = with_norm(ensure_min_partitions(emb, id_col), vec_col, "_cn")
    q = with_norm(queries, "q", "_qn")
    sim = dot(F.col(vec_col), F.col("q")) / (F.col("_cn") * F.col("_qn"))
    return (
        corpus.join(F.broadcast(q),
                    F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("neighbor_id"),
                sim.alias("_sim"))
    )


def mine_hard_negatives(emb: DataFrame, links: DataFrame, k: int = 5,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """(query_id, rank, neighbor_id): the k corpus docs most cosine-similar
    to each linked-from doc that are NOT among its link targets.

    ``links`` is a (query_id, pos_id) relation — one row per positive pair;
    its distinct query side defines the query set.  Exclusions happen
    before the ranking window (see module docstring)."""
    links = links.select("query_id", "pos_id").distinct()
    queries = (
        emb.join(F.broadcast(links.select("query_id").distinct()),
                 F.col(id_col) == F.col("query_id"))
        .select("query_id", F.col(vec_col).alias("q"))
    )
    pairs = _scored_pairs(emb, queries, id_col, vec_col)
    negatives = pairs.join(
        F.broadcast(links),
        (pairs["query_id"] == links["query_id"])
        & (pairs["neighbor_id"] == links["pos_id"]),
        "left_anti",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        negatives.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"),
                "neighbor_id")
    )


def positive_ranks(emb: DataFrame, links: DataFrame,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """(query_id, pos_rank, pos_id): where each positive lands in the full
    similarity ordering of the corpus around its query — the retrieval
    difficulty signal used to curriculum-sort training pairs (rank 1 =
    trivially retrievable, large rank = hard positive)."""
    links = links.select("query_id", "pos_id").distinct()
    queries = (
        emb.join(F.broadcast(links.select("query_id").distinct()),
                 F.col(id_col) == F.col("query_id"))
        .select("query_id", F.col(vec_col).alias("q"))
    )
    pairs = _scored_pairs(emb, queries, id_col, vec_col)
    w = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id").asc()
    )
    ranked = pairs.withColumn("pos_rank", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(links),
                    (ranked["query_id"] == links["query_id"])
                    & (ranked["neighbor_id"] == links["pos_id"]))
        .select(pairs["query_id"],
                F.col("pos_rank").cast("long").alias("pos_rank"),
                F.col("pos_id"))
    )


DOC_LINK_RE = r"https://host[0-9]+\.example\.com/doc/([0-9]+)"


def doc_link_pairs(pages: DataFrame, url_col: str = "url",
                   html_col: str = "html",
                   link_re: str = DOC_LINK_RE) -> DataFrame:
    """(query_id, pos_id): doc-level link pairs mined from page HTML.

    ``link_re``'s group 1 must capture the target document key from the
    href path (the synthetic corpus keys docs by the trailing path integer;
    a real crawl substitutes its URL-canonicalization join here).  The
    source key is taken from the page's own url the same way.  Unresolvable
    targets (no such doc) are dropped by the caller's semi-join against the
    corpus — this operator only extracts."""
    s = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    return (
        pages.select(
            # try_cast: a url with no doc key extracts '' which must become
            # NULL (and be filtered), not an ANSI cast error
            F.regexp_extract(F.col(url_col), r"/doc/([0-9]+)$", 1)
            .try_cast("long").alias("query_id"),
            F.explode(
                F.regexp_extract_all(s, F.lit(link_re), 1)
            ).alias("_pos"),
        )
        .select("query_id", F.col("_pos").try_cast("long").alias("pos_id"))
        .filter(F.col("query_id").isNotNull()
                & (F.col("query_id") != F.col("pos_id")))
        .distinct()
    )
