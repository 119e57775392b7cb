"""End-to-end corpus curation: the training-data funnel over extracted
web text, composed from the tested operator suite.

Stages (every one deterministic — the whole funnel is a pure function of
the input corpus, so a re-run or a different cluster produces the same
curated set byte-for-byte):

  input
    → unique-url normalization    (crawl re-captures: one deterministic
                                   row per url — min md5(text) wins)
    → Gopher quality gates        (textprep.gopher_pass — word-count /
                                   mean-length / repetition rules)
    → LM fluency gate             (textprep.trigram_fluency_scores —
                                   corpus-trained char-trigram model,
                                   integer-scaled scores)
    → exact content dedup         (md5(text) groups, smallest url wins)
    → MinHash near-dup clusters   (optional: dedup.minhash_lsh_dedup →
                                   connected components, one survivor
                                   per cluster)
    → per-host document cap       (textprep.host_cap_sample — skew-aware
                                   two-stage top-K)
    → train/val/test split        (textprep.split_by_hash — disjoint,
                                   growth-stable md5 ranges)
    → token-budget shard packing  (sharding.pack_shards — distributed
                                   prefix sum; train split only)

The funnel report (stage → surviving docs) is the curation run's primary
observability artifact — the analogue of the reference's per-stage
pipeline metadata (`pipeline/orchestrator.py:149-240` writes
metadata.json per run; here the stages are corpus-level, so the report
rows are corpus counts, not per-document traces).

Scale notes: each gate is a scan-stage filter or a narrow-key shuffle
already analyzed in its operator module; stage outputs are
localCheckpointed before counting so the funnel's per-stage counts don't
re-run the upstream lineage once per stage.  The fluency model is trained
on the quality-gated corpus (not the raw input) so boilerplate that the
gates remove cannot dominate the trigram distribution.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import sharding, textprep

FLUENCY_DEFAULT_THRESHOLD = textprep.TRIGRAM_SCALE // 20


@dataclass
class CurationConfig:
    gopher: bool = True
    fluency_threshold: int | None = FLUENCY_DEFAULT_THRESHOLD
    # True = CCNet-style per-language trigram models (each doc judged
    # against its own language's statistics); False = corpus-global model
    fluency_per_lang: bool = False
    # MinHash near-dup stage after exact dedup: verified-Jaccard percent
    # threshold (e.g. 80), or None to skip.  Keeps one doc per duplicate
    # CLUSTER (connected components), not per pair — transitive dups fall.
    near_dup_jaccard: int | None = None
    host_cap: int | None = 10_000
    shard_budget: int = 1 << 20
    split_bounds: "tuple[str, str]" = ("e0", "f0")


@dataclass
class CurationResult:
    curated: DataFrame            # url, text, lang, split, shard_id
    funnel: "list[tuple[str, int]]" = field(default_factory=list)


def _checkpointed_count(df: DataFrame) -> "tuple[DataFrame, int]":
    out = df.localCheckpoint(eager=False)
    return out, out.count()


def curate(docs: DataFrame, cfg: CurationConfig | None = None,
           url_col: str = "url", text_col: str = "text") -> CurationResult:
    """(url, text, lang) -> curated corpus + funnel report."""
    from pyspark.sql import Window

    cfg = cfg or CurationConfig()
    funnel = [("input", docs.count())]

    # crawl tables re-capture urls; every downstream stage (semi-joins on
    # url, pack_shards' total-order precondition) assumes url uniqueness,
    # so normalize first: one deterministic winner per url (min md5(text),
    # tie-broken by text — NULL text coalesces so engines sort alike)
    w = Window.partitionBy(url_col).orderBy(
        F.md5(F.coalesce(F.col(text_col), F.lit("")).cast("binary")),
        text_col)
    cur = (docs.withColumn("_rn", F.row_number().over(w))
           .filter(F.col("_rn") == 1).drop("_rn"))
    cur, n = _checkpointed_count(cur)
    funnel.append(("unique_url", n))

    if cfg.gopher:
        cur = cur.filter(textprep.gopher_pass(F.col(text_col)))
        cur, n = _checkpointed_count(cur)
        funnel.append(("gopher_quality", n))

    if cfg.fluency_threshold is not None:
        if cfg.fluency_per_lang:
            scores = textprep.trigram_fluency_scores_per_lang(
                cur.select(F.col(url_col).alias("doc_id"), text_col,
                           "lang"))
        else:
            scores = textprep.trigram_fluency_scores(
                cur.select(F.col(url_col).alias("doc_id"), text_col))
        keep = scores.filter(
            F.col("score") >= cfg.fluency_threshold
        ).select(F.col("doc_id").alias(url_col))
        cur = cur.join(keep, url_col, "left_semi")
        cur, n = _checkpointed_count(cur)
        funnel.append(("lm_fluency", n))

    # exact content dedup: smallest url per md5(text) survives — group
    # sizes are duplicate multiplicities, so the agg combines map-side
    h = F.md5(F.col(text_col).cast("binary"))
    winners = (
        cur.select(F.col(url_col), h.alias("_h"))
        .groupBy("_h").agg(F.min(url_col).alias(url_col))
        .select(url_col)
    )
    cur = cur.join(winners, url_col, "left_semi")
    cur, n = _checkpointed_count(cur)
    funnel.append(("exact_dedup", n))

    if cfg.near_dup_jaccard is not None:
        from .operators import dedup as op_dedup

        pairs = op_dedup.minhash_lsh_dedup(
            cur.select(F.col(url_col).alias("doc_id"), text_col))
        dup_pairs = pairs.filter(
            F.col("jaccard_pct") >= cfg.near_dup_jaccard)
        comp = op_dedup.connected_components(dup_pairs)
        losers = (comp.filter(F.col("id") != F.col("component"))
                  .select(F.col("id").alias(url_col)))
        cur = cur.join(losers, url_col, "left_anti")
        cur, n = _checkpointed_count(cur)
        funnel.append(("near_dup", n))

    if cfg.host_cap is not None:
        kept = textprep.host_cap_sample(
            cur.select(url_col), cfg.host_cap, url_col
        ).select(url_col)
        cur = cur.join(kept, url_col, "left_semi")
        cur, n = _checkpointed_count(cur)
        funnel.append(("host_cap", n))

    cur = textprep.split_by_hash(cur, url_col, bounds=cfg.split_bounds)

    train = cur.filter(F.col("split") == "train")
    counted = sharding.token_counts(
        train.select(F.col(url_col).alias("doc_id"), text_col))
    assigned = (
        sharding.pack_shards(counted, budget=cfg.shard_budget)
        .select(F.col("doc_id").alias(url_col), "shard_id")
    )
    curated = (
        cur.join(assigned, url_col, "left")
        .withColumn("shard_id", F.coalesce("shard_id", F.lit(-1)))
    )
    # split assignment and shard packing never drop rows
    funnel.append(("curated", funnel[-1][1]))
    return CurationResult(curated=curated, funnel=funnel)
