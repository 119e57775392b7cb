"""Crawl-snapshot diff + latest-wins compaction.

A recurring crawl re-captures a moving URL set: every new snapshot adds
pages, drops pages, and re-fetches pages whose content changed.  The two
maintenance operations every crawl store runs on top of that are

* **compaction** — collapse all snapshots to one row per url carrying the
  most recent capture (Iceberg's copy-on-write "latest-wins" upsert merge;
  the reference's incremental re-extraction reads exactly this view), and
* **diff accounting** — per snapshot pair, how many urls were added /
  removed / changed / unchanged (the CDC summary that decides how much of
  the extraction pipeline has to re-run; cf. the resumable-checkpoint
  restart in ``checkpointing.py`` which re-extracts only the changed set).

Scale design
------------
Both operations are ONE hash aggregation keyed on ``url`` — the natural
compaction key, so the single shuffle is unavoidable and minimal.  The
per-url reduction (``max_by`` on capture time + conditional min/max per
snapshot) is algebraic, so Spark runs it with map-side partial aggregation;
there is no window function, no join, and no driver collection anywhere.
At 10^12 rows this is the same plan Iceberg's own rewrite-data-files action
produces for a latest-wins merge: scan → partial agg → exchange(url) →
final agg.  Skewed urls cannot exist (url is unique per capture within a
snapshot), so no salting is needed — unlike host-keyed stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compact_latest_wins(pages: DataFrame, key: str = "url",
                        ts: str = "warc_ts") -> DataFrame:
    """One row per ``key`` carrying the columns of its most recent capture.

    Single hash aggregation: every non-key column rides inside one struct
    ordered by (ts, snapshot_id, ...) so ``max`` reduces it associatively —
    map-side combine applies, ties broken by the later snapshot id
    (``snapshot_id`` is pinned as the second struct field when present;
    without one, ts ties fall back to payload-column order).
    """
    payload = [c for c in pages.columns if c != key]
    rest = [c for c in payload if c != ts]
    if "snapshot_id" in rest:  # pin the documented tie-break
        rest = ["snapshot_id"] + [c for c in rest if c != "snapshot_id"]
    packed = F.struct(F.col(ts), *[F.col(c) for c in rest])
    latest = pages.groupBy(key).agg(F.max(packed).alias("_latest"))
    return latest.select(
        key, *[F.col(f"_latest.{c}").alias(c) for c in payload])


def snapshot_diff(pages: DataFrame, key: str = "url",
                  snap: str = "snapshot_id",
                  content_hash: str = "content_md5") -> DataFrame:
    """(url, status) for a two-snapshot relation: status in
    {'added','removed','changed','unchanged'}.

    Same single-aggregation shape as compaction: per url, the content hash
    seen in each snapshot (``min`` — a url appears at most once per
    snapshot) then a pure projection classifies the pair.
    """
    h1 = F.min(F.when(F.col(snap) == 1, F.col(content_hash)))
    h2 = F.min(F.when(F.col(snap) == 2, F.col(content_hash)))
    per_url = pages.groupBy(key).agg(h1.alias("_h1"), h2.alias("_h2"))
    status = (
        F.when(F.col("_h1").isNull(), F.lit("added"))
        .when(F.col("_h2").isNull(), F.lit("removed"))
        .when(F.col("_h1") == F.col("_h2"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return per_url.select(key, status.alias("status"))


def snapshot_diff_stats(pages: DataFrame, key: str = "url",
                        snap: str = "snapshot_id",
                        ts: str = "warc_ts",
                        content_hash: str = "content_md5") -> DataFrame:
    """1-row diff + compaction summary for a two-snapshot crawl relation.

    Counts per diff status, per-snapshot url counts, and an
    order-independent checksum over the compacted (latest-wins) content —
    the same 48-bit-md5-prefix-sum convention as the dup-excision gate, so
    a green oracle row proves the compacted VIEW byte-matches, not just
    the counts.  Everything reduces out of one groupBy(url); the final
    1-row agg is a second (trivial) reduction.
    """
    h1 = F.min(F.when(F.col(snap) == 1, F.col(content_hash)))
    h2 = F.min(F.when(F.col(snap) == 2, F.col(content_hash)))
    latest = F.max(F.struct(F.col(ts), F.col(snap), F.col(content_hash)))
    per_url = pages.groupBy(key).agg(
        h1.alias("_h1"), h2.alias("_h2"),
        latest.getField(content_hash).alias("_latest_md5"),
    )
    both = F.col("_h1").isNotNull() & F.col("_h2").isNotNull()
    cnt = lambda c: F.sum(c.cast("long")).cast("long")  # noqa: E731
    return per_url.agg(
        F.count("*").cast("long").alias("n_urls"),
        cnt(F.col("_h1").isNotNull()).alias("n_snap1"),
        cnt(F.col("_h2").isNotNull()).alias("n_snap2"),
        cnt(F.col("_h1").isNull()).alias("n_added"),
        cnt(F.col("_h2").isNull()).alias("n_removed"),
        cnt(both & (F.col("_h1") != F.col("_h2"))).alias("n_changed"),
        cnt(both & (F.col("_h1") == F.col("_h2"))).alias("n_unchanged"),
        F.min("_latest_md5").alias("compacted_min_md5"),
        F.max("_latest_md5").alias("compacted_max_md5"),
        F.sum(F.conv(F.substring("_latest_md5", 1, 12), 16, 10)
              .cast("long")).cast("long").alias("compacted_checksum"),
    )


# AIMD recrawl-scheduling constants (seconds): halve on change, grow 1.5x
# on no-change — the multiplicative-decrease / bounded-increase policy of
# freshness-driven crawl schedulers (Cho & Garcia-Molina revisit policy,
# as deployed in AIMD form by production crawlers)
RECRAWL_BASE = 86_400
RECRAWL_MIN = 3_600
RECRAWL_MAX = 604_800


def recrawl_schedule(pages: DataFrame, key: str = "url",
                     snap: str = "snapshot_id",
                     content_hash: str = "content_md5",
                     base: int = RECRAWL_BASE, min_s: int = RECRAWL_MIN,
                     max_s: int = RECRAWL_MAX) -> DataFrame:
    """Per-url recrawl interval from its capture history: start at
    ``base``; for each successive capture pair, CHANGED content halves
    the interval (floored at ``min_s``), UNCHANGED grows it 3/2-fold
    (capped at ``max_s``).  All integer arithmetic — engine-exact.

    Returns (url, n_obs, n_changes, interval_s).

    Scale shape: ONE groupBy(url) collecting the bounded capture list
    (a url has at most #snapshots captures — small by construction, like
    the sitemap per-host group), then the interval fold runs as a pure
    ``aggregate`` expression over the sorted array.  No window, no join,
    no iteration over the corpus."""
    caps = F.array_sort(F.collect_list(
        F.struct(F.col(snap).alias("s"), F.col(content_hash).alias("h"))))
    per_url = pages.groupBy(key).agg(caps.alias("caps"))
    n = F.size("caps")
    obs = F.when(n >= 2, F.zip_with(
        F.slice("caps", 1, (n - 1).cast("int")),
        F.slice(F.col("caps"), 2, (n - 1).cast("int")),
        lambda a, b: (a["h"] != b["h"]).cast("int"),
    )).otherwise(F.array().cast("array<int>"))
    interval = F.aggregate(
        obs, F.lit(base).cast("long"),
        lambda acc, y: F.when(
            y == 1, F.greatest(F.lit(min_s).cast("long"),
                               F.floor(acc / 2).cast("long")))
        .otherwise(F.least(F.lit(max_s).cast("long"),
                           F.floor(acc * 3 / 2).cast("long"))),
    )
    return per_url.select(
        key,
        F.greatest(n - 1, F.lit(0)).cast("long").alias("n_obs"),
        F.aggregate(obs, F.lit(0).cast("long"),
                    lambda a, y: a + y.cast("long")).alias("n_changes"),
        interval.alias("interval_s"),
    )


def recrawl_stats(pages: DataFrame, **kw) -> DataFrame:
    """1-row scheduler rollup: url/observation/change totals, interval
    min/max/sum, and the 48-bit md5-prefix checksum over every
    url:interval pair (gates each url's folded schedule exactly)."""
    sched = recrawl_schedule(pages, **kw)
    pair_md5 = F.md5(F.concat(
        F.col("url"), F.lit(":"),
        F.col("interval_s").cast("string")).cast("binary"))
    return sched.agg(
        F.count("*").cast("long").alias("n_urls"),
        F.sum("n_obs").cast("long").alias("n_obs"),
        F.sum("n_changes").cast("long").alias("n_changes"),
        F.min("interval_s").cast("long").alias("min_interval"),
        F.max("interval_s").cast("long").alias("max_interval"),
        F.sum("interval_s").cast("long").alias("sum_interval"),
        F.sum(F.conv(F.substring(pair_md5, 1, 12), 16, 10).cast("long"))
        .cast("long").alias("schedule_checksum"),
    )
