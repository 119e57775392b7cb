"""Token-budget shard packing: assign documents to fixed-size training
shards by global prefix sum, computed with the two-pass distributed
prefix-sum pattern.

A training run consumes the corpus as a sequence of shards, each holding
roughly `budget` tokens of documents in a stable global order.  The shard
of a document is a pure function of the corpus:

    shard_id(doc) = (sum of tokens of all docs ordered before it) div budget

i.e. a document is placed by the token *position* where it starts, so a
document that straddles a budget boundary belongs to the shard where it
begins and a shard's true size is bounded by ``budget + max_doc_tokens``.
The assignment is deterministic and engine-independent (it depends only on
the ordering column and token counts, never on partitioning), which is
what lets a DuckDB window-function oracle hash-match a distributed run.

Scale design — the naive formulation is a single global window
(``sum() over (order by doc_id)``), which Spark executes as a sort into
ONE partition: a non-starter at 10^12 rows.  Instead:

1. Bucket the (narrow) ``(order, tokens)`` projection into ordered,
   disjoint key ranges — explicit ``(key - min) div width`` buckets for
   integer keys (no extra shuffle), ``repartitionByRange`` +
   ``spark_partition_id()`` otherwise.
2. Per-bucket prefix sums via a window PARTITIONED by the bucket id —
   runs in parallel, no global sort.
3. Per-partition totals (one row per partition, a few hundred/thousand
   rows) are collected to the driver, ordered by each partition's minimum
   key — legal because range partitioning makes partition key-ranges
   disjoint — and turned into per-partition global offsets.
4. Offsets are broadcast-joined back; ``shard_id = (offset +
   local_prefix - tokens) div budget``.

Driver traffic is O(#partitions), never O(rows).  The reference
(SylvainWT/docling-graph) has no corpus-sharding notion — its batcher
(`core/extractors/chunk_batcher.py:214-269`) greedily packs chunks of one
document for LLM calls; this operator is the corpus-level analogue a
training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# integer-exact analogue of the reference's len/4 * 1.2 heuristic
# (chunk_batcher.py:59-68): 0.3 tokens per character, exact in int64.
TOKENS_SQL = "(length({col}) * 3) div 10"


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``n_tokens`` — the integer heuristic estimate (0.3/char)."""
    return docs.withColumn(
        "n_tokens", F.expr(TOKENS_SQL.format(col=text_col)).cast("long")
    )


def bucketed_local_prefix(docs: DataFrame, order_col: str,
                          tokens_col: str, n_parts: int) -> DataFrame:
    """(order, tokens) -> (order, _tok, _pid, _local_prefix): ordered
    range buckets with per-bucket running sums — the pre-offset half of
    the distributed prefix sum.

    Integer order keys get explicit buckets `(key - min) div width` from
    a min/max aggregate (columnar-stats cheap), so the per-bucket window's
    own hash exchange is the ONLY narrow shuffle (plan-asserted in
    tests/test_sharding.py).  Other key types fall back to
    `repartitionByRange` + `spark_partition_id()`, paying one extra range
    exchange to discover boundaries."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    narrow = docs.select(order_col, F.coalesce(
        F.col(tokens_col), F.lit(0)).cast("long").alias("_tok"))
    if isinstance(docs.schema[order_col].dataType,
                  (ByteType, ShortType, IntegerType, LongType)):
        lo, hi = narrow.agg(F.min(order_col), F.max(order_col)).collect()[0]
        if lo is None:
            lo, hi = 0, 0
        width = max(1, (int(hi) - int(lo) + n_parts) // n_parts)
        narrow = narrow.withColumn(
            "_pid",
            F.expr(f"(({order_col} - {int(lo)}) div {width})").cast("int"))
    else:
        narrow = (
            narrow.repartitionByRange(n_parts, F.col(order_col))
            .withColumn("_pid", F.spark_partition_id())
        )
    w = (Window.partitionBy("_pid").orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return narrow.withColumn("_local_prefix", F.sum("_tok").over(w))


def pack_shards(docs: DataFrame, budget: int,
                order_col: str = "doc_id",
                tokens_col: str = "n_tokens",
                num_partitions: int | None = None) -> DataFrame:
    """(order_col, tokens_col, ...) -> + ``shard_id``: global token-budget
    shard assignment in ``order_col`` order via distributed prefix sum.

    ``order_col`` must be a total order (unique values).  Only the narrow
    projection is shuffled; callers keep wide payloads out of ``docs``
    and join the assignment back on ``order_col``.

    Shuffle accounting: the per-group window needs ONE hash exchange of
    the narrow relation on the group key.  For integer order keys the
    group is an explicit range bucket `(key - min) div width` computed
    from a min/max aggregate (columnar-stats cheap), so that window
    exchange is the only narrow shuffle.  Non-numeric keys (urls) fall
    back to `repartitionByRange` + `spark_partition_id()`, paying one
    extra range exchange to discover the bucket boundaries.  Either way
    bucket *balance* only affects parallelism, never the assignment —
    offsets are derived from per-bucket totals ordered by bucket minimum.
    """
    pre, _total = global_prefix_starts(
        docs, order_col=order_col, tokens_col=tokens_col,
        num_partitions=num_partitions)
    return shard_mark(pre, budget, order_col=order_col,
                      tokens_col=tokens_col)


def shard_mark(pre: DataFrame, budget: int, order_col: str = "doc_id",
               tokens_col: str = "n_tokens") -> DataFrame:
    """Project ``shard_id`` from an already-prefixed relation (from
    global_prefix_starts) — the single source of the assignment rule, so
    callers sharing one prefix pass across consumers (shard stats, PPS)
    cannot drift from pack_shards."""
    return pre.select(
        order_col,
        F.col(tokens_col),
        # int64 `div`, not float division: prefix sums at 10^12-doc
        # scale exceed double's 53-bit exact-integer range
        F.expr(f"_start div {int(budget)}").alias("shard_id"),
    )


def global_prefix_starts(docs: DataFrame,
                         order_col: str = "doc_id",
                         tokens_col: str = "n_tokens",
                         num_partitions: int | None = None):
    """(order_col, tokens_col, ...) -> ((order_col, tokens_col, _start),
    total): the exclusive global prefix sum in ``order_col`` order, plus
    the corpus total — the shared substrate of every position-based
    assignment (shard packing, PPS systematic sampling).  Same
    two-pass distributed prefix sum as pack_shards historically ran
    inline: per-bucket window, O(#partitions) driver offsets, broadcast
    join back.  The total falls out of the offsets pass for free."""
    spark = docs.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    # materialize the windowed narrow relation ONCE: the totals pass and
    # the final join both consume it, and a recompute would repeat the
    # shuffle + sort (and, on the fallback path, re-derive partition ids)
    # — localCheckpoint pins the bucket assignment both passes must share
    local = bucketed_local_prefix(
        docs, order_col, tokens_col, n_parts
    ).localCheckpoint(eager=False)

    # one row per partition; driver-bounded by parallelism, not data size
    totals = (
        local.groupBy("_pid")
        .agg(F.sum("_tok").alias("_t"), F.min(order_col).alias("_k"))
        .collect()
    )
    offsets, running = {}, 0
    for row in sorted(totals, key=lambda r: r["_k"]):
        offsets[row["_pid"]] = running
        running += row["_t"]
    if offsets:
        off_df = spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()],
            "_pid int, _offset long",
        )
    else:
        off_df = spark.createDataFrame([], "_pid int, _offset long")

    pre = (
        local.join(F.broadcast(off_df), "_pid")
        .select(
            order_col,
            F.col("_tok").alias(tokens_col),
            (F.col("_offset") + F.col("_local_prefix") - F.col("_tok"))
            .alias("_start"),
        )
    )
    return pre, int(running)


def shard_stats(assigned: DataFrame,
                tokens_col: str = "n_tokens") -> DataFrame:
    """Per-shard packing report: (shard_id, n_docs, shard_tokens)."""
    return (
        assigned.groupBy("shard_id")
        .agg(F.count("*").alias("n_docs"),
             F.sum(tokens_col).alias("shard_tokens"))
        .orderBy("shard_id")
    )


def pack_sequences(docs_with_shards: DataFrame,
                   order_col: str = "doc_id",
                   text_col: str = "text",
                   tokens_col: str = "n_tokens",
                   separator: str = "\n\n") -> DataFrame:
    """(shard_id, order, text, tokens) -> one row per shard:
    (shard_id, packed_text, n_docs, n_tokens) — the concatenated
    trainer-input form of a shard, documents joined in ``order_col``
    order by ``separator``.

    This is the "sample packing" step after :func:`pack_shards`: a
    shard's documents are concatenated into one sequence the trainer
    consumes directly.  Deterministic: array_sort on the (order, text)
    struct fixes concatenation order regardless of partitioning.

    Scale: one groupBy(shard_id) — each group's payload is bounded by
    the shard budget (+1 straddling doc), so collect_list rows are
    budget-sized by construction, never corpus-sized; the agg shuffles
    each text byte exactly once."""
    parts = F.array_sort(F.collect_list(F.struct(
        F.col(order_col).alias("o"), F.col(text_col).alias("t"),
    )))
    return (
        docs_with_shards.groupBy("shard_id")
        .agg(
            parts.alias("_parts"),
            F.count("*").alias("n_docs"),
            F.sum(tokens_col).alias("n_tokens"),
        )
        .select(
            "shard_id",
            F.array_join(F.transform("_parts", lambda s: s["t"]),
                         separator).alias("packed_text"),
            "n_docs", "n_tokens",
        )
    )


def pps_systematic_sample(docs: DataFrame, k: int,
                          order_col: str = "doc_id",
                          tokens_col: str = "n_tokens",
                          num_partitions: int | None = None) -> DataFrame:
    """Probability-proportional-to-size systematic sampling, exact
    integer arithmetic: k midpoint grid points g_i = floor((2i+1)*T/(2k))
    over the token prefix-sum line [0, T); a document is selected once
    per grid point inside its interval [start, start+w).

    The corpus-mixing sampler: when training mixes need n tokens from a
    source, PPS-by-token-count picks documents with probability
    proportional to their token mass, and the SYSTEMATIC (grid) variant
    is deterministic, exactly-k, and stratified along the corpus order —
    no random state, no floating point, no rejection loop.  Every
    quantity is int64 (documented bound: 2*k*T must fit — k*T < 2^62;
    at T = 10^12 tokens that allows k up to ~4.6M samples per call).

    Built on the same distributed prefix sum as shard packing: one
    narrow shuffle, O(#partitions) driver offsets.  Returns
    (order_col, tokens_col, _start, n_grid) with n_grid >= 1 marking
    selected docs; sum(n_grid) == k exactly (each grid point lands in
    exactly ONE document interval — empty docs have empty intervals).
    """
    pre, total = global_prefix_starts(
        docs, order_col=order_col, tokens_col=tokens_col,
        num_partitions=num_partitions)
    return pps_mark(pre, total, k, tokens_col=tokens_col)


def pps_mark(pre: DataFrame, total: int, k: int,
             tokens_col: str = "n_tokens") -> DataFrame:
    """Append ``n_grid`` to an already-prefixed relation (from
    global_prefix_starts) — lets one prefix-sum pass feed both shard
    packing and PPS marking."""
    if total <= 0:
        return pre.withColumn("n_grid", F.lit(0).cast("long"))

    t2 = 2 * int(total)

    def f(col: str) -> str:
        # number of grid points g_i < col == clamp(ceil((2k*col - T)/2T));
        # ceil_div via int64 `div` on a positive numerator — floor() over
        # float division would lose exactness past 2^53
        p = f"(2 * {int(k)} * {col} - {int(total)})"
        return (f"LEAST(CAST({int(k)} AS BIGINT), "
                f"CASE WHEN {p} <= 0 THEN CAST(0 AS BIGINT) "
                f"ELSE ({p} + {t2 - 1}) div {t2} END)")

    return (
        pre.withColumn("_end", F.col("_start") + F.col(tokens_col))
        .withColumn("n_grid",
                    F.expr(f"CAST({f('_end')} - {f('_start')} AS BIGINT)"))
        .drop("_end")
    )


def bucketed_shuffle_ranks(docs: DataFrame, order_col: str = "doc_id",
                           prefix_chars: int = 2) -> DataFrame:
    """(order_col, _key, _b, _r): md5 sort key, its prefix bucket, and the
    per-bucket rank — the pre-offset half of :func:`shuffle_positions`,
    exposed so tests can assert the plan (the window's hash exchange on
    ``_b``, never a SinglePartition sort) before the localCheckpoint
    truncates lineage."""
    key = F.md5(F.col(order_col).cast("string").cast("binary"))
    narrow = docs.select(order_col, key.alias("_key")).withColumn(
        "_b", F.conv(F.substring("_key", 1, prefix_chars), 16, 10)
        .cast("int"))
    w = Window.partitionBy("_b").orderBy("_key", order_col)
    return narrow.withColumn("_r", F.row_number().over(w))


def shuffle_positions(docs: DataFrame, order_col: str = "doc_id",
                      prefix_chars: int = 2) -> DataFrame:
    """Deterministic global training-data shuffle: assign every document
    a dense position 0..N-1 in md5-key order — a pseudorandom permutation
    of the corpus that any engine reproduces exactly (the key is
    md5(order_col), ties broken by order_col).

    Trainers need the corpus in a shuffled order that is stable across
    reruns and engines (resume mid-epoch, verify a data card).  The naive
    Spark plan — ``row_number() over (order by md5(id))`` — is a sort
    into ONE partition.  This uses the distributed-rank pattern with a
    twist that removes even the range-discovery pass: md5 keys are
    uniform on [0,16^32), so ordered disjoint buckets are simply the
    first ``prefix_chars`` hex digits of the key — no repartitionByRange,
    no sampling; the per-bucket window's hash exchange of the narrow
    (id, key) relation is the only shuffle.  Driver traffic is one row
    per bucket (256 for prefix_chars=2).

    Returns (order_col, _pos) with _pos a dense permutation of 0..N-1.
    Balanced shards follow as ``_pos div ceil(N/S)`` — exactly even by
    construction, unlike hash-mod assignment.  The reference
    (SylvainWT/docling-graph) is single-document and has no corpus
    ordering notion; this is the corpus-level shuffle a training
    pipeline needs."""
    local = bucketed_shuffle_ranks(
        docs, order_col, prefix_chars).localCheckpoint(eager=False)

    totals = local.groupBy("_b").agg(F.count("*").alias("_n")).collect()
    offsets, running = [], 0
    # bucket id == key prefix, so ascending bucket id IS ascending key
    # order — offsets need no per-bucket min-key lookup
    for row in sorted(totals, key=lambda r: r["_b"]):
        offsets.append((int(row["_b"]), running))
        running += int(row["_n"])
    spark = docs.sparkSession
    off_df = spark.createDataFrame(offsets or [], "_b int, _offset long")
    return (
        local.join(F.broadcast(off_df), "_b")
        .select(order_col,
                (F.col("_offset") + F.col("_r") - 1).alias("_pos"))
    )


def shuffle_shards(positions: DataFrame, n_total: int,
                   num_shards: int) -> DataFrame:
    """(order, _pos) -> + ``shuffle_shard``: exactly-balanced shard id
    from the dense shuffled position (sizes differ by at most 1).

    Proportional rule ``pos * S div N`` — NOT ``pos div ceil(N/S)``,
    which dumps the full remainder into the last shard (500 docs over 7
    shards: six of 72 and one of 68).  Int64-exact while
    ``N * S < 2^63``."""
    n = max(1, int(n_total))
    return positions.withColumn(
        "shuffle_shard",
        F.expr(f"(_pos * {int(num_shards)}) div {n}").cast("int"))
