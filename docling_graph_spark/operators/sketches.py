"""Deterministic HyperLogLog registers — the mergeable distinct-count
sketch (Flajolet et al. 2007) built from md5 so the identical register
array is reproducible on any engine, cluster size, or partitioning.

Spark's own ``approx_count_distinct`` is HLL++ with an
implementation-defined hash, so its state can't be oracle-checked.
THIS sketch derives every register from portable primitives (md5 hex →
60-bit int; bucket = low bits, rho = leading-zero rank of the high bits
via the binary-string trick ``length(ltrim(bin(w), '0'))`` — available
verbatim in both Spark and DuckDB), making the full register array
byte-comparable across engines.

Why registers, not the estimate: the REGISTER ARRAY is the sketch — the
mergeable state a 1000-executor job combines with a per-bucket max (one
map-side-combinable groupBy; union-then-sketch == sketch-then-merge,
unit-proven).  The cardinality estimate is a tiny client-side formula
over 256 integers; keeping it out of the gate keeps the oracle exact
(the harmonic-mean step needs floats).

estimate(): the standard bias-corrected HLL formula with
linear-counting fallback, provided for callers; deterministic given the
registers.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_P = 8                 # 2^8 = 256 registers
HLL_M = 1 << HLL_P
_HASH_HEX = 15            # 60-bit hash (15 hex chars: sign-safe in int64)
_W_BITS = 60 - HLL_P      # bits feeding the leading-zero rank


def hll_register_rows(df: DataFrame, value: Column,
                      *group_cols: str) -> DataFrame:
    """(group..., bucket, register): per-bucket max rho.  One groupBy —
    partial max on the map side means each executor sends at most
    m rows per group regardless of input size (the sketch property)."""
    h = F.conv(F.substring(F.md5(value.cast("binary")), 1, _HASH_HEX),
               16, 10).cast("long")
    bucket = (h % HLL_M).cast("int")
    # high bits feed the rank: rho = field_width - bitlen(w) + 1, with
    # bitlen from the binary-string trick (bin(0) = "0" strips to '',
    # giving rho = field_width + 1 — the all-zeros convention)
    w = F.floor(h / HLL_M).cast("long")
    bitlen = F.length(F.regexp_replace(F.bin(w), "^0+", ""))
    rho_col = (F.lit(_W_BITS + 1) - bitlen).cast("int")
    return (
        df.select(*group_cols, bucket.alias("bucket"),
                  rho_col.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").cast("int").alias("register"))
    )


def hll_stats(df: DataFrame, value: Column,
              *group_cols: str) -> DataFrame:
    """Per-group register rollup: (group..., hll_m, hll_nonzero,
    hll_regsum, hll_checksum) — nonzero register count (drives the
    linear-counting range), register sum, and a 48-bit md5-prefix
    checksum over every bucket:register pair (gates the exact sketch
    state, order-independent)."""
    regs = hll_register_rows(df, value, *group_cols)
    pair_md5 = F.md5(F.concat(
        F.col("bucket").cast("string"), F.lit(":"),
        F.col("register").cast("string")).cast("binary"))
    return regs.groupBy(*group_cols).agg(
        F.lit(HLL_M).cast("long").alias("hll_m"),
        F.count("*").cast("long").alias("hll_nonzero"),
        F.sum("register").cast("long").alias("hll_regsum"),
        F.sum(F.conv(F.substring(pair_md5, 1, 12), 16, 10).cast("long"))
        .cast("long").alias("hll_checksum"),
    )


def merge_registers(reg_lists: Sequence[dict]) -> dict:
    """Driver-side register merge (per-bucket max) — the associative
    combine a multi-shard job applies; used by tests to prove
    sketch(A ∪ B) == merge(sketch(A), sketch(B))."""
    out: dict = {}
    for regs in reg_lists:
        for b, r in regs.items():
            if r > out.get(b, 0):
                out[b] = r
    return out


def estimate(registers: dict, m: int = HLL_M) -> float:
    """Bias-corrected HLL estimate with the small-range linear-counting
    fallback.  Client-side convenience over the oracle-gated registers."""
    import math

    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -registers.get(b, 0) for b in range(m))
    e = alpha * m * m / s
    zeros = m - sum(1 for r in registers.values() if r > 0)
    if e <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return e


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode-Muthukrishnan 2005) — the mergeable FREQUENCY
# sketch next to HLL's distinct-count one.  Counters are plain sums, so
# the register table is commutative/associative: byte-identical on any
# engine, cluster size, or partitioning (merge = cellwise add, proven in
# tests).  Hashes are md5-derived like the HLL's, so a DuckDB oracle
# reproduces the exact state.  The structural guarantee — estimates never
# UNDER-count — is exercised against exact counts, not assumed.
# ---------------------------------------------------------------------------

CMS_D = 4    # hash rows
CMS_W = 64   # counters per row


def _cms_col(row: Column, value: Column) -> Column:
    """Counter column for hash row j: 48-bit md5 prefix of 'j:value'
    mod W — portable to any engine with md5."""
    h = F.conv(F.substring(F.md5(F.concat(
        row.cast("string"), F.lit(":"), value).cast("binary")), 1, 12),
        16, 10).cast("long")
    return (h % CMS_W).cast("int")


def cms_register_rows(counted: DataFrame, value_col: str, weight_col: str,
                      *group_cols: str) -> DataFrame:
    """(group..., j, col, counter) from a pre-aggregated (value, weight)
    relation — sketching the aggregate is identical to sketching the raw
    stream (counters are sums) but moves d× row inflation AFTER the
    map-side combine."""
    j = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("j")
    rows = counted.select(*group_cols, F.col(weight_col).alias("w"),
                          j, F.col(value_col).alias("v"))
    return (rows.select(*group_cols, "j",
                        _cms_col(F.col("j"), F.col("v")).alias("col"), "w")
            .groupBy(*group_cols, "j", "col")
            .agg(F.sum("w").cast("long").alias("counter")))


def cms_estimates(registers: DataFrame, keys: DataFrame, value_col: str,
                  *group_cols: str) -> DataFrame:
    """Point queries: (group..., value, estimate) with estimate =
    min over hash rows of the addressed counter — the CM upper bound."""
    j = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("j")
    probes = keys.select(*group_cols, F.col(value_col).alias("v")) \
        .withColumn("j", j) \
        .withColumn("col", _cms_col(F.col("j"), F.col("v")))
    return (probes.join(registers, [*group_cols, "j", "col"])
            .groupBy(*group_cols, "v")
            .agg(F.min("counter").cast("long").alias("estimate"))
            .withColumnRenamed("v", value_col))


# ---------------------------------------------------------------------------
# KMV / Theta bottom-k distinct sketch with set operations
# ---------------------------------------------------------------------------

KMV_K = 32
_KMV_HEX = 12             # 48-bit hash values (12 hex chars)
KMV_SPACE = 1 << 48


def _kmv_hash(value: Column) -> Column:
    return F.conv(F.substring(F.md5(value.cast("binary")), 1, _KMV_HEX),
                  16, 10).cast("long")


def _bottom_k(hashed: DataFrame, group_col: str, k: int) -> DataFrame:
    """k smallest DISTINCT hv per group, ranked — the one bottom-k
    window both the per-set sketches and the union merge share."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy("hv")
    return (hashed.select(group_col, "hv").distinct()
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def kmv_sketch(df: DataFrame, value: Column, group_col: str,
               k: int = KMV_K) -> DataFrame:
    """Bottom-k / k-minimum-values distinct sketch (Bar-Yossef et al.
    2002; the Theta-sketch state, Dasgupta et al. 2016): per group, the
    ``k`` smallest DISTINCT 48-bit md5 hash values of the column, as
    rows (group, rank, hv).

    Unlike HLL this sketch supports INTERSECTION estimates (and any set
    expression) because it keeps a uniform hash sample below a
    threshold, not lossy registers.  Hashes are md5-derived like the
    HLL/CMS sketches, so the identical value set is reproducible on any
    engine/partitioning and the oracle can compare full sketch state.

    Plan: one distinct (map-side combinable) then a per-group bottom-k
    window over DISTINCT HASHES.  At 100 TB the windowed set is bounded
    the same way shuffle_positions bounds its sort: hash uniformity
    means a static prefix filter ``hv < t`` (t sized from a cardinality
    floor, t >> k * SPACE / N) keeps the window input tiny without
    affecting the bottom-k; the unfiltered form here is the
    small-SF/oracle-exact shape."""
    hashed = df.select(F.col(group_col), _kmv_hash(value).alias("hv"))
    return (_bottom_k(hashed, group_col, k)
            .select(group_col, F.col("rank").cast("long").alias("rank"),
                    "hv"))


def kmv_set_stats(df_a: DataFrame, df_b: DataFrame, value_col: str,
                  group_col: str, k: int = KMV_K) -> DataFrame:
    """Per-group KMV sketches of two sets A and B plus set-operation
    estimates — the crawl-snapshot overlap question ("how many urls do
    two crawls share?") answered from two k-row sketches instead of a
    full distinct join.

    Returns one row per group:
      kmv_k, kmv_union_n (union-sketch fill), kmv_common (sketch values
      in both sets), kmv_theta (union-sketch max hash), kmv_a_est,
      kmv_b_est, kmv_union_est, kmv_inter_est, kmv_checksum (48-bit
      md5 rollup of the union-sketch state — the mergeable state the
      gate compares).

    Estimator (exact int64 arithmetic, engine-identical): with hashes
    uniform in [0, 2^48), a full sketch's k-th minimum theta gives
    est = (k-1) * 2^48 div theta; an unfilled sketch IS the distinct
    value set, so est = n exactly.  The union sketch is the bottom-k of
    the two sketches' value union (all of A∪B's bottom-k hashes lie
    below both thetas); intersection membership is testable against the
    per-set SKETCHES alone (v <= theta_union <= theta_a), giving
    est_inter = common * est_union div k — the standard Theta-sketch
    a-not-b/intersect scheme.  Every post-sketch relation is k rows per
    group: the joins below are broadcast-sized no matter the corpus."""
    sa = kmv_sketch(df_a, F.col(value_col), group_col, k)
    sb = kmv_sketch(df_b, F.col(value_col), group_col, k)

    def agg_sketch(s: DataFrame, name: str) -> DataFrame:
        return s.groupBy(group_col).agg(
            F.count("*").cast("long").alias(f"{name}_n"),
            F.max("hv").alias(f"{name}_theta"))

    merged = (sa.select(group_col, "hv")
              .unionByName(sb.select(group_col, "hv")))
    su = _bottom_k(merged, group_col, k)
    flagged = (su
               .join(sa.select(group_col, "hv",
                               F.lit(1).alias("in_a")),
                     [group_col, "hv"], "left")
               .join(sb.select(group_col, "hv",
                               F.lit(1).alias("in_b")),
                     [group_col, "hv"], "left"))
    cell_md5 = F.md5(F.concat(F.col("rank").cast("string"), F.lit(":"),
                              F.col("hv").cast("string")).cast("binary"))
    u_agg = flagged.groupBy(group_col).agg(
        F.count("*").cast("long").alias("u_n"),
        F.max("hv").alias("u_theta"),
        F.sum((F.coalesce(F.col("in_a"), F.lit(0))
               * F.coalesce(F.col("in_b"), F.lit(0))).cast("long"))
        .cast("long").alias("n_common"),
        F.sum(F.conv(F.substring(cell_md5, 1, 12), 16, 10).cast("long"))
        .cast("long").alias("kmv_checksum"))

    num = (k - 1) * KMV_SPACE

    def est(n: str, theta: str) -> Column:
        return F.when(F.col(n) < k, F.col(n)).otherwise(
            F.expr(f"{num}L div {theta}")).cast("long")

    # left joins + empty-side coalesce: a group present in only one set
    # still gets a row (its absent side estimates 0; n=0 < k takes the
    # exact branch, so the theta column is never read there)
    joined = (u_agg.join(agg_sketch(sa, "a"), group_col, "left")
              .join(agg_sketch(sb, "b"), group_col, "left")
              .na.fill({"a_n": 0, "b_n": 0, "a_theta": 0, "b_theta": 0})
              .withColumn("union_est", est("u_n", "u_theta")))
    # standard Theta-sketch combination: n_common * est_union / (k - 1)
    # — the same (k - 1) the union estimator uses, so the two estimates
    # are internally consistent (dividing by k instead biases the
    # intersection low by (k-1)/k, ~3% at k=32)
    inter = F.when(F.col("u_n") < k, F.col("n_common")).otherwise(
        F.expr(f"(n_common * union_est) div {k - 1}")).cast("long")
    return joined.select(
        group_col, F.lit(k).cast("long").alias("kmv_k"),
        F.col("u_n").alias("kmv_union_n"),
        F.col("n_common").alias("kmv_common"),
        F.col("u_theta").alias("kmv_theta"),
        est("a_n", "a_theta").alias("kmv_a_est"),
        est("b_n", "b_theta").alias("kmv_b_est"),
        F.col("union_est").alias("kmv_union_est"),
        inter.alias("kmv_inter_est"),
        "kmv_checksum")
