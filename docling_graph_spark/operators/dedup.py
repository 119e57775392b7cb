"""Deduplication operators for a large-scale training-data pipeline.

Four near-duplicate families over the `documents` table, each expressed in
pure JVM-side DataFrame ops (no Python UDFs — the hashing primitive is
`F.md5`, available identically in every SQL engine, which keeps the DuckDB
oracles byte-compatible):

  * exact dedup           — hash-groupBy (queries.q_exact_dedup)
  * MinHash + LSH         — char-5-gram shingles → 16-perm MinHash signature
                            → 4×4 banding → bucket self-join → Jaccard verify
  * SimHash               — 32-bit signature from word-feature hash digits
  * n-gram Jaccard        — exact pairwise Jaccard via common-shingle join

Scale notes (100 TB design point):
  * shingling is a `transform(sequence(...))` projection — no shuffle (the
    higher-order function itself evaluates interpreted, but measured <10% of
    this operator family's cost; the hashing downstream is codegen'd); the
    only shuffles are the per-doc signature aggregation (map-side partial
    min/sum applies) and the band bucket join.
  * the LSH band join is the classic quadratic-blowup hazard: hot buckets
    (boilerplate-heavy docs) are bounded by `max_bucket` (buckets larger than
    the cap are dropped, as in production MinHash dedup systems — a bucket
    with thousands of docs is boilerplate, not near-duplication signal).
  * MinHash over k=16 permutations approximates Jaccard with σ≈0.25/√k;
    candidates are verified with the exact Jaccard join before any drop
    decision, so LSH errors only cost recall, never precision.

MinHash uses the affine universal-hash construction: one md5 per shingle
reduced to int64 mod P (P = 2^31-1), then perm_i = (A_i*h + B_i) mod P and
signature_i = min over the doc's shingles (see minhash_signatures).

Clustering: `connected_components` turns verified duplicate pairs into
duplicate clusters (min-label propagation) — the canonical-doc-per-cluster
decision needs components, not pairs.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_MINHASH = 16
N_BANDS = 4
ROWS_PER_BAND = N_MINHASH // N_BANDS
SHINGLE_LEN = 5
MAX_BUCKET = 64  # LSH buckets larger than this are boilerplate, not dups


def shingles(docs: DataFrame, key: str = "doc_id",
             text_col: str = "text", n: int = SHINGLE_LEN) -> DataFrame:
    """Distinct lowercase char n-gram shingles: (key, shingle).

    JVM-side via transform(sequence(...)); no extra shuffle on a well-split
    input.  The explode and the per-shingle hashing downstream run in the
    scan stage, so an under-split input is first spread over the cluster
    (see operators/partitioning.py).
    """
    from .partitioning import ensure_min_partitions

    docs = ensure_min_partitions(docs, key)
    norm = F.lower(F.col(text_col))
    grams = F.expr(
        f"transform(sequence(1, greatest(length(lower({text_col})) - {n - 1}, 1)),"
        f" i -> substr(lower({text_col}), i, {n}))"
    )
    return (
        docs.select(F.col(key), F.explode(F.array_distinct(grams)).alias("shingle"))
        .filter(F.length("shingle") > 0)
    )


MINHASH_P = 2147483647  # 2^31 - 1 (prime)
# deterministic affine-permutation coefficients, identical in the DuckDB
# oracles (queries._MINHASH_SIG)
MINHASH_A = [(2654435761 * (i + 1)) % MINHASH_P for i in range(N_MINHASH)]
MINHASH_B = [(40503 * (i + 7) + 12345) % MINHASH_P for i in range(N_MINHASH)]


def minhash_base_expr(shingle_col):
    """One base hash per shingle: the top 60 bits of md5 as a bigint, reduced
    mod P.  Everything downstream is integer arithmetic."""
    return (
        F.conv(F.substring(F.md5(shingle_col), 1, 15), 16, 10)
        .cast("long") % F.lit(MINHASH_P)
    )


def minhash_signatures(sh: DataFrame, key: str = "doc_id",
                       k: int = N_MINHASH) -> DataFrame:
    """Per-doc MinHash signature: columns mh0..mh{k-1} (bigint minima).

    One md5 per shingle, then k affine permutations
    ``(A_i * h + B_i) mod P`` — the standard universal-hash construction.
    The naive alternative (k md5's per shingle) measured ~6x slower at
    sf0.1: hashing cost dominates this operator, and arithmetic permutations
    stay in whole-stage codegen at a few ns each.  A_i < P and h < P keep
    the product under 2^62: no 64-bit overflow, so Spark and DuckDB compute
    bit-identical values.

    One shuffle (groupBy key) with map-side partial min — the partial/final
    split means executors combine locally before exchanging, so shuffle
    bytes are O(docs × k × 8B) regardless of shingle volume.
    """
    base = minhash_base_expr(F.col("shingle")).alias("h")
    hashed = sh.select(key, base).select(
        key,
        *[
            ((F.lit(MINHASH_A[i]) * F.col("h") + F.lit(MINHASH_B[i]))
             % F.lit(MINHASH_P)).alias(f"h{i}")
            for i in range(k)
        ],
    )
    return hashed.groupBy(key).agg(
        *[F.min(f"h{i}").alias(f"mh{i}") for i in range(k)]
    )


def lsh_bands(signatures: DataFrame, key: str = "doc_id",
              bands: int = N_BANDS, rows: int = ROWS_PER_BAND) -> DataFrame:
    """Unpivot the signature into (key, band, bucket) rows.

    bucket = the band's signature rows joined as a string (grouping key only
    — equality is what matters, so no extra hash pass); two docs landing in
    the same (band, bucket) are LSH candidates.
    """
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|",
                *[F.col(f"mh{b * rows + r}").cast("string")
                  for r in range(rows)]
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    return signatures.select(
        key, F.explode(F.array(*band_cols)).alias("bb")
    ).select(key, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def lsh_candidate_pairs(band_rows: DataFrame, key: str = "doc_id",
                        max_bucket: int = MAX_BUCKET) -> DataFrame:
    """Self-join within (band, bucket) → distinct candidate (doc_a, doc_b).

    Hot-bucket guard: buckets with > max_bucket members are dropped before
    the join (quadratic blowup control — at web scale a giant bucket is
    boilerplate, and boilerplate removal is the extractor's job, not dedup's).
    """
    sized = band_rows.withColumn(
        "bsz", F.count("*").over(Window.partitionBy("band", "bucket"))
    ).filter(F.col("bsz") <= max_bucket)
    a = sized.select(F.col(key).alias("doc_a"), "band", "bucket")
    b = sized.select(F.col(key).alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_verify(pairs: DataFrame, sh: DataFrame,
                   key: str = "doc_id") -> DataFrame:
    """Exact Jaccard for candidate pairs via common-shingle equi-join.

    Returns (doc_a, doc_b, jaccard_pct) with jaccard_pct = floor(100·|A∩B| /
    |A∪B|) — integer-exact, so the DuckDB oracle hashes identically.
    """
    sizes = sh.groupBy(key).agg(F.count("*").alias("sz"))
    sa = sh.select(F.col(key).alias("doc_a"), "shingle")
    sb = sh.select(F.col(key).alias("doc_b"), "shingle")
    common = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    za = sizes.select(F.col(key).alias("doc_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col(key).alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.floor(
                F.lit(100) * F.col("common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
            ).cast("long").alias("jaccard_pct"),
        )
    )


def minhash_lsh_dedup(docs: DataFrame, key: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Full MinHash→LSH→verify pipeline; all candidate pairs + exact Jaccard.

    The shingle relation feeds both the signature pass and the Jaccard
    verify join and is deliberately NOT persisted: it is ~2000x the input
    row count of short strings, and caching it measured 2x slower than
    recomputing the projection (cache serialization dominates).  At
    production scale the same trade favors recompute-from-columnar-scan."""
    sh = shingles(docs, key, text_col)
    sigs = minhash_signatures(sh, key)
    cands = lsh_candidate_pairs(lsh_bands(sigs, key), key)
    return jaccard_verify(cands, sh, key)


def simhash_column(docs: DataFrame, key: str = "doc_id",
                   text_col: str = "text", bits: int = 32) -> DataFrame:
    """Per-doc SimHash as a `bits`-char bitstring: (key, simhash).

    Features = distinct lowercase words; bit i votes +1 when the i-th hex
    digit of md5(word) is >= '8' (top half of the digit's 4-bit value), -1
    otherwise; bit set when the vote sum is positive.  32 bits uses the full
    md5 hex width; identical construction runs verbatim in the SQL oracle.
    """
    from .partitioning import ensure_min_partitions

    assert bits <= 32
    docs = ensure_min_partitions(docs, key)
    words = docs.select(
        key,
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), "[^a-z]+"))
        ).alias("w"),
    ).filter(F.length("w") > 0)
    digest = F.md5(F.col("w"))
    votes = words.groupBy(key).agg(
        *[
            F.sum(
                F.when(F.substring(digest, i + 1, 1) >= "8", 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(bits)
        ]
    )
    bitstr = F.concat(
        *[F.when(F.col(f"v{i}") > 0, "1").otherwise("0") for i in range(bits)]
    )
    return votes.select(key, bitstr.alias("simhash"))


def fingerprints(docs: DataFrame, key: str = "doc_id",
                 text_col: str = "text", mod_hex_prefix: str = "0") -> DataFrame:
    """MOD-p document fingerprinting (the scalable cousin of winnowing):

    keep the shingles whose md5 starts with `mod_hex_prefix` — a deterministic
    1/16 content-defined sample, stable under edits outside the sampled
    k-grams.  Returns (key, fp) rows where fp is the shingle's md5.
    """
    sh = shingles(docs, key, text_col)
    fp = F.md5(F.col("shingle"))
    return (
        sh.select(key, fp.alias("fp"))
        .filter(F.col("fp").startswith(mod_hex_prefix))
        .distinct()
    )


def _union_find_components(edge_rows, spark) -> DataFrame:
    """Driver-side union-find for a small edge relation (min-label
    canonicalization, same contract as the distributed path)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for src, dst in edge_rows:
        parent.setdefault(src, src)
        parent.setdefault(dst, dst)
        ra, rb = find(src), find(dst)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    labels = [(x, find(x)) for x in parent]
    return spark.createDataFrame(labels, ["id", "component"])


def connected_components(pairs: DataFrame, key_a: str = "doc_a",
                         key_b: str = "doc_b",
                         max_iterations: int = 20,
                         driver_threshold: int = 100_000) -> DataFrame:
    """Near-duplicate clustering: connected components over a pair relation,
    labels = min member id per component.  Returns (id, component).

    The canonical-document decision of a dedup pipeline ("keep one doc per
    duplicate cluster") needs components, not pairs — pairwise drops lose
    transitive duplicates (a~b, b~c, a!~c).

    Algorithm: min-label propagation with pointer jumping (in the spirit of
    the large-star/small-star map-reduce CC construction — Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14): every node
    starts labelled with itself; each round every node takes the min label
    over its closed neighborhood AND over its current label's label (the
    pointer-jump step, which halves label-chain depth and makes rounds
    O(log diameter) — a path graph longer than the round budget would never
    converge under plain neighbor-min).  Converged when no label changes.
    Duplicate clusters are near-cliques from LSH buckets, so 2-4 rounds in
    practice.  Each round is two shuffles (neighbor groupBy + label join);
    the convergence check reuses the round's aggregate — an O(1)-row driver
    read, not a collect of the relation.
    """
    edges = (
        pairs.select(F.col(key_a).alias("src"), F.col(key_b).alias("dst"))
        .unionAll(
            pairs.select(F.col(key_b).alias("src"), F.col(key_a).alias("dst"))
        )
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("component", F.col("id"))
    )
    edges.persist()
    # Scale-adaptive strategy (AQE spirit: pick the physical plan from the
    # materialized size).  The edge relation is already persisted, so the
    # count is one cheap pass over cached partitions.  Duplicate-pair
    # relations are tiny relative to the corpus (pairs survive LSH banding
    # AND a Jaccard verify); below the threshold a driver union-find beats
    # ~4 shuffle rounds x 4 stages of fixed latency by orders of magnitude.
    # Above it, the distributed pointer-jumping loop below handles the
    # billion-pair regime — same contract, property-tested equal.
    n_edges = edges.count()
    if n_edges <= driver_threshold:
        small = _union_find_components(
            [(r["src"], r["dst"]) for r in edges.collect()],
            pairs.sparkSession,
        )
        edges.unpersist()
        return small
    # iterative algorithms grow the logical plan exponentially (each round's
    # self-joins reference the previous round's whole lineage) — truncate it
    # every round with an eager localCheckpoint, the standard Spark pattern
    # for loops (persist alone keeps the lineage and OOMs the driver on plan
    # processing after ~10 rounds)
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src").agg(F.min("component").alias("nbr_min"))
        )
        stepped = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
            )
        )
        # pointer jump: component <- min(component, label(component))
        parent = stepped.select(
            F.col("id").alias("pid"), F.col("component").alias("pcomp")
        )
        new_labels = (
            stepped.join(parent, stepped.component == parent.pid, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("pcomp"), F.col("component")),
                ).alias("component"),
            )
        )
        new_labels = (
            new_labels.alias("n")
            .join(labels.select(F.col("id").alias("oid"),
                                F.col("component").alias("ocomp")),
                  F.col("n.id") == F.col("oid"))
            .select("id", "component",
                    (F.col("component") < F.col("ocomp")).alias("changed"))
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.agg(
            F.sum(F.when(F.col("changed"), 1).otherwise(0))
        ).collect()[0][0]
        labels = new_labels.drop("changed")
        if not changed:
            break
    edges.unpersist()
    return labels


# ---------------------------------------------------------------------------
# word-n-gram family: benchmark decontamination + exact duplicated-substring
# detection (Lee et al. 2021, "Deduplicating Training Data Makes Language
# Models Better" — n-gram-granular approximation of the suffix-array method,
# which is the shape that distributes: grouping equal n-grams is a single
# shuffle, where a true distributed suffix array is multiple sort rounds).

DECONTAM_NGRAM = 8
"""Word n-gram width used by the test fixtures.

Production decontamination convention is 13-gram overlap (GPT-3 appendix C /
PaLM section 8); the synthetic corpus median document is ~56 words, so the
fixtures use 8 to keep every document eligible.  Both operators take ``n``."""


def word_ngrams(docs: DataFrame, key: str = "doc_id",
                text_col: str = "text",
                n: int = DECONTAM_NGRAM) -> DataFrame:
    """Positional word n-grams: (key, pos, gram) with pos 1-based.

    Tokenization is lowercase + split on non-alphanumeric runs — entirely
    JVM-side (split/filter/transform/slice higher-order functions), no
    Python.  Documents shorter than ``n`` tokens yield no rows.  The
    CASE guard matters: ``sequence(1, 0)`` in Spark counts DOWN (step -1),
    so the transform must be gated on size >= n rather than clamped.
    """
    from .partitioning import ensure_min_partitions

    docs = ensure_min_partitions(docs, key)
    toks = F.expr(
        f"filter(split(lower({text_col}), '[^a-z0-9]+'), t -> t <> '')")
    base = docs.select(F.col(key), toks.alias("_toks"))
    grams = F.expr(
        f"CASE WHEN size(_toks) >= {n} THEN "
        f"transform(sequence(1, size(_toks) - {n - 1}), "
        f"          i -> array_join(slice(_toks, i, {n}), ' ')) "
        f"ELSE array() END"
    )
    return (
        base.select(F.col(key), F.posexplode(grams).alias("_p", "gram"))
        .select(F.col(key), (F.col("_p") + 1).alias("pos"), "gram")
    )


def decontaminate(train: DataFrame, eval_docs: DataFrame,
                  key: str = "doc_id", text_col: str = "text",
                  n: int = DECONTAM_NGRAM,
                  min_overlap: int = 1) -> DataFrame:
    """Benchmark decontamination: flag training documents that share word
    n-grams with an evaluation set (the GPT-3/PaLM 13-gram-collision rule).

    Returns one row per training document:
    (key, overlap_grams = count of DISTINCT eval n-grams present,
     contaminated = overlap_grams >= min_overlap).

    Scale shape: the eval side is small by definition (benchmarks are
    O(100k) docs), so its distinct gram set is broadcast — the 100 TB
    training side is never shuffled by the probe; the only wide exchange is
    the per-doc overlap aggregation, which carries only matching rows
    (a tiny fraction of the corpus).  For eval sets too large to broadcast
    raw, hash grams to int64 first (same md5-prefix trick as MinHash) to
    shrink the broadcast ~10x.
    """
    tg = word_ngrams(train, key, text_col, n)
    eg = word_ngrams(eval_docs, key, text_col, n).select("gram").distinct()
    per = (
        tg.join(F.broadcast(eg), "gram")
        .groupBy(key)
        .agg(F.countDistinct("gram").alias("overlap_grams"))
    )
    return (
        train.select(key).join(per, key, "left")
        .select(
            F.col(key),
            F.coalesce("overlap_grams", F.lit(0)).alias("overlap_grams"),
            (F.coalesce("overlap_grams", F.lit(0)) >= min_overlap)
            .alias("contaminated"),
        )
    )


def duplicated_spans(docs: DataFrame, key: str = "doc_id",
                     text_col: str = "text",
                     n: int = DECONTAM_NGRAM) -> Tuple[DataFrame, DataFrame]:
    """Exact duplicated-substring detection at n-gram granularity.

    A gram is *duplicated* when it occurs in >= 2 distinct documents (the
    cross-document clause of Lee et al.'s ExactSubstr; within-doc repeats
    alone don't count).  Returns (per_gram, per_doc):

      per_gram: (gram, n_docs, n_occ) for duplicated grams only;
      per_doc:  (key, n_grams, dup_grams) — total gram occurrences and how
                many of them are duplicated, per document (dup_grams /
                n_grams is the doc's duplicated-text fraction).

    Scale shape: two hash aggregations (gram×doc, then gram — both with
    map-side partial aggregation) plus one equi-join of the positional gram
    stream against the duplicated-gram relation.  No quadratic pair blowup:
    a gram shared by k documents costs k rows, not k², which is what makes
    this the distributed-friendly stand-in for a suffix array.
    """
    g = word_ngrams(docs, key, text_col, n)
    per_doc_gram = g.groupBy("gram", key).agg(F.count("*").alias("occ"))
    per_gram = (
        per_doc_gram.groupBy("gram")
        .agg(F.count("*").alias("n_docs"), F.sum("occ").alias("n_occ"))
        .filter(F.col("n_docs") >= 2)
    )
    per_doc = (
        per_doc_gram.join(per_gram.select("gram"), "gram", "left_semi")
        .groupBy(key).agg(F.sum("occ").alias("dup_grams"))
    )
    totals = g.groupBy(key).agg(F.count("*").alias("n_grams"))
    per_doc = (
        totals.join(per_doc, key, "left")
        .select(F.col(key), "n_grams",
                F.coalesce("dup_grams", F.lit(0)).alias("dup_grams"))
    )
    return per_gram, per_doc


def excise_dup_spans(docs: DataFrame, key: str = "doc_id",
                     text_col: str = "text",
                     n: int = DECONTAM_NGRAM) -> DataFrame:
    """ExactSubstr *removal* (Lee et al. 2021 §4.1): rewrite every document
    with its non-canonical duplicated spans excised, keeping exactly the
    first corpus-wide occurrence of each duplicated n-gram.

    Semantics (deterministic, engine-independent — mirrored 1:1 by the
    DuckDB oracle):

    * a gram is duplicated when it occurs in >= 2 distinct documents;
    * its canonical occurrence is (fdoc, fpos) = the min ``key`` holding
      it, then the min position within that document;
    * every other occurrence is removable; a word index is removed when
      ANY removable occurrence covers it (occurrence at pos covers words
      [pos, pos+n));
    * the rewrite keeps the surviving *normalized* tokens (lowercase,
      split on non-alphanumeric runs — the same token stream the grams
      were built from) joined by single spaces.  A production excision
      maps token indexes back to original byte offsets via the span
      machinery; the normalized form is what both engines can rebuild
      byte-identically, which is what the oracle gate hashes.

    Returns (key, n_words, n_removed, rebuilt) — one row per input doc,
    including untouched and empty ones.

    Scale shape: the gram side is the same two hash aggregations as
    :func:`duplicated_spans` plus two equi-joins (gram -> first doc ->
    first pos); the rewrite itself never shuffles words — removed indexes
    collapse to one small array per doc (bounded by doc length) and the
    token filter is a codegen'd higher-order expression over the in-row
    token array, so the heavy side moves through exactly one
    ``collect_set`` aggregation keyed by ``key``.
    """
    g = word_ngrams(docs, key, text_col, n)  # (key, pos, gram)
    dup = (
        g.groupBy("gram")
        .agg(F.countDistinct(key).alias("_nd"), F.min(key).alias("_fdoc"))
        .filter(F.col("_nd") >= 2)
        .select("gram", "_fdoc")
    )
    occ = g.join(dup, "gram")  # (gram, key, pos, _fdoc)
    fpos = (
        occ.filter(F.col(key) == F.col("_fdoc"))
        .groupBy("gram").agg(F.min("pos").alias("_fpos"))
    )
    removable = occ.join(fpos, "gram").filter(
        ~((F.col(key) == F.col("_fdoc")) & (F.col("pos") == F.col("_fpos")))
    )
    covered = removable.select(
        F.col(key),
        F.explode(F.sequence(F.col("pos"),
                             F.col("pos") + F.lit(n - 1))).alias("_widx"),
    )
    rm = covered.groupBy(key).agg(F.collect_set("_widx").alias("_rm"))
    # NULL text ⇒ zero tokens (size(NULL array) is -1 in Spark; the oracle's
    # NULL n_words is sum-skipped, which equals adding this 0)
    toks = F.expr(
        f"filter(split(lower(coalesce({text_col}, '')), '[^a-z0-9]+'),"
        f" t -> t <> '')")
    base = docs.select(F.col(key), toks.alias("_toks"))
    out = base.join(rm, key, "left").withColumn(
        "_rm", F.coalesce("_rm", F.expr("array()").cast("array<int>")))
    kept = F.expr(
        "transform(filter(transform(_toks, (t, i) -> "
        "  struct(t AS t, i + 1 AS ix)), "
        "  s -> NOT array_contains(_rm, s.ix)), s -> s.t)"
    )
    return out.select(
        F.col(key),
        F.size("_toks").cast("long").alias("n_words"),
        F.size("_rm").cast("long").alias("n_removed"),
        F.array_join(kept, " ").alias("rebuilt"),
    )
