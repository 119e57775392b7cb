"""Corpus-preparation operators a web-scale training-data pipeline needs
before extraction: PII redaction, C4-style line-level dedup accounting, and
host blocklist filtering.

All JVM-side (`pyspark.sql.functions` only — no Python in the row path).
Regex patterns stay inside the Java-regex ∩ RE2 common subset (no
lookaround, bounded classes) so the DuckDB oracles run the literal same
patterns.

These are rebuild-only additions (the reference is a single-document tool
with no corpus stage); they slot between the Iceberg scan and the
extraction UDFs of the flagship pipeline, where dropping/cleaning a row is
1000x cheaper than parsing it.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex ∩ RE2 portable patterns
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b555-[0-9]{4}\b"          # NANP fictional exchange
IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"

PII_KINDS = (
    ("email", EMAIL_RE, "[EMAIL]"),
    ("phone", PHONE_RE, "[PHONE]"),
    ("ip", IPV4_RE, "[IP]"),
)


def pii_counts(text: Column) -> dict:
    """Per-kind match-count columns for one text column."""
    return {
        kind: F.size(F.regexp_extract_all(text, F.lit(pattern), 0))
        for kind, pattern, _tok in PII_KINDS
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its kind token, email -> phone -> ip
    order (emails first so user@host strings never half-match as hosts)."""
    out = text
    for _kind, pattern, token in PII_KINDS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_redaction_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus totals: per-kind match counts, docs touched, and the net
    character delta of redaction (negative when tokens are shorter)."""
    text = F.col(text_col)
    counts = pii_counts(text)
    any_pii = sum(counts.values(), F.lit(0)) > 0
    delta = F.length(redact_pii(text)) - F.length(text)
    return df.select(
        *[c.alias(f"n_{k}") for k, c in counts.items()],
        any_pii.cast("long").alias("has_pii"),
        delta.cast("long").alias("delta"),
    ).agg(
        F.sum("n_email").alias("n_emails"),
        F.sum("n_phone").alias("n_phones"),
        F.sum("n_ip").alias("n_ips"),
        F.sum("has_pii").alias("docs_with_pii"),
        F.sum("delta").alias("chars_delta"),
    )


def line_dedup_stats(df: DataFrame, lines_col: Column,
                     min_repeat: int = 2) -> DataFrame:
    """C4-style line-level dedup accounting over an array-of-lines column:
    keep the first occurrence of every distinct line corpus-wide, drop the
    rest.  Returns one row of totals — lines seen, distinct kept, removed
    (= sum over duplicate groups of count-1), and the hottest line's
    repeat count (boilerplate detector).

    The groupBy(line) shuffle is the same partial/final aggregate Spark
    uses for any count-distinct; at 10^12 rows the line hash, not the line
    text, would be the shuffle key (`F.xxhash64` pre-hash) — counts are
    identical, shuffle bytes ~50x smaller.
    """
    lines = df.select(F.explode(lines_col).alias("line"))
    per_line = lines.groupBy("line").agg(F.count("*").alias("cnt"))
    return per_line.agg(
        F.sum("cnt").alias("total_lines"),
        F.count("*").alias("distinct_lines"),
        F.sum(F.col("cnt") - 1).alias("lines_removed"),
        F.max("cnt").alias("max_line_repeat"),
        F.sum(F.when(F.col("cnt") >= min_repeat, 1).otherwise(0))
        .alias("boilerplate_lines"),
    )


def host_blocklist_split(pages: DataFrame,
                         blocked_hosts: Sequence[str],
                         url_col: str = "url") -> DataFrame:
    """Broadcast blocklist filter: semi/anti join the corpus against a tiny
    blocked-host dimension (the J1 left_semi/left_anti pair on a derived
    key).  Returns one row: kept/dropped doc counts and the distinct host
    count on each side.  At scale the blocklist is a broadcast of a few MB
    against 10^12 rows — no shuffle of the big side (plan-asserted in
    tests)."""
    spark = pages.sparkSession
    block = F.broadcast(
        spark.createDataFrame([(h,) for h in blocked_hosts], ["blocked_host"])
    )
    hosts = pages.select(F.parse_url(F.col(url_col), F.lit("HOST"))
                         .alias("host"))
    kept = hosts.join(block, hosts.host == block.blocked_host, "left_anti")
    dropped = hosts.join(block, hosts.host == block.blocked_host, "left_semi")
    k = kept.agg(F.count("*").alias("kept_docs"),
                 F.countDistinct("host").alias("kept_hosts"))
    d = dropped.agg(F.count("*").alias("dropped_docs"),
                    F.countDistinct("host").alias("dropped_hosts"))
    return k.crossJoin(d)
