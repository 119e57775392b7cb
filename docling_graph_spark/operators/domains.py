"""Registrable-domain (eTLD+1) extraction and per-suffix rollups.

Host-level grouping is wrong for quotas, blocklists, and spam scoring:
``a.blogspot.com`` and ``b.blogspot.com`` are different sites while
``www.bbc.co.uk`` and ``news.bbc.co.uk`` are the same one.  Every crawl
pipeline normalizes hosts to the *registrable domain* — the label
directly under the longest matching public suffix (the PSL algorithm).

Scale design
------------
The suffix list is a few thousand entries in the real PSL; here a
representative subset ships as a LITERAL ARRAY inside the expression, so
matching runs entirely in whole-stage codegen — no join, no UDF, no
broadcast table to manage.  Longest-match selection uses a sortable
fixed-width key (label-count, length, suffix) and ``array_max``, the
same pure-expression trick on both engines.  Unknown TLDs fall back to
the last label (the PSL ``*`` default rule).  The rollup is one
map-side-combinable aggregation keyed by suffix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# representative public-suffix subset: generic TLDs, ccTLDs, and the
# multi-label country suffixes that make naive "last two labels" wrong
PUBLIC_SUFFIXES = (
    "com", "org", "net", "io", "dev", "app", "gov", "edu", "info",
    "de", "fr", "es", "it", "nl", "jp", "cn", "uk", "au", "br", "in",
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ac.jp", "ne.jp", "com.br", "com.cn", "co.in",
)


def _suffix_key(s: Column) -> Column:
    """Sortable fixed-width key: (label count, length, suffix) — max key =
    longest match, ties impossible (equal text ⇒ equal key)."""
    return F.concat(
        F.lpad(F.size(F.split(s, r"\.")).cast("string"), 2, "0"),
        F.lpad(F.length(s).cast("string"), 3, "0"), s)


def public_suffix(host: Column) -> Column:
    """Longest matching public suffix of ``host``; falls back to the last
    label for unknown TLDs (PSL '*' rule).  A host that IS a listed
    suffix (e.g. ``co.uk``) matches itself, so registrable_domain can
    correctly yield NULL for it."""
    suf = F.array(*[F.lit(s) for s in PUBLIC_SUFFIXES])
    cand = F.filter(
        suf, lambda s: (host == s)
        | host.endswith(F.concat(F.lit("."), s)))
    keys = F.transform(cand, _suffix_key)
    return F.when(F.size(cand) > 0,
                  F.substring(F.array_max(keys), 6, 256)) \
        .otherwise(F.element_at(F.split(host, r"\."), -1))


def registrable_domain(host: Column) -> Column:
    """eTLD+1: the label directly under the public suffix, joined back to
    it.  A host that IS a bare suffix (or a single label) has no
    registrable domain and yields NULL."""
    suffix = public_suffix(host)
    stem = F.substring(
        host, 1, F.length(host) - F.length(suffix) - F.lit(1))
    label = F.element_at(F.split(stem, r"\."), -1)
    return F.when((F.length(stem) > 0) & (F.length(label) > 0),
                  F.concat(label, F.lit("."), suffix))


def domain_stats(hosts: DataFrame, host_col: str = "host") -> DataFrame:
    """Per-suffix rollup: (suffix, n_rows, n_hosts, n_registrable,
    reg_checksum) — the registrable strings are byte-gated via the
    48-bit-md5-prefix sum, distinct counts prove the collapse
    (hosts >= registrable domains)."""
    h = F.col(host_col)
    d = hosts.select(
        h.alias("host"),
        public_suffix(h).alias("suffix"),
        registrable_domain(h).alias("registrable"),
    )
    reg_md5 = F.md5(F.col("registrable").cast("binary"))
    return (
        d.groupBy("suffix")
        .agg(F.count("*").cast("long").alias("n_rows"),
             F.countDistinct("host").cast("long").alias("n_hosts"),
             F.countDistinct("registrable").cast("long")
             .alias("n_registrable"),
             F.sum(F.when(F.col("registrable").isNotNull(),
                          F.conv(F.substring(reg_md5, 1, 12), 16, 10)
                          .cast("long")).otherwise(F.lit(0)))
             .cast("long").alias("reg_checksum"))
    )
