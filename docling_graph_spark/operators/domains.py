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


def _surt_host_labels(url: Column) -> Column:
    host = F.lower(F.regexp_extract(url, r"^https?://([^/]+)", 1))
    return F.split(host, r"\.")


def surt_www_dropped(url: Column) -> Column:
    """True iff SURT canonicalization drops this url's leading host
    label: it is ``www`` AND other labels remain (a bare ``www`` host
    keeps its only label — dropping it would leave an empty key).  The
    ONE condition the key transform and the cdx_stats counter share, so
    the two can't drift."""
    labels = _surt_host_labels(url)
    return (F.element_at(labels, 1) == "www") & (F.size(labels) > 1)


def _surt_rev_labels(url: Column) -> Column:
    """Reversed, lowercased host labels with a leading ``www`` dropped —
    the array the SURT key and its prefix hierarchy are built from."""
    labels = _surt_host_labels(url)
    labels = F.when(surt_www_dropped(url),
                    F.slice(labels, 2, F.size(labels) - 1)) \
        .otherwise(labels)
    return F.reverse(labels)


def surt_key(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key — the canonical
    index key of the Common Crawl / Wayback CDX ecosystem: host labels
    lowercased and REVERSED (comma-joined), a leading ``www`` label
    dropped, then ``)`` + path.  ``https://www.News.Example.com/a/b`` →
    ``com,example,news)/a/b``.

    Reversing the host makes every (domain, subdomain-tree, path) query
    a PREFIX RANGE: a CDX table range-partitioned/sorted on this key
    answers "all captures under example.com" with partition pruning +
    one contiguous scan — which is exactly how the public CC index
    serves domain queries over 10^11 captures.  Pure codegen column
    expression: split / slice / reverse / array_join, no UDF."""
    path = F.regexp_replace(url, r"^https?://[^/]*", "")
    return F.concat(F.array_join(_surt_rev_labels(url), ","),
                    F.lit(")"),
                    F.when(path == "", F.lit("/")).otherwise(path))


def cdx_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """CDX-index rollup over a url relation: one row with
    n_urls, n_keys (distinct SURT keys), key_checksum (order-insensitive
    48-bit md5 rollup of every key — the full index content gate),
    n_www_dropped (hosts whose leading www was canonicalized away),
    n_prefix2 (distinct 2-segment SURT prefixes ≈ registrable domains
    under generic TLDs) and prefix_checksum over the per-prefix capture
    counts — the partition-pruning manifest a range-partitioned CDX
    layout serves domain queries from.  One scan, two map-side
    combinable aggregates."""
    key = surt_key(F.col(url_col))
    # prefix from the reversed LABEL ARRAY, not the key string (a
    # 2-label host's second comma segment would otherwise carry the
    # ")/path" tail)
    p2 = F.array_join(F.slice(_surt_rev_labels(F.col(url_col)), 1, 2),
                      ",")
    keyed = df.select(
        key.alias("k"),
        surt_www_dropped(F.col(url_col)).cast("long").alias("www"),
        p2.alias("p2"))
    per_prefix = (keyed.groupBy("p2")
                  .agg(F.count("*").cast("long").alias("n")))
    pc = per_prefix.agg(
        F.count("*").cast("long").alias("n_prefix2"),
        F.sum(F.conv(F.substring(F.md5(F.concat(
            F.col("p2"), F.lit(":"), F.col("n").cast("string"))
            .cast("binary")), 1, 12), 16, 10).cast("long"))
        .cast("long").alias("prefix_checksum"))
    base = keyed.agg(
        F.count("*").cast("long").alias("n_urls"),
        F.countDistinct("k").cast("long").alias("n_keys"),
        F.sum(F.conv(F.substring(F.md5(F.col("k").cast("binary")),
                                 1, 12), 16, 10).cast("long"))
        .cast("long").alias("key_checksum"),
        F.sum("www").cast("long").alias("n_www_dropped"))
    return base.crossJoin(pc)
