"""Sitemap (sitemaps.org XML) build, parse, and crawl-coverage
reconciliation — the frontier-side complement to the robots.txt gate
(operators/robots.py already surfaces ``Sitemap:`` directive counts;
THIS module processes the sitemap documents themselves).

A real crawl pipeline consumes sitemaps twice: when fetched, each
host's sitemap.xml is parsed into (loc, lastmod) rows that seed /
re-prioritize the frontier; periodically, the parsed set is reconciled
against what was actually captured — URLs listed but never crawled
(fetch gaps / ghost entries) and URLs crawled but unlisted (discovered
only by link traversal).

Scale shape: building is one groupBy(host) with per-host local
array_sort (sitemaps are bounded — the protocol caps one file at 50k
URLs / 50 MB, so per-group state is small by spec); parsing is two
zipped ``regexp_extract_all`` + one explode, all scan-stage JVM;
reconciliation is two hash joins on url (left_semi / left_anti), the
same key the crawl table is bucketed by, so at 10^12 rows both joins
co-partition with the corpus layout.  No Python row path anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LOC_RE = r"<loc>([^<]*)</loc>"
LASTMOD_RE = r"<lastmod>([^<]*)</lastmod>"


def sitemap_entry(url: Column, lastmod: Column) -> Column:
    """One ``<url>`` element; lastmod is the W3C datetime date form."""
    return F.concat(
        F.lit("<url><loc>"), url, F.lit("</loc><lastmod>"), lastmod,
        F.lit("</lastmod></url>"),
    )


def build_sitemaps(entries: DataFrame, host_col: str = "host",
                   entry_col: str = "entry",
                   order_col: str = "ord") -> DataFrame:
    """(host, ord, entry) -> (host, xml): one sitemap document per host,
    entries in ``ord`` order (deterministic bytes — the order a CMS
    writes them), wrapped in the urlset envelope."""
    return entries.groupBy(host_col).agg(
        F.concat(
            F.lit('<?xml version="1.0" encoding="UTF-8"?>'
                  '<urlset xmlns="http://www.sitemaps.org/schemas/'
                  'sitemap/0.9">'),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col(order_col), F.col(entry_col)))),
                    lambda s: s[entry_col],
                ),
                "",
            ),
            F.lit("</urlset>"),
        ).alias("xml"),
    )


def parse_sitemaps(sitemaps: DataFrame, host_col: str = "host",
                   xml_col: str = "xml") -> DataFrame:
    """(host, xml) -> one row per sitemap entry: (host, loc, lastmod).
    The i-th <loc> pairs with the i-th <lastmod> (zipped positionally,
    exactly how the elements nest in a spec-conforming urlset)."""
    locs = F.regexp_extract_all(F.col(xml_col), F.lit(LOC_RE), 1)
    mods = F.regexp_extract_all(F.col(xml_col), F.lit(LASTMOD_RE), 1)
    return sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(F.arrays_zip(locs.alias("loc"), mods.alias("lastmod")))
        .alias("z"),
    ).select("host", F.col("z.loc").alias("loc"),
             F.col("z.lastmod").alias("lastmod"))


def sitemap_coverage(parsed: DataFrame, crawled: DataFrame,
                     loc_col: str = "loc",
                     url_col: str = "url") -> DataFrame:
    """Reconcile parsed sitemap entries against the crawl capture: one
    row of totals — sitemap hosts/urls, a 48-bit md5-prefix checksum
    over every extracted lastmod string (gates the parsed BYTES), listed
    urls actually captured, listed-but-never-crawled (ghosts), and
    crawled-but-unlisted."""
    mod_md5 = F.md5(F.col("lastmod").cast("binary"))
    base = parsed.agg(
        F.countDistinct("host").cast("long").alias("n_hosts"),
        F.count("*").cast("long").alias("n_sitemap_urls"),
        F.sum(F.conv(F.substring(mod_md5, 1, 12), 16, 10).cast("long"))
        .cast("long").alias("lastmod_checksum"),
    )
    locs = parsed.select(F.col(loc_col).alias("loc"))
    urls = crawled.select(F.col(url_col).alias("url"))
    matched = (
        locs.join(urls, locs.loc == urls.url, "left_semi")
        .agg(F.count("*").cast("long").alias("n_listed_crawled"))
    )
    ghosts = (
        locs.join(urls, locs.loc == urls.url, "left_anti")
        .agg(F.count("*").cast("long").alias("n_ghost"))
    )
    unlisted = (
        urls.join(locs, urls.url == locs.loc, "left_anti")
        .agg(F.count("*").cast("long").alias("n_crawled_unlisted"))
    )
    return base.crossJoin(matched).crossJoin(ghosts).crossJoin(unlisted)
