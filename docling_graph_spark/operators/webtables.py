"""Web-table extraction: mine `<table>` elements out of crawl HTML into a
structured per-table relation, WDC-Web-Tables style (layout-vs-data
classification, header detection, cell statistics).

The reference's graph converter turns *extracted entities* into tables of
nodes/edges (`/root/reference/docling_graph/core/converters/graph_converter.py`);
this is the web-native sibling every crawl pipeline needs upstream of it:
relational data embedded in page markup, surfaced as rows so the same
graph/entity operators can consume it.  Corpus twin:
`sources/web_pages.py:aside_tables_expr` (Spark) /
`queries._ASIDE_TABLES_SQL` (DuckDB oracle).

Scale notes
-----------
* The whole operator is `pyspark.sql.functions` column expressions over the
  page scan — three `regexp_extract_all` + higher-order `transform`/
  `aggregate`/`filter` on the resulting arrays, one `posexplode`.  No Python
  row path, no shuffle before the final per-lang aggregation (which is a
  map-side-combinable groupBy on a low-cardinality key).
* Non-HTML payloads (PDF bytes) and table-free pages match nothing and drop
  out at the explode — no type routing needed upstream.
* Lazy (`.*?`) + DOTALL (`(?s)`) regexes bound each match to its own
  element, so one malformed giant page cannot quadratically backtrack:
  Java's regex engine scans forward once per anchor literal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TABLE_RE = "(?s)<table[^>]*>(.*?)</table>"
TR_RE = "(?s)<tr[^>]*>(.*?)</tr>"
CELL_RE = "(?s)<t[dh][^>]*>(.*?)</t[dh]>"


def _page_string(html_col: str) -> Column:
    return F.coalesce(F.col(html_col).cast("string"), F.lit(""))


def _table_stats_struct(tbl: Column) -> Column:
    """Per-`<table>` structure struct over the raw element string —
    shared by the exploded per-table relation and the single-pass page
    summary so both compute identical values."""
    rows = F.regexp_extract_all(tbl, F.lit(TR_RE), 1)
    cells = F.regexp_extract_all(tbl, F.lit(CELL_RE), 1)
    first_row_cells = F.regexp_extract_all(
        F.element_at(rows, 1), F.lit(CELL_RE), 1
    )
    header_cells = F.regexp_extract_all(
        tbl, F.lit("(?s)<th[^>]*>(.*?)</th>"), 1
    )
    zero = F.lit(0).cast("long")
    n_rows = F.size(rows).cast("long")
    n_cols = F.when(F.size(rows) > 0,
                    F.size(first_row_cells).cast("long")).otherwise(zero)
    n_link_cells = F.size(
        F.filter(cells, lambda c: c.contains("<a "))
    ).cast("long")
    return F.struct(
        n_rows.alias("n_rows"),
        n_cols.alias("n_cols"),
        F.size(cells).cast("long").alias("n_cells"),
        F.size(header_cells).cast("long").alias("n_header_cells"),
        n_link_cells.alias("n_link_cells"),
        ((n_rows >= 2) & (n_cols >= 2) & (n_link_cells == 0))
        .alias("is_data"),
        F.aggregate(
            cells, zero,
            lambda acc, c: acc + F.coalesce(c.try_cast("long"), zero),
        ).alias("value_sum"),
        F.aggregate(
            cells, zero, lambda acc, c: acc + F.length(c).cast("long")
        ).alias("cell_chars"),
    )


def page_tables(pages: DataFrame, url_col: str = "url",
                html_col: str = "html",
                keep_cols: "tuple[str, ...]" = ()) -> DataFrame:
    """(url, html, ...) -> one row per `<table>` element:

    ``(url, *keep_cols, table_idx, n_rows, n_cols, n_cells, n_header_cells,
    n_link_cells, is_data, value_sum, cell_chars)``

    * ``n_cols`` is the first row's cell count (ragged tables keep their
      total in ``n_cells``);
    * ``is_data`` is the WDC layout-filter rule: at least 2 rows and 2
      columns and no anchor inside any cell — navigation/layout tables are
      link grids, relational tables are text/number grids;
    * ``value_sum`` totals the integer-parseable cells (TRY_CAST semantics,
      non-numeric cells contribute 0) — a value-level checksum the DuckDB
      oracle recomputes exactly;
    * ``cell_chars`` totals raw cell-string lengths (markup inside cells
      counts — the oracle applies the same rule).
    """
    exploded = pages.select(
        F.col(url_col).alias("url"),
        *[F.col(c) for c in keep_cols],
        F.posexplode(
            F.regexp_extract_all(_page_string(html_col), F.lit(TABLE_RE), 1)
        ).alias("table_idx", "tbl"),
    )
    return exploded.select(
        "url",
        *keep_cols,
        F.col("table_idx").cast("long").alias("table_idx"),
        _table_stats_struct(F.col("tbl")).alias("_st"),
    ).select("url", *keep_cols, "table_idx", "_st.*")


def web_table_stats(pages: DataFrame, lang_col: str = "lang",
                    url_col: str = "url",
                    html_col: str = "html") -> DataFrame:
    """Per-corpus-lang web-table rollup:

    ``(lang, n_pages_with_tables, n_tables, n_data_tables, n_layout_tables,
    total_rows, total_cells, header_cells, tbl_value_sum, tbl_cell_chars)``

    Single-pass: per page, `transform` maps the tables array through the
    shared structure struct (no explode — zero-table pages keep their row,
    so the pages-with-tables count needs no second scan or join-back), a
    fold collapses it to one per-page summary struct, and ONE map-side-
    combinable groupBy on ``lang`` produces the rollup.  Plan shape: scan →
    partial agg → single Exchange → final agg.
    """
    zero = F.lit(0).cast("long")
    sts = F.transform(
        F.regexp_extract_all(_page_string(html_col), F.lit(TABLE_RE), 1),
        _table_stats_struct,
    )
    summary = F.aggregate(
        sts,
        F.struct(
            zero.alias("n_tables"), zero.alias("n_data_tables"),
            zero.alias("n_layout_tables"), zero.alias("total_rows"),
            zero.alias("total_cells"), zero.alias("header_cells"),
            zero.alias("tbl_value_sum"), zero.alias("tbl_cell_chars"),
        ),
        lambda acc, st: F.struct(
            (acc["n_tables"] + 1).alias("n_tables"),
            (acc["n_data_tables"]
             + F.when(st["is_data"], 1).otherwise(0)).alias("n_data_tables"),
            (acc["n_layout_tables"]
             + F.when(st["n_link_cells"] > 0, 1).otherwise(0))
            .alias("n_layout_tables"),
            (acc["total_rows"] + st["n_rows"]).alias("total_rows"),
            (acc["total_cells"] + st["n_cells"]).alias("total_cells"),
            (acc["header_cells"] + st["n_header_cells"])
            .alias("header_cells"),
            (acc["tbl_value_sum"] + st["value_sum"]).alias("tbl_value_sum"),
            (acc["tbl_cell_chars"] + st["cell_chars"])
            .alias("tbl_cell_chars"),
        ),
    )
    per_page = pages.select(
        F.col(lang_col).alias("lang"), summary.alias("_s")
    )
    return (
        per_page.groupBy("lang")
        .agg(
            F.sum(F.when(F.col("_s.n_tables") > 0, 1).otherwise(0))
             .cast("long").alias("n_pages_with_tables"),
            *[
                F.sum(F.col(f"_s.{c}")).cast("long").alias(c)
                for c in (
                    "n_tables", "n_data_tables", "n_layout_tables",
                    "total_rows", "total_cells", "header_cells",
                    "tbl_value_sum", "tbl_cell_chars",
                )
            ],
        )
        .orderBy("lang")
    )
