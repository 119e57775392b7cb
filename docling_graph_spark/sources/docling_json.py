"""Serialized-document JSON source (SURVEY S4/O1).

The reference accepts a serialized DoclingDocument and validates it before
use: parse the JSON, require ``schema_name == "DoclingDocument"``, then walk
pages in page-number order (`/root/reference/docling_graph/core/input/
handlers.py:307-407`, validator `core/input/validators.py:211-355`, page
order `core/extractors/document_processor.py:219`).

Spark mapping: a ``from_json`` projection against a fixed StructType (nulls
on malformed input — the validation-error rows are *routed*, not dropped
silently), a filter on the schema tag, and a ``posexplode`` of the pages
array (already stored in page order, so ordinal == page sequence).  All
JVM-side; no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCHEMA_NAME = "DoclingDocument"

# fixed parse target: the subset of the serialized document the pipeline
# consumes (pages of markdown text, keyed by page_no)
DOC_JSON_SCHEMA = (
    "schema_name string, version string, name string, "
    "pages array<struct<page_no:int, text:string>>"
)


def parse_document_json(df: DataFrame, json_col: str = "doc_json") -> DataFrame:
    """Parse + validate serialized documents.

    Adds a ``doc`` struct column and a ``doc_valid`` flag: malformed JSON
    parses to null, and a parsed document with the wrong ``schema_name`` is
    invalid (reference rejects both).  Rows are kept either way so callers
    can route errors to a quarantine table.
    """
    parsed = F.from_json(F.col(json_col), DOC_JSON_SCHEMA)
    return df.withColumn("doc", parsed).withColumn(
        "doc_valid",
        F.col("doc").isNotNull()
        & (F.col("doc.schema_name") == SCHEMA_NAME),
    )


def explode_pages(parsed: DataFrame, key: str) -> DataFrame:
    """Valid documents → one row per page, in page order.

    ``posexplode`` preserves array position; the serialized pages array is
    already sorted by page_no (the writer's contract), so ``pos`` is the
    in-document page ordinal (reference iterates ``sorted(pages.keys())``).
    """
    return (
        parsed.filter(F.col("doc_valid"))
        .select(key, F.posexplode(F.col("doc.pages")).alias("pos", "page"))
        .select(
            key,
            F.col("pos").cast("long").alias("page_ordinal"),
            F.col("page.page_no").alias("page_no"),
            F.col("page.text").alias("page_text"),
        )
    )
