"""Serialized-document JSON source (SURVEY S4/O1).

The reference accepts a serialized DoclingDocument and validates it before
use (`/root/reference/docling_graph/core/input/handlers.py:307-407`,
validator `core/input/validators.py:211-355`), checking in order: valid
JSON, top-level object, ``schema_name`` present, ``schema_name ==
"DoclingDocument"``, ``version`` present, and a well-formed ``pages``
structure; pages are then walked in page-number order
(`core/extractors/document_processor.py:219`).

Spark mapping: a ``from_json`` projection against a fixed StructType plus
JVM-side structural predicates that reproduce each validator check as a
routed ``doc_error`` reason (malformed rows are *classified*, never
dropped silently — the quarantine-table contract), a validity flag, and a
``posexplode`` of the pages array (already stored in page order, so
ordinal == page sequence).  All JVM-side; no Python.
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

# validation-failure reasons, mirroring the reference's check order
# (validators.py:211-355): each row gets the FIRST failing check
ERR_MISSING = "missing_input"
ERR_NOT_OBJECT = "not_object"
ERR_INVALID_JSON = "invalid_json"
ERR_MISSING_SCHEMA = "missing_schema_name"
ERR_WRONG_SCHEMA = "wrong_schema_name"
ERR_MISSING_VERSION = "missing_version"
ERR_BAD_PAGES = "bad_pages"


def parse_document_json(df: DataFrame, json_col: str = "doc_json") -> DataFrame:
    """Parse + validate serialized documents.

    Adds a ``doc`` struct column, a ``doc_valid`` flag, and a ``doc_error``
    reason string (null when valid) reproducing the reference validator's
    checks in order:

    * null input                         → ``missing_input``
    * top level is not a JSON object     → ``not_object``
    * unparseable JSON                   → ``invalid_json``
    * ``schema_name`` absent             → ``missing_schema_name``
    * ``schema_name`` != DoclingDocument → ``wrong_schema_name``
    * ``version`` absent                 → ``missing_version``
    * ``pages`` present but not an array of page objects → ``bad_pages``
      (our serialized subset stores pages as an ordered array — the
      writer's contract; a ``pages`` the StructType cannot parse is a
      structural failure exactly like the reference's pages-shape check)

    Rows are kept either way so callers can route errors to a quarantine
    table.
    """
    raw = F.col(json_col)
    parsed = F.from_json(raw, DOC_JSON_SCHEMA)
    trimmed = F.ltrim(raw)
    # field-level presence (distinguishes absent from type-mismatched):
    # get_json_object returns null only when the key is absent or the
    # document is unparseable — both already excluded by earlier checks
    has_pages_key = F.get_json_object(raw, "$.pages").isNotNull()
    error = (
        F.when(raw.isNull(), ERR_MISSING)
        .when(~trimmed.startswith("{"), ERR_NOT_OBJECT)
        # from_json is PERMISSIVE (malformed input gives an all-null struct,
        # not a null struct) — get_json_object('$') nulls on broken JSON
        .when(F.get_json_object(raw, "$").isNull() | parsed.isNull(),
              ERR_INVALID_JSON)
        .when(F.get_json_object(raw, "$.schema_name").isNull(),
              ERR_MISSING_SCHEMA)
        .when(parsed["schema_name"] != SCHEMA_NAME, ERR_WRONG_SCHEMA)
        .when(F.get_json_object(raw, "$.version").isNull(),
              ERR_MISSING_VERSION)
        .when(has_pages_key & parsed["pages"].isNull(), ERR_BAD_PAGES)
    )
    return (
        df.withColumn("doc", parsed)
        .withColumn("doc_error", error)
        .withColumn("doc_valid", error.isNull())
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
