"""S1: input-type detection, reference semantics on table rows.

The reference classifies each *source* (path / URL / raw string) into
PDF / IMAGE / TEXT / TEXT_FILE / MARKDOWN / URL / DOCLING_DOCUMENT
(`/root/reference/docling_graph/core/input/types.py:39-218`).  Its decision
tree is filesystem-oriented (``Path.exists`` / ``is_file``); at 10^12 rows
there is no filesystem — every row IS the payload — so the Spark analogue
keys off the source string and the in-row content:

* URL check first: ``startswith http:// | https://`` (`:107-118`)
* extension map on the lowered ``Path.suffix`` (`:127-155`): .pdf → pdf;
  .jpg/.jpeg/.png/.gif/.bmp/.tiff/.tif → image; .txt → text_file;
  .md/.markdown → markdown
* .json → DoclingDocument sniff on the content column (`:170-218`):
  a JSON object with ``schema_name`` or ``version``, or both ``pages`` and
  ``main_text`` → docling_document, else text (invalid JSON → text)
* anything else: API mode → text (the reference's "not a file → raw text"
  branch, `:91-105`); CLI mode → NULL (the reference raises
  ``ConfigurationError`` — here the row routes to an errors DataFrame)

Pure ``pyspark.sql.functions`` — no Python in the row path.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

PDF_EXTENSIONS = (".pdf",)
IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".gif", ".bmp", ".tiff", ".tif")
TEXT_EXTENSIONS = (".txt",)
MARKDOWN_EXTENSIONS = (".md", ".markdown")
JSON_EXTENSIONS = (".json",)


def _suffix(source: Column) -> Column:
    """``Path(source).suffix.lower()``: the last '.'-segment of the final
    path component, empty when the only dot leads (``.hidden``) or there is
    none."""
    basename = F.regexp_extract(source, r"([^/\\]*)$", 1)
    return F.lower(F.regexp_extract(basename, r".(\.[^.]*)$", 1))


def _is_docling_json(content: Column) -> Column:
    """`types.py:191-218`: JSON object with schema_name or version, or
    pages + main_text.  ``get_json_object`` yields NULL on invalid JSON,
    reproducing the reference's except-→-False."""
    def has(key: str) -> Column:
        return F.get_json_object(content, f"$.{key}").isNotNull()

    return (
        content.isNotNull()
        & F.trim(content).startswith("{")
        & (has("schema_name") | has("version")
           | (has("pages") & has("main_text")))
    )


def input_type(
    source: Column,
    content: Optional[Column] = None,
    mode: str = "api",
) -> Column:
    """Classify a source string (+ optional in-row content for the JSON
    sniff) into the reference's ``InputType`` values.  ``mode='cli'`` maps
    unsupported extensions to NULL (error row); ``mode='api'`` to 'text'."""
    if mode not in ("cli", "api"):
        raise ValueError(f"mode must be 'cli' or 'api', got: {mode}")
    suffix = _suffix(source)
    unknown = F.lit(None).cast("string") if mode == "cli" else F.lit("text")
    if content is None:
        json_type = unknown if mode == "cli" else F.lit("text")
    else:
        json_type = F.when(_is_docling_json(content), "docling_document") \
            .otherwise("text")
    return (
        F.when(source.startswith("http://") | source.startswith("https://"),
               "url")
        .when((F.lit(mode) == "api") & (F.length(F.trim(source)) == 0),
              "text")
        .when(suffix.isin(*PDF_EXTENSIONS), "pdf")
        .when(suffix.isin(*IMAGE_EXTENSIONS), "image")
        .when(suffix.isin(*TEXT_EXTENSIONS), "text_file")
        .when(suffix.isin(*MARKDOWN_EXTENSIONS), "markdown")
        .when(suffix.isin(*JSON_EXTENSIONS), json_type)
        .otherwise(unknown)
    )
