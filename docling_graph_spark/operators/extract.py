"""Main-content extraction stage (SURVEY §2.11, north-star core).

One Arrow-batched pandas UDF pass over the binary payload column:
per row it sniffs the payload kind (magic bytes — the Spark analogue of the
reference's input-type detection, `/root/reference/docling_graph/core/input/
types.py:39-105`) and routes to the HTML boilerplate stripper or the PDF
parser.  Validation failures become an ``error`` value, never dropped rows
(the reference's zero-data-loss contract).

Everything upstream/downstream of the UDF stays JVM-side; the UDF touches
only the columns it needs (html), so Catalyst prunes the rest at scan time
when the caller selects accordingly.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernels.html_main import extract_main_content
from ..kernels.pdf_stub import extract_pdf_text, is_pdf
from ..schemas import EXTRACTION_RESULT


@pandas_udf(EXTRACTION_RESULT)
def extract_payload(html: pd.Series) -> pd.DataFrame:
    texts, spans_col, stripped, kinds, errors = [], [], [], [], []
    for payload in html:
        text, spans, nbytes, kind, err = "", [], 0, "empty", None
        try:
            if payload is None or len(payload) == 0:
                err = "empty payload"
            elif is_pdf(bytes(payload)):
                kind = "pdf"
                text, err = extract_pdf_text(bytes(payload))
                nbytes = len(payload) - len(text.encode("utf-8"))
            else:
                kind = "html"
                result = extract_main_content(bytes(payload))
                text = result.text
                spans = [
                    {"start": s.start, "end": s.end, "tag": s.tag}
                    for s in result.spans
                ]
                nbytes = result.bytes_stripped
        except Exception as exc:  # zero-data-loss: record, don't drop
            err = f"extraction failed: {exc}"
        texts.append(text)
        spans_col.append(spans)
        stripped.append(nbytes)
        kinds.append(kind)
        errors.append(err)
    return pd.DataFrame({
        "text": texts,
        "spans": spans_col,
        "bytes_stripped": stripped,
        "kind": kinds,
        "error": errors,
    })


def extract_main_text(web_pages: DataFrame) -> DataFrame:
    """web_pages -> extracted docs
    (url, warc_ts, lang, text, spans, bytes_stripped, kind, error)."""
    out = web_pages.withColumn("x", extract_payload(F.col("html")))
    return out.select(
        "url", "warc_ts", "lang",
        F.col("x.text").alias("text"),
        F.col("x.spans").alias("spans"),
        F.col("x.bytes_stripped").alias("bytes_stripped"),
        F.col("x.kind").alias("kind"),
        F.col("x.error").alias("error"),
    )


def make_template_extractor_udf(extractor_factory):
    """Scalar Arrow UDF applying a FieldRuleExtractor to a text column,
    returning the template-shaped record as canonical JSON.

    The extractor is built lazily once per executor process (regex
    compilation amortized across all Arrow batches).
    """
    import json

    state: dict = {}

    @pandas_udf("string")
    def extract_record(text: pd.Series) -> pd.Series:
        if "x" not in state:
            state["x"] = extractor_factory()
        ex = state["x"]
        return pd.Series(
            [json.dumps(ex.extract(t or ""), sort_keys=True, default=str)
             for t in text]
        )

    return extract_record


PARSED_RESPONSE = T.StructType([
    T.StructField("json", T.StringType(), True),
    T.StructField("status", T.StringType(), False),
])


def make_json_response_parser_udf(aggressive: bool = True):
    """Arrow UDF over a model-output-shaped text column: markdown-fence
    strip, JSON isolation, truncation repair (kernels/json_repair.py, F10).
    Returns struct(json: canonical-JSON-or-null, status)."""
    import json as _json

    from ..kernels.json_repair import parse_response

    @pandas_udf(PARSED_RESPONSE)
    def parse_batch(content: pd.Series) -> pd.DataFrame:
        out_json, out_status = [], []
        for c in content:
            parsed, status = parse_response(c, aggressive=aggressive)
            out_json.append(
                None if parsed is None
                else _json.dumps(parsed, sort_keys=True)
            )
            out_status.append(status)
        return pd.DataFrame({"json": out_json, "status": out_status})

    return parse_batch


def filter_extractable(extracted: DataFrame) -> DataFrame:
    """P1: drop rows with empty/whitespace-only extracted text
    (`/root/reference/docling_graph/core/input/handlers.py:72-82`)."""
    return extracted.filter(
        F.col("error").isNull() & (F.length(F.trim(F.col("text"))) > 0)
    )
