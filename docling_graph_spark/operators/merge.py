"""Many-to-one merge stage (reference A1/A2: merge_pydantic_models).

Per-document deep merge of batch-partial records with the reference's
order-dependent semantics (`/root/reference/docling_graph/core/utils/
dict_merger.py:9-144`): partials are sorted by ``batch_id`` (the reference
merges in batch order) and folded left.  Runs as ``groupBy(url).
applyInPandas`` — the canonical Spark partial/final aggregation shape; the
kernel itself is parity-tested.  Merge failures keep the first partial and
set ``merge_status`` (zero-data-loss, `many_to_one.py:353-358`).
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..kernels.merge import merge_records

MERGED_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("record_json", T.StringType(), True),
    T.StructField("n_partials", T.IntegerType(), False),
    T.StructField("merge_status", T.StringType(), False),
])


def _merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("batch_id", kind="mergesort")
    url = pdf["url"].iloc[0]
    records = []
    for js in pdf["record_json"]:
        try:
            records.append(json.loads(js))
        except Exception:
            records.append({})
    try:
        merged = merge_records(records)
        status = "ok"
    except Exception as exc:  # keep first partial; never drop the document
        merged = records[0] if records else {}
        status = f"merge_failed: {exc}"
    return pd.DataFrame({
        "url": [url],
        "record_json": [json.dumps(merged, sort_keys=True)],
        "n_partials": [len(records)],
        "merge_status": [status],
    })


def merge_template_records(partials: DataFrame) -> DataFrame:
    """(url, batch_id, record_json) -> one merged record per url."""
    return partials.groupBy("url").applyInPandas(_merge_group, MERGED_SCHEMA)
