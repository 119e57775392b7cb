"""The fused extract+chunk UDF ships chunks WITHOUT text
(schemas.CHUNK_SPAN_LITE); `chunks_from_combined` rebuilds each chunk
string JVM-side as substring(text, start+1, end-start).  That is only
correct if (a) every kernel chunk is the exact code-point slice
text[start:end], and (b) Spark's substring slices by code point exactly
like Python — including astral (surrogate-pair) characters.  Both are
enforced here differentially against the Python kernel.
"""

from pyspark.sql import functions as F

from docling_graph_spark.kernels import chunking as k_chunk
from docling_graph_spark.operators import chunk as op_chunk
from docling_graph_spark.operators import extract as op_extract

TEXTS = [
    "short single chunk",                              # verbatim short-circuit
    ("First sentence here. Second one follows! Third asks? "
     "Then a paragraph break.\n\nAnd a new paragraph with more text. " * 8),
    "emoji 😀 astral 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 pairs. " * 40,              # non-BMP offsets
    "日本語のテキストです。これはテストです。" * 60,
    "   leading and trailing whitespace chunk. " * 30 + "   ",
]


def test_kernel_chunks_are_exact_slices():
    for text in TEXTS:
        for s in k_chunk.chunk_spans(text, max_tokens=16):
            assert s.text == text[s.start:s.end]


def test_substring_reconstruction_matches_kernel(spark):
    # texts wrapped as minimal html so extraction is lossless and the
    # chunk offsets refer to the extracted text
    html_rows = [
        (f"u{i}", "en",
         ("<html><body><article><p>"
          + t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
          + "</p></article></body></html>").encode("utf-8"))
        for i, t in enumerate(TEXTS)
    ]
    pages = spark.createDataFrame(
        html_rows, "url string, lang string, html binary"
    ).withColumn("warc_ts", F.current_timestamp())
    comb = op_extract.extract_and_chunk(pages, max_tokens=16,
                                        context_limit=8000,
                                        merge_threshold=0.85)
    got = {
        (r.url, r.chunk_id): r.text
        for r in op_chunk.chunks_from_combined(comb).collect()
    }
    docs = {r.url: r.text for r in comb.select("url", "text").collect()}
    assert got, "no chunks produced"
    for i, _t in enumerate(TEXTS):
        url = f"u{i}"
        # expected: chunk the EXTRACTED text with the Python kernel
        for s in k_chunk.chunk_spans(docs[url], max_tokens=16):
            assert got[(url, s.chunk_id)] == s.text, (url, s.chunk_id)
