"""Streaming WARC ingestion: `spark.readStream.format("warc")` tails a
growing crawl directory by file-name watermark (one micro-batch partition
per new file), checkpointed so a restarted query resumes at the last
committed file with zero replays — the continuous-ingestion analogue of
the batch source's one-partition-per-crawl-file layout.
"""

from __future__ import annotations

import os

from docling_graph_spark.sources import warc


def _write_crawl_file(d: str, seq: int, n: int = 3) -> None:
    recs = [
        (f"https://h{seq}.example.com/p{i}", f"body {seq}-{i}".encode())
        for i in range(n)
    ]
    warc.write_warc(os.path.join(d, f"crawl-{seq:05d}.warc.gz"), recs)


def _drain(spark, src_dir: str, out_dir: str, ckpt: str) -> None:
    df = spark.readStream.format("warc").load(src_dir)
    q = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_incremental_pipeline_ingests_warc_stream(spark, tmp_path):
    """Continuous crawl → graph stage tables: run_incremental with
    input_format='warc' drains raw crawl files through the full
    extract→chunk→mention foreachBatch pipeline, appending only new files
    on re-drain (the spark-submit `--mode stream` path for a WARC dir)."""
    from docling_graph_spark.streaming.incremental import run_incremental

    src = str(tmp_path / "rawcrawl"); os.makedirs(src)
    out = str(tmp_path / "stages")
    ckpt = str(tmp_path / "sckpt")
    body = ("<html><body><article><p>The streaming extraction is working "
            "and the graph is fine.</p></article></body></html>")
    warc.write_warc(os.path.join(src, "crawl-00000.warc.gz"),
                    [(f"https://s{i}.example.com/p", body.encode())
                     for i in range(3)])

    run_incremental(spark, src, out, ckpt, input_format="warc")
    extracted = spark.read.parquet(f"{out}/extracted")
    assert extracted.count() == 3
    rows = extracted.select("text", "lang").collect()
    assert {r.text for r in rows} == {"The streaming extraction is working "
                                      "and the graph is fine."}
    # crawl records carry no lang: the stopword-vote detector fills it
    assert {r.lang for r in rows} == {"en"}
    assert spark.read.parquet(f"{out}/doc_mentions").count() > 0

    # one more crawl file lands; same checkpoint -> 1 new doc, no replay,
    # and with wet_dir set the new batch also publishes WET files
    wet = str(tmp_path / "wetout")
    warc.write_warc(os.path.join(src, "crawl-00001.warc.gz"),
                    [("https://s9.example.com/p", body.encode())])
    run_incremental(spark, src, out, ckpt, input_format="warc", wet_dir=wet)
    assert spark.read.parquet(f"{out}/extracted").count() == 4
    batches = os.listdir(wet)
    assert len(batches) == 1  # only the new micro-batch produced WET
    wdf = spark.read.format("warc").load(os.path.join(wet, batches[0]))
    conv = wdf.filter(wdf.record_type == "conversion").collect()
    assert len(conv) == 1 and conv[0].url == "https://s9.example.com/p"

    # the rest of the crawl story on the same accumulated tables:
    # maintenance bin-pack (2 drains fragmented the stage tables), then
    # the downstream corpus-global graph finalize
    from docling_graph_spark.checkpointing import CheckpointedRun
    from docling_graph_spark.streaming.incremental import (
        assemble_accumulated_graph,
    )

    CheckpointedRun(spark, out).compact_files(target_bytes=256 << 20)
    nodes, edges = assemble_accumulated_graph(spark, out)
    by_label = {r["label"]: r["count"]
                for r in nodes.groupBy("label").count().collect()}
    assert by_label["WebDocument"] == 4
    assert by_label.get("Chunk", 0) >= 4
    assert edges.count() > 0


def test_transport_charset_reaches_extraction(spark, tmp_path):
    """A legacy page labeled ONLY via the HTTP Content-Type header (no
    in-document meta — common for shift_jis/gbk servers) must extract its
    exact text: the content_type column rides from the WARC reader into
    the extraction UDF as the transport-layer charset hint."""
    from docling_graph_spark.streaming.incremental import run_incremental

    src = str(tmp_path / "sjis"); os.makedirs(src)
    out = str(tmp_path / "sjout"); ckpt = str(tmp_path / "sjckpt")
    jp = "日本語のテキストです。これはテストです。"
    body = (f"<html><body><article><p>{jp}</p></article></body></html>"
            ).encode("shift_jis")
    warc.write_warc(
        os.path.join(src, "crawl-00000.warc.gz"),
        [("https://sjis.example.jp/p", body)],
        content_type="text/html; charset=Shift_JIS",
    )
    run_incremental(spark, src, out, ckpt, input_format="warc")
    rows = spark.read.parquet(f"{out}/extracted").collect()
    assert len(rows) == 1
    assert rows[0].text == jp
    assert "�" not in rows[0].text


def test_stream_tails_directory_with_checkpointed_resume(spark, tmp_path):
    src = str(tmp_path / "crawl"); os.makedirs(src)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    warc.register_warc_source(spark)

    _write_crawl_file(src, 0)
    _write_crawl_file(src, 1)
    _drain(spark, src, out, ckpt)
    first = spark.read.parquet(out)
    assert first.count() == 6
    urls = {r.url for r in first.select("url").collect()}
    assert any("h0.example" in u for u in urls)
    assert any("h1.example" in u for u in urls)

    # crawler publishes two more files; SAME checkpoint -> only new files
    # are read (no replay of crawl-00000/00001)
    _write_crawl_file(src, 2)
    _write_crawl_file(src, 3, n=2)
    _drain(spark, src, out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 11  # 6 old (not rewritten) + 3 + 2 new
    bodies = sorted(r.html.decode() for r in rows)
    assert bodies.count("body 0-0") == 1  # exactly once: no replay
    assert "body 3-1" in bodies

    # nothing new: a third drain emits zero additional rows
    _drain(spark, src, out, ckpt)
    assert spark.read.parquet(out).count() == 11
