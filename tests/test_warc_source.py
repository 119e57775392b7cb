"""WARC source: pure parser round-trips + the Spark 4 Python DataSource."""

from __future__ import annotations

import os

from docling_graph_spark.sources import warc


def _records(n=5):
    return [
        (f"https://h{i}.example.com/p{i}", f"body {i} é".encode())
        for i in range(n)
    ]


def test_parser_roundtrip_bytes():
    blob = b"".join(warc.warc_record_bytes(u, b) for u, b in _records())
    parsed = list(warc.parse_warc_records(blob))
    assert len(parsed) == 5
    for (url, body), (headers, payload) in zip(_records(), parsed):
        assert headers["warc-target-uri"] == url
        assert headers["warc-type"] == "response"
        http, got_body = warc.split_http_response(payload)
        assert got_body == body                  # byte-identical
        assert http["content-type"] == "text/html"


def test_parser_tolerates_truncation_and_garbage():
    blob = b"".join(warc.warc_record_bytes(u, b) for u, b in _records(3))
    # truncated mid-payload: complete prefix only
    assert len(list(warc.parse_warc_records(blob[: len(blob) - 10]))) == 2
    # trailing garbage after valid records: stops cleanly
    assert len(list(warc.parse_warc_records(blob + b"garbage"))) == 3
    assert list(warc.parse_warc_records(b"")) == []
    assert list(warc.parse_warc_records(b"HTTP/1.1 200 OK\r\n\r\n")) == []


def test_non_response_record_passthrough():
    rec = warc.warc_record_bytes(
        "urn:warcinfo", b"software: test", warc_type="warcinfo",
        content_type="application/warc-fields",
    )
    [(headers, payload)] = list(warc.parse_warc_records(rec))
    assert headers["warc-type"] == "warcinfo"
    assert payload == b"software: test"


def test_spark_datasource_reads_files_as_partitions(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    # 3 files, one warcinfo + responses each
    for f in range(3):
        recs = [(f"https://host{f}.example.com/{i}",
                 f"text {f}-{i}".encode()) for i in range(4)]
        path = str(d / f"part{f}.warc")
        with open(path, "wb") as fh:
            fh.write(warc.warc_record_bytes(
                "urn:info", b"x: y", warc_type="warcinfo",
                content_type="application/warc-fields"))
            for u, b in recs:
                fh.write(warc.warc_record_bytes(u, b))

    warc.register_warc_source(spark)
    df = spark.read.format("warc").load(str(d))
    assert df.columns == ["url", "warc_ts", "record_type",
                          "content_type", "html"]
    rows = df.collect()
    assert len(rows) == 15
    resp = [r for r in rows if r.record_type == "response"]
    assert len(resp) == 12
    assert all(r.warc_ts is not None for r in resp)
    bodies = {r.html.decode() for r in resp}
    assert "text 2-3" in bodies and len(bodies) == 12
    # parallelism unit = file
    assert df.rdd.getNumPartitions() == 3


def test_per_record_gzip_members_roundtrip(tmp_path):
    """Common Crawl convention: each record is its own gzip member.  The
    multi-member file must read back identically to the plain file, and
    each member must be independently decompressible (range-fetch shape)."""
    import gzip
    import zlib

    recs = _records(6)
    gz_path = str(tmp_path / "cc.warc.gz")
    warc.write_warc(gz_path, recs)          # inferred from .gz suffix
    plain_path = str(tmp_path / "cc.warc")
    warc.write_warc(plain_path, recs)

    raw = open(gz_path, "rb").read()
    # 6 independent members: 6 gzip magics at member boundaries
    assert raw.count(b"\x1f\x8b\x08") >= 6
    # first member alone decompresses to exactly one record
    d = zlib.decompressobj(wbits=31)
    first = d.decompress(raw)
    one = list(warc.parse_warc_records(first))
    assert len(one) == 1

    # transparent concatenated-stream read == plain bytes
    assert gzip.open(gz_path, "rb").read() == open(plain_path, "rb").read()

    parsed = list(warc.parse_warc_records(gzip.open(gz_path, "rb").read()))
    assert [h["warc-target-uri"] for h, _ in parsed] == [u for u, _ in recs]

    # deterministic output (mtime=0, no filename in member headers)
    gz2 = str(tmp_path / "cc2.warc.gz")
    warc.write_warc(gz2, recs)
    assert open(gz2, "rb").read() == raw


def test_spark_datasource_reads_gz_members(spark, tmp_path):
    d = tmp_path / "gzcrawl"
    d.mkdir()
    recs = _records(5)
    warc.write_warc(str(d / "part0.warc.gz"), recs)
    warc.register_warc_source(spark)
    df = spark.read.format("warc").load(str(d))
    rows = df.collect()
    assert len(rows) == 5
    assert {r.html.decode() for r in rows} == {b.decode() for _, b in recs}


def test_truncated_gz_member_salvages_prefix(tmp_path):
    """An in-flight crawl file (gzip member cut off mid-stream) must yield
    the complete-member prefix, not raise EOFError — the streaming reader
    can list a file the crawler is still writing."""
    import gzip
    import io

    recs = _records(4)
    path = str(tmp_path / "inflight.warc.gz")
    warc.write_warc(path, recs)
    raw = open(path, "rb").read()

    # cut mid-file (inside some member's compressed data): the complete
    # prefix survives, the rest is dropped, nothing raises
    cut = raw[: int(len(raw) * 0.55)]
    open(path, "wb").write(cut)
    rows = list(warc._read_warc_file(path))
    assert 1 <= len(rows) < 4
    assert [r[0] for r in rows] == [u for u, _ in recs[: len(rows)]]

    # cut inside the FIRST member: zero records, still no exception
    open(path, "wb").write(raw[:20])
    assert list(warc._read_warc_file(path)) == []

    # corrupt bytes between members: complete prefix only
    with open(path, "wb") as f:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(warc.warc_record_bytes(*recs[0]))
        f.write(buf.getvalue())
        f.write(b"\x00garbage not gzip\x00")
    rows = list(warc._read_warc_file(path))
    assert len(rows) == 1 and rows[0][0] == recs[0][0]


def test_wet_export_roundtrip(spark, tmp_path):
    """Extracted text → WET-style conversion records, written from
    executors, readable back through the same warc datasource with
    byte-identical text — the crawl-in → WET-out loop."""
    from docling_graph_spark.pipeline import PipelineConfig, run_on_testdata

    warc.register_warc_source(spark)  # standalone-run safe
    res = run_on_testdata(spark, "/root/testdata/sf0.001",
                          PipelineConfig(id_mode="xxhash64"))
    out = str(tmp_path / "wet")
    warc.write_wet(res.extracted, out, n_files=4)

    files = sorted(os.listdir(out))
    assert files and all(f.startswith("wet-") and f.endswith(".warc.gz")
                         for f in files)
    assert len(files) <= 4

    df = spark.read.format("warc").load(out)
    conv = df.filter(df.record_type == "conversion")
    src = {r.url: r.text for r in res.extracted.select("url", "text").collect()}
    got = {r.url: r.html.decode("utf-8") for r in conv.collect()}
    assert got == src  # byte-identical text per url, nothing lost

    # determinism: a second export produces identical bytes
    out2 = str(tmp_path / "wet2")
    warc.write_wet(res.extracted, out2, n_files=4)
    for f in files:
        assert open(os.path.join(out, f), "rb").read() == \
            open(os.path.join(out2, f), "rb").read()


def test_decompression_bomb_capped(tmp_path):
    """A gzip member expanding past the cap must degrade to the complete-
    record prefix, not OOM: 64 MB of zeros compress to ~64 KB."""
    import gzip
    import io

    path = str(tmp_path / "bomb.warc.gz")
    good = warc.warc_record_bytes("https://ok.example/1", b"fine")
    bomb = warc.warc_record_bytes("https://bomb.example/1",
                                  b"\x00" * (64 << 20))
    with open(path, "wb") as f:
        for blob in (good, bomb):
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(blob)
            f.write(buf.getvalue())
    assert os.path.getsize(path) < (1 << 20)

    rows = list(warc._read_warc_file(path, max_bytes=1 << 20))
    assert len(rows) == 1                      # bomb truncated away
    assert rows[0][0] == "https://ok.example/1"

    rows_full = list(warc._read_warc_file(path))  # default 8 GiB cap: fine
    assert len(rows_full) == 2


# ------------------------------------------------------------ fuzz (no JVM)

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:
    _bodies = st.lists(st.binary(min_size=0, max_size=200),
                       min_size=0, max_size=8)

    @given(_bodies)
    @settings(max_examples=150, deadline=None)
    def test_fuzz_roundtrip_any_bodies(bodies):
        recs = [(f"https://h.example.com/{i}", b)
                for i, b in enumerate(bodies)]
        blob = b"".join(warc.warc_record_bytes(u, b) for u, b in recs)
        parsed = list(warc.parse_warc_records(blob))
        assert len(parsed) == len(recs)
        for (u, b), (h, payload) in zip(recs, parsed):
            assert h["warc-target-uri"] == u
            assert warc.split_http_response(payload)[1] == b

    @given(_bodies, st.integers(min_value=0, max_value=10_000))
    @settings(max_examples=150, deadline=None)
    def test_fuzz_truncation_never_raises(bodies, cut):
        recs = [(f"https://h.example.com/{i}", b)
                for i, b in enumerate(bodies)]
        blob = b"".join(warc.warc_record_bytes(u, b) for u, b in recs)
        parsed = list(warc.parse_warc_records(blob[:cut]))
        # a truncated file yields a (possibly empty) prefix, in order
        assert len(parsed) <= len(recs)
        for (u, _b), (h, _p) in zip(recs, parsed):
            assert h["warc-target-uri"] == u


def test_v2_writer_roundtrip_and_commit_protocol(spark, sf_smoke_dir,
                                                 tmp_path):
    """df.write.format('warc') — the Python DataSource V2 sink: per-task
    gzip-member files published at commit (no temp litter), lossless
    write→read roundtrip, empty partitions publish nothing, and
    overwrite mode replaces prior files."""
    import os

    from docling_graph_spark.sources.warc import register_warc_source
    from docling_graph_spark.sources.web_pages import synthesize_web_pages

    register_warc_source(spark)
    out = str(tmp_path / "v2sink")
    pages = (synthesize_web_pages(spark, sf_smoke_dir).limit(40)
             .selectExpr("url", "warc_ts",
                         "CAST('response' AS STRING) AS record_type",
                         "CAST('text/html' AS STRING) AS content_type",
                         "html"))
    # 6 partitions over 40 rows + a filter that empties some partitions
    # V2 python sinks accept only Append/Overwrite save modes
    pages.repartition(6).write.format("warc").mode("append").save(out)
    names = sorted(os.listdir(out))
    assert all(n.endswith(".warc.gz") and not n.startswith(".")
               for n in names)
    back = spark.read.format("warc").load(out)
    a = {(r["url"], bytes(r["html"]))
         for r in pages.select("url", "html").collect()}
    b = {(r["url"], bytes(r["html"]))
         for r in back.select("url", "html").collect()}
    assert a == b

    # overwrite replaces: write a smaller relation, old parts must go
    pages.limit(5).repartition(1).write.format("warc") \
        .mode("overwrite").save(out)
    assert spark.read.format("warc").load(out).count() == 5
    assert not any(n.startswith(".") for n in os.listdir(out))
