"""WARC file source via the Spark 4 Python Data Source API.

Common Crawl ships as WARC (ISO 28500) — the native wire format of the
north star's "Common-Crawl-style web pages".  The reference has no WARC
path (its URL handler downloads one live page, `core/input/handlers.py:
124-304`); at corpus scale ingestion reads archived crawl files instead.

Spark-first shape:

* one :class:`InputPartition` per ``.warc`` file — crawls are published as
  many ~1 GB files (Common Crawl: ~64k per snapshot), so the file is the
  natural parallelism unit and a 1000-executor cluster load-balances on
  files with zero coordination;
* the reader emits Arrow-friendly plain tuples matching the ``web_pages``
  schema, so ``spark.read.format("warc").load(dir)`` drops straight into
  the extraction pipeline;
* parsing is stdlib-only (the WARC framing is length-prefixed: the
  ``Content-Length`` header sizes each record, ``\\r\\n\\r\\n`` separates
  header block from payload) — no external crawl libraries.

The writer half (:func:`write_warc`) exists for tests and for round-trip
oracles: it produces byte-deterministic files (fixed WARC-Date, sorted
extra headers), so reading back what was written is closed-form checkable.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone
from typing import Iterator, List, Mapping, Optional, Sequence, Tuple

CRLF = b"\r\n"


# ----------------------------------------------------------------- parsing


def parse_warc_records(
    data: bytes,
) -> Iterator[Tuple[dict, bytes]]:
    """Yield (headers, payload) per WARC record in one file's bytes.

    Framing per ISO 28500: a ``WARC/x.y`` version line, header lines until
    an empty line, exactly ``Content-Length`` payload bytes, then two CRLFs
    before the next record.  Malformed trailing garbage ends the scan
    instead of raising — a truncated crawl file yields its complete prefix.
    """
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data.startswith(CRLF, pos):
            pos += 2
        if pos >= n:
            return
        header_end = data.find(CRLF + CRLF, pos)
        if header_end < 0:
            return
        header_block = data[pos:header_end].decode("utf-8", "replace")
        lines = header_block.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            return
        headers: dict = {"__version__": lines[0]}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        payload_start = header_end + 4
        payload_end = payload_start + length
        if payload_end > n:
            return
        yield headers, data[payload_start:payload_end]
        pos = payload_end


def split_http_response(payload: bytes) -> Tuple[dict, bytes]:
    """Split a ``WARC-Type: response`` payload into (http headers, body)."""
    sep = payload.find(CRLF + CRLF)
    if sep < 0 or not payload.startswith(b"HTTP/"):
        return {}, payload
    headers: dict = {}
    head = payload[:sep].decode("utf-8", "replace")
    for line in head.split("\r\n")[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    return headers, payload[sep + 4:]


# ----------------------------------------------------------------- writing


def warc_record_bytes(
    url: str,
    body: bytes,
    warc_type: str = "response",
    content_type: str = "text/html",
    warc_date: str = "2024-01-01T00:00:00Z",
    extra_headers: Optional[Mapping[str, str]] = None,
) -> bytes:
    """One byte-deterministic WARC record (HTTP response framing for
    ``response`` records, raw payload otherwise)."""
    if warc_type == "response":
        http_head = (
            f"HTTP/1.1 200 OK\r\nContent-Type: {content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        payload = http_head + body
        payload_ct = "application/http; msgtype=response"
    else:
        payload = body
        payload_ct = content_type
    head_lines = [
        "WARC/1.0",
        f"WARC-Type: {warc_type}",
        f"WARC-Target-URI: {url}",
        f"WARC-Date: {warc_date}",
        f"Content-Type: {payload_ct}",
        f"Content-Length: {len(payload)}",
    ]
    for k in sorted(extra_headers or {}):
        head_lines.append(f"{k}: {extra_headers[k]}")
    return ("\r\n".join(head_lines) + "\r\n\r\n").encode() + payload + CRLF + CRLF


def write_warc(path: str, records: Sequence[Tuple[str, bytes]],
               gzip_per_record: Optional[bool] = None, **kwargs) -> None:
    """Write (url, body) pairs as one WARC file.

    ``gzip_per_record`` (default: inferred from a ``.gz`` path suffix)
    writes each record as its OWN gzip member — the Common Crawl
    convention (each record independently range-fetchable; readers see one
    transparent concatenated stream).  mtime=0 and no filename in the gzip
    header keep the output byte-deterministic like the plain writer."""
    if gzip_per_record is None:
        gzip_per_record = path.endswith(".gz")
    if gzip_per_record:
        with open(path, "wb") as f:
            for url, body in records:
                f.write(_gzip_member(warc_record_bytes(url, body, **kwargs)))
        return
    with open(path, "wb") as f:
        for url, body in records:
            f.write(warc_record_bytes(url, body, **kwargs))


def _gzip_member(blob: bytes) -> bytes:
    """One deterministic gzip member (mtime=0, no filename)."""
    import gzip as _gzip
    import io

    buf = io.BytesIO()
    with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(blob)
    return buf.getvalue()


def write_wet(extracted, out_dir: str, n_files: int = 16,
              gzip_members: bool = True) -> None:
    """Extracted-text DataFrame → WET-style crawl files (WARC ``conversion``
    records, the Common Crawl WET layout), written FROM EXECUTORS.

    Takes any relation with (url, text) — e.g. ``PipelineResult.extracted``
    — and writes ``n_files`` deterministic files: rows hash-partition on
    url so every output file is built whole by one task and no text ever
    collects to the driver; within a file records are url-sorted, so the
    same relation always produces the same bytes (byte-deterministic like
    the writer above; one gzip member per record when ``gzip_members``).
    At cluster scale ``out_dir`` is shared storage.
    """
    import os as _os

    from pyspark.sql import functions as F

    _os.makedirs(out_dir, exist_ok=True)
    bucket = F.pmod(F.xxhash64(F.col("url")), F.lit(n_files)).alias("bucket")
    rows = (
        extracted.filter(F.col("url").isNotNull())  # a NULL uri would
        .select("url", "text", bucket)              # serialize as 'None'
        .repartition(n_files, F.col("bucket"))
        .sortWithinPartitions("bucket", "url")
    )
    gz = gzip_members

    def write_partition(it) -> None:
        # complete-on-appearance publish contract (see _stream_reader_cls):
        # write under a dot-temp name, rename into place at close; a failed
        # task leaves only temp litter, never a truncated final-named file
        # that downstream readers would accept as complete
        cur, fh, tmp, final = None, None, None, None

        def close_and_publish() -> None:
            nonlocal fh
            if fh is not None:
                fh.close()
                _os.replace(tmp, final)
                fh = None

        try:
            for r in it:
                if r.bucket != cur:
                    close_and_publish()
                    suffix = ".warc.gz" if gz else ".warc"
                    final = _os.path.join(
                        out_dir, f"wet-{int(r.bucket):05d}{suffix}")
                    tmp = _os.path.join(
                        out_dir, f".wet-{int(r.bucket):05d}{suffix}.tmp")
                    fh = open(tmp, "wb")
                    info = warc_record_bytes(
                        "urn:dgspark:wetinfo",
                        b"format: WET-style conversion",
                        warc_type="warcinfo",
                        content_type="application/warc-fields")
                    fh.write(_gzip_member(info) if gz else info)
                    cur = r.bucket
                rec = warc_record_bytes(
                    r.url, (r.text or "").encode("utf-8"),
                    warc_type="conversion", content_type="text/plain")
                fh.write(_gzip_member(rec) if gz else rec)
            close_and_publish()
        finally:
            if fh is not None:       # error path: drop the partial temp
                fh.close()
                try:
                    _os.remove(tmp)
                except OSError:
                    pass

    rows.foreachPartition(write_partition)


# ------------------------------------------------------- Spark data source

# columns emitted by the reader (web_pages-compatible prefix)
WARC_SCHEMA_DDL = (
    "url string, warc_ts timestamp, record_type string, "
    "content_type string, html binary"
)


def _make_warc_writer(options, overwrite: bool):
    """DataSourceWriter for the warc format (the V2 write path).

    Each task serializes its rows into ONE dot-temp ``.warc.gz`` file
    (per-record gzip members, byte-deterministic) and returns the temp
    name as its commit message; ``commit`` renames every temp into place
    (publish-on-commit — a reader never sees a half-written final name),
    ``abort`` deletes the temps.  Rows use the warc read schema (url,
    warc_ts, record_type, content_type, html); NULL record/content types
    default to response/text-html."""
    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

    class _Commit(WriterCommitMessage):
        def __init__(self, tmp: str, final: str) -> None:
            self.tmp = tmp
            self.final = final

    class _WarcWriter(DataSourceWriter):
        def __init__(self) -> None:
            self.path = options.get("path")
            if not self.path:
                raise ValueError("warc sink requires a path")
            self.overwrite = overwrite

        def write(self, iterator):
            from pyspark import TaskContext

            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else 0
            os.makedirs(self.path, exist_ok=True)
            final = os.path.join(self.path, f"part-{pid:05d}.warc.gz")
            tmp = os.path.join(self.path, f".part-{pid:05d}.warc.gz.tmp")
            wrote = False
            with open(tmp, "wb") as fh:
                for row in iterator:
                    ts = row["warc_ts"]
                    rec = warc_record_bytes(
                        row["url"],
                        bytes(row["html"] or b""),
                        warc_type=row["record_type"] or "response",
                        content_type=row["content_type"] or "text/html",
                        warc_date=(ts.strftime("%Y-%m-%dT%H:%M:%SZ")
                                   if ts is not None
                                   else "2024-01-01T00:00:00Z"),
                    )
                    fh.write(_gzip_member(rec))
                    wrote = True
            if not wrote:
                os.remove(tmp)  # empty partitions publish nothing
                return _Commit("", "")
            return _Commit(tmp, final)

        def commit(self, messages):
            if self.overwrite:
                for f in _list_warc_files(self.path):
                    os.remove(f)
            for m in messages:
                if m is not None and m.tmp:
                    os.replace(m.tmp, m.final)

        def abort(self, messages):
            for m in messages:
                if m is not None and m.tmp:
                    try:
                        os.remove(m.tmp)
                    except OSError:
                        pass

    return _WarcWriter()


def _list_warc_files(path: str) -> List[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith((".warc", ".warc.gz"))
    )


# decompressed-size cap per crawl file: a hostile/corrupt gzip member can
# expand a few KB to tens of GB and OOM the executor (crawl files are
# published ~1 GB compressed, ~<5 GB decompressed).  Reads are truncated at
# the cap; parse_warc_records yields the complete-record prefix, so a
# capped file degrades to fewer records, never a crash.
MAX_DECOMPRESSED_BYTES = int(os.environ.get(
    "DGSPARK_WARC_MAX_DECOMPRESSED", str(8 << 30)))


def _gunzip_members(raw: bytes, cap: int) -> bytes:
    """Decompress concatenated gzip members up to ``cap`` output bytes.

    Tolerates truncation and corruption the way the record parser does:
    a member cut off mid-stream (an in-flight crawl file still being
    written) or a corrupt member yields the decompressed prefix instead of
    raising — parse_warc_records then emits the complete-record prefix.
    (gzip.open().read() raises EOFError on a truncated final member, which
    would crash a streaming micro-batch that listed an in-flight file.)"""
    import zlib

    parts: List[bytes] = []
    total = 0
    buf = raw
    while buf and total < cap:
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(buf, cap - total)
        except zlib.error:
            break  # corrupt member: keep the complete prefix
        parts.append(out)
        total += len(out)
        if not d.eof:
            break  # truncated member (or output cap hit): stop cleanly
        buf = d.unused_data
    return b"".join(parts)


def _read_warc_file(path: str,
                    max_bytes: Optional[int] = None) -> Iterator[Tuple]:
    cap = MAX_DECOMPRESSED_BYTES if max_bytes is None else max_bytes
    if path.endswith(".gz"):
        with open(path, "rb") as f:
            data = _gunzip_members(f.read(), cap)
    else:
        with open(path, "rb") as f:
            data = f.read(cap)
    for headers, payload in parse_warc_records(data):
        rtype = headers.get("warc-type", "")
        url = headers.get("warc-target-uri")
        ts_raw = headers.get("warc-date", "")
        try:
            ts = datetime.strptime(ts_raw, "%Y-%m-%dT%H:%M:%SZ").replace(
                tzinfo=timezone.utc
            )
        except ValueError:
            ts = None
        if rtype == "response":
            http_headers, body = split_http_response(payload)
            ctype = http_headers.get(
                "content-type", headers.get("content-type", "")
            )
        else:
            body = payload
            ctype = headers.get("content-type", "")
        yield (url, ts, rtype, ctype, body)


def _stream_reader_cls():
    """Build the streaming reader class lazily (keeps the datasource API
    import optional, like the batch reader below).

    Continuous crawl ingestion: a crawl directory GROWS — new
    ``*.warc(.gz)`` files land as the crawler publishes them.  Offsets are
    a high-watermark over the sorted file names (`{"watermark": name}`):
    every file with name <= watermark has been emitted.  That matches the
    Common Crawl naming scheme (sequence-numbered
    ``...-00000/00001/...warc.gz``), where new files always sort after old
    ones — the same monotonic-name contract documented for the batch
    source's one-partition-per-file layout.  One micro-batch partition per
    new file; commit() is a no-op because the watermark in the checkpoint
    IS the durable state (the engine persists offsets, the source stays
    stateless — resume replays nothing).

    Publish contract: a file must be COMPLETE when it appears under its
    final name (write to a temp name or another directory, then rename —
    the standard crawler pattern; Common Crawl snapshots are immutable).
    A file caught mid-write does not crash the batch — the gzip reader
    salvages the complete-member prefix (`_gunzip_members`) and the record
    parser the complete-record prefix — but records appended after the
    read are behind the committed watermark and will not be re-read."""
    from pyspark.sql.datasource import DataSourceStreamReader, InputPartition

    class _WarcFilePartition(InputPartition):
        def __init__(self, path: str) -> None:
            self.path = path

    class _WarcStreamReader(DataSourceStreamReader):
        def __init__(self, options) -> None:
            self.path = options.get("path")
            if not self.path:
                raise ValueError("warc source requires a path")

        def initialOffset(self) -> dict:
            return {"watermark": ""}

        def latestOffset(self) -> dict:
            files = _list_warc_files(self.path)
            last = os.path.basename(files[-1]) if files else ""
            return {"watermark": last}

        def partitions(self, start: dict, end: dict):
            lo = start.get("watermark", "")
            hi = end.get("watermark", "")
            return [
                _WarcFilePartition(p)
                for p in _list_warc_files(self.path)
                if lo < os.path.basename(p) <= hi
            ]

        def read(self, partition):
            return _read_warc_file(partition.path)

        def commit(self, end: dict) -> None:
            pass

    return _WarcStreamReader


def register_warc_source(spark) -> None:
    """Register the ``warc`` format on a session (idempotent).

    The DataSource subclass is defined inside so importing this module never
    requires the pyspark datasource API (kept optional for older runtimes).
    """
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _WarcFilePartition(InputPartition):
        def __init__(self, path: str) -> None:
            self.path = path

    class _WarcReader(DataSourceReader):
        def __init__(self, options) -> None:
            self.path = options.get("path")
            if not self.path:
                raise ValueError("warc source requires a path")

        def partitions(self) -> Sequence[InputPartition]:
            # one partition per crawl file: the Common-Crawl parallelism
            # unit; an empty dir yields zero partitions, not an error
            return [_WarcFilePartition(p)
                    for p in _list_warc_files(self.path)]

        def read(self, partition) -> Iterator[Tuple]:
            return _read_warc_file(partition.path)

    class WarcDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "warc"

        def schema(self) -> str:
            return WARC_SCHEMA_DDL

        def reader(self, schema) -> DataSourceReader:
            return _WarcReader(self.options)

        def writer(self, schema, overwrite: bool):
            # V2 sink symmetry: df.write.format("warc").save(dir) —
            # per-task WARC files with a commit/abort protocol (see
            # _make_warc_writer): tasks write dot-temp files and return
            # commit messages; commit() publishes them atomically,
            # abort() removes the litter.  Same gzip-member layout as the
            # read path, so a write→read roundtrip is lossless.
            return _make_warc_writer(self.options, overwrite)

        def streamReader(self, schema):
            # continuous crawl ingestion: spark.readStream.format("warc")
            # tails the directory by file-name watermark (see
            # _stream_reader_cls) — checkpointed, so restart resumes at
            # the last committed file without replays
            return _stream_reader_cls()(self.options)

    # re-registering on a session that already has the format is a no-op —
    # but ONLY the specific already-exists error is swallowed; a genuine
    # registration failure whose message merely mentions the format name
    # must still surface (it would otherwise fail later, confusingly, at
    # spark.read.format('warc'))
    try:
        spark.dataSource.register(WarcDataSource)
    except Exception as exc:  # pragma: no cover - runtime-version specific
        condition = ""
        for probe in ("getCondition", "getErrorClass"):
            fn = getattr(exc, probe, None)
            if callable(fn):
                try:
                    condition = fn() or ""
                    break
                except Exception:
                    pass
        already = "DATA_SOURCE_ALREADY_EXISTS"
        if already not in condition and already not in str(exc):
            raise
