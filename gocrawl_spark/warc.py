"""WARC source/sink — the web-archive interchange format (ISO 28500).

The reference engine fetches the live web; archived crawls in the
wider ecosystem are exchanged as WARC (wget/Heritrix/CommonCrawl all
emit it), so the engine speaks it as a first-class corpus format next
to parquet. Spark-first shape:

- ``write_warc``: one ``.warc[.gz]`` file per input partition, written
  INSIDE the task (the standard Spark custom-sink pattern: task-local
  file named by partition id, idempotent under retry because a rerun
  overwrites the same name with identical bytes — every field is a
  pure function of the row). No driver hop, no shuffle: a 100 TB
  corpus streams partition-by-partition into archive files.
- ``read_warc``: ``binaryFile`` scan → ``mapInPandas`` record parser.
  Parallelism is per-FILE (real-world WARCs are ~1 GB, the CommonCrawl
  segment convention), payload bytes never leave the task that read
  them, and the parser walks records by Content-Length — payloads
  containing header-like byte sequences cannot desynchronize it.

Record layout written (response records only, the crawl-relevant
type): WARC/1.0 headers with deterministic record ids
(``<urn:sha256:...>`` of the URL — no RNG, so archives are
byte-reproducible), payload = a minimal HTTP/1.1 response envelope
around the html bytes. The reader accepts plain and gzip (single- or
multi-member) files and tolerates ``warcinfo``/``request`` records by
skipping every non-response type.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

_CRLF = b"\r\n"
_WARC_TS = "%Y-%m-%dT%H:%M:%SZ"


def _record_bytes(url: str, ts, html: bytes) -> bytes:
    """One deterministic WARC response record (headers + HTTP payload)."""
    if html is None:
        html = b""
    # pd.isna, not `is None`: a null timestamp column arrives from
    # Arrow as pandas NaT, which strftime would reject
    when = "1970-01-01T00:00:00Z" if ts is None or pd.isna(ts) else ts.strftime(_WARC_TS)
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n" + html
    )
    rid = hashlib.sha256(url.encode("utf-8")).hexdigest()
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:sha256:" + rid.encode() + b">\r\n"
        b"WARC-Date: " + when.encode() + b"\r\n"
        b"WARC-Target-URI: " + url.encode("utf-8") + b"\r\n"
        b"Content-Type: application/http;msgtype=response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
    )
    return head + http + _CRLF + _CRLF


def _write_archive(
    sel: DataFrame, out_dir: str, compress: bool, base_ext: str, rec_fn
) -> DataFrame:
    """Shared archive sink: stream `rec_fn(*row)` record bytes into
    one (gzip) file per partition, atomic-publish, return the
    manifest. O(record) task memory; mtime=0 keeps compressed output
    byte-reproducible."""
    os.makedirs(out_dir, exist_ok=True)
    ext = base_ext + (".gz" if compress else "")
    # one archive dir = one archive per format: drop stale part files
    # from a prior write of the SAME format (a re-run with fewer
    # partitions, or a now-empty partition, would otherwise leave ghost
    # records that the reader resurrects). Matching is on the exact
    # extension so a WARC sweep never deletes a companion WET archive
    # ('.warc.wet' must not match a '.warc' sweep) and vice versa.
    for name in os.listdir(out_dir):
        stem = name[: -len(".gz")] if name.endswith(".gz") else name
        if name.startswith("part-") and stem.endswith(base_ext):
            os.remove(os.path.join(out_dir, name))
    cols = sel.columns

    def sink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        tmp = path + ".inprogress"
        raw_f = open(tmp, "wb")
        f = gzip.GzipFile(fileobj=raw_f, mode="wb", mtime=0) if compress else raw_f
        n = 0
        try:
            for pdf in batches:
                for row in zip(*[pdf[c] for c in cols]):
                    f.write(rec_fn(*row))
                    n += 1
        finally:
            f.close()
            if f is not raw_f:
                raw_f.close()
        if n:
            os.replace(tmp, path)  # atomic publish (retry-idempotent)
            yield pd.DataFrame(
                {"path": [path], "n_records": [n], "n_bytes": [os.path.getsize(path)]}
            )
        else:
            os.remove(tmp)

    manifest = sel.mapInPandas(sink, schema="path string, n_records long, n_bytes long")
    rows = manifest.collect()  # drive the write; manifest is tiny (1 row/partition)
    return sel.sparkSession.createDataFrame(
        rows or [], "path string, n_records long, n_bytes long"
    )


def write_warc(
    corpus: DataFrame,
    out_dir: str,
    compress: bool = True,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
) -> DataFrame:
    """Archive a corpus as WARC files, one per partition; returns the
    written manifest (path, n_records, n_bytes) — an ACTION has already
    run (the write happens eagerly so the manifest is truthful)."""
    return _write_archive(
        corpus.select(url_col, ts_col, html_col),
        out_dir,
        compress,
        ".warc",
        lambda url, ts, html: _record_bytes(
            url, ts, bytes(html) if html is not None else b""
        ),
    )


def _wet_record_bytes(url: str, ts, text: str) -> bytes:
    """One deterministic WET `conversion` record — the Common-Crawl
    extracted-text delivery format: plain-text payload, refers-to the
    response record of the same URL (same sha256 URN scheme as
    _record_bytes, so a WARC+WET pair cross-links)."""
    body = (text or "").encode("utf-8")
    when = "1970-01-01T00:00:00Z" if ts is None or pd.isna(ts) else ts.strftime(_WARC_TS)
    rid = hashlib.sha256(url.encode("utf-8")).hexdigest()
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Record-ID: <urn:sha256:wet:" + rid.encode() + b">\r\n"
        b"WARC-Refers-To: <urn:sha256:" + rid.encode() + b">\r\n"
        b"WARC-Date: " + when.encode() + b"\r\n"
        b"WARC-Target-URI: " + url.encode("utf-8") + b"\r\n"
        b"Content-Type: text/plain\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
    )
    return head + body + _CRLF + _CRLF


def write_wet(
    extracted: DataFrame,
    out_dir: str,
    compress: bool = True,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """Deliver extracted text as WET (`conversion`) archives — the
    Common-Crawl companion format downstream text pipelines consume
    without touching the response HTML. Same sink contract as
    write_warc: one file per partition, atomic publish, manifest
    returned."""
    return _write_archive(
        extracted.select(url_col, ts_col, text_col),
        out_dir,
        compress,
        ".warc.wet",
        _wet_record_bytes,
    )


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET files → (url, warc_ts, text) rows; conversion records only,
    every other record type skipped."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, whens, texts = [], [], []
            for content in pdf["content"]:
                data = _decompress(bytes(content))
                for headers, payload in _iter_records(data):
                    if headers.get("warc-type") != "conversion":
                        continue
                    urls.append(headers.get("warc-target-uri", ""))
                    ts = headers.get("warc-date")
                    try:
                        whens.append(
                            datetime.strptime(ts, _WARC_TS).replace(
                                tzinfo=timezone.utc
                            )
                            if ts
                            else None
                        )
                    except ValueError:
                        whens.append(None)
                    texts.append(payload.decode("utf-8", "replace"))
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype="object"),
                    "warc_ts": pd.Series(whens, dtype="datetime64[ns, UTC]"),
                    "text": pd.Series(texts, dtype="object"),
                }
            )

    files = spark.read.format("binaryFile").load(path)
    return files.select("content").mapInPandas(
        parse, schema="url string, warc_ts timestamp, text string"
    )


def _decompress(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":  # gzip magic; GzipFile reads multi-member
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as gz:
            return gz.read()
    return data


def _iter_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """(headers, payload) per record, walked strictly by Content-Length
    so payload bytes can contain anything."""
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        head_end = data.find(b"\r\n\r\n", start)
        if head_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[start:head_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if v:
                headers[k.decode("ascii", "replace").strip().lower()] = v.decode(
                    "utf-8", "replace"
                ).strip()
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            clen = 0
        body_start = head_end + 4
        yield headers, data[body_start : body_start + clen]
        pos = body_start + clen


def _parse_http(payload: bytes) -> tuple[int, bytes]:
    """(status, body) from an HTTP response payload."""
    split = payload.find(b"\r\n\r\n")
    if split < 0:
        return 0, payload
    head = payload[:split].split(_CRLF)[0].split(b" ")
    try:
        status = int(head[1])
    except (IndexError, ValueError):
        status = 0
    return status, payload[split + 4 :]


def _parse_warc_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel shared by the batch and streaming readers."""
    for pdf in batches:
        urls, whens, htmls, statuses = [], [], [], []
        for content in pdf["content"]:
            data = _decompress(bytes(content))
            for headers, payload in _iter_records(data):
                if headers.get("warc-type") != "response":
                    continue
                status, body = _parse_http(payload)
                urls.append(headers.get("warc-target-uri", ""))
                ts = headers.get("warc-date")
                try:
                    whens.append(
                        datetime.strptime(ts, _WARC_TS).replace(tzinfo=timezone.utc)
                        if ts
                        else None
                    )
                except ValueError:
                    whens.append(None)
                htmls.append(body)
                statuses.append(status)
        # explicit dtype: an all-skipped batch must still emit a
        # timestamp-typed column (Arrow rejects empty float64 → ts)
        yield pd.DataFrame(
            {
                "url": pd.Series(urls, dtype="object"),
                "warc_ts": pd.Series(whens, dtype="datetime64[ns, UTC]"),
                "html": pd.Series(htmls, dtype="object"),
                "status": pd.Series(statuses, dtype="int32"),
            }
        )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files → (url, warc_ts, html, status) rows; response records
    only, every other record type skipped."""
    files = spark.read.format("binaryFile").load(path)
    return files.select("content").mapInPandas(
        _parse_warc_batches,
        schema="url string, warc_ts timestamp, html binary, status int",
    )


_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def read_warc_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of :func:`read_warc`: a ``binaryFile`` file
    stream over an archive landing directory → the same per-record
    parse — continuous WARC ingest (e.g. an archiving crawler dropping
    one segment per flush). Plug into writeStream with a checkpoint
    for exactly-once, restart-safe ingestion; combine with
    streaming.stream_extract's trigger conventions. Whole files are
    the unit of progress (the WARC convention — ~1 GB segments), so a
    half-written file must be land-then-rename, exactly what
    write_warc's .inprogress → rename publish does."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(_BINARYFILE_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .load(path)
    )
    return files.select("content").mapInPandas(
        _parse_warc_batches,
        schema="url string, warc_ts timestamp, html binary, status int",
    )


def warc_corpus(spark: SparkSession, path: str) -> DataFrame:
    """WARC archive → crawl-corpus shape (PAGES_CORPUS columns; text and
    lang are NULL — extraction derives everything from html). Drop-in
    for CrawlRun(corpus=...): the fetch join needs url + html only."""
    return read_warc(spark, path).filter(F.col("status") == 200).select(
        "url",
        "warc_ts",
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


__all__ = ["write_warc", "read_warc", "read_warc_stream", "warc_corpus",
           "write_wet", "read_wet"]
