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


def _ts_us(ts) -> int:
    """pandas Timestamp → epoch µs (0 for null — matches the writers'
    1970 sentinel)."""
    return 0 if ts is None or pd.isna(ts) else int(ts.value // 1000)


def _write_archive(
    sel: DataFrame,
    out_dir: str,
    compress: bool,
    base_ext: str,
    rec_fn,
    cdx_dir: str | None = None,
    cdx_fn=None,
    cdx_mime: str = "text/html",
) -> DataFrame:
    """Shared archive sink: stream `rec_fn(*row)` record bytes into
    one (gzip) file per partition, atomic-publish, return the
    manifest. O(record) task memory; mtime=0 keeps compressed output
    byte-reproducible.

    With `cdx_dir`, each task also writes a CDX sidecar parquet of
    (url, ts_us, file, offset, rec_bytes, digest, length, mime,
    status) — and
    compressed output switches to ONE GZIP MEMBER PER RECORD (the
    Common-Crawl WARC layout), so `offset`/`rec_bytes` are physical
    file coordinates: a random record is one ranged read + gunzip,
    never a scan. Python's gzip reads the concatenated members
    transparently, so the archive stays readable by the plain
    readers. `cdx_fn(url, ts, payload) -> (digest_hex, length)`
    supplies the content identity per format."""
    os.makedirs(out_dir, exist_ok=True)
    if cdx_dir:
        os.makedirs(cdx_dir, exist_ok=True)
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
    if cdx_dir:
        for name in os.listdir(cdx_dir):
            if name.startswith("part-") and name.endswith(".parquet"):
                os.remove(os.path.join(cdx_dir, name))
    cols = sel.columns

    def sink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        tmp = path + ".inprogress"
        raw_f = open(tmp, "wb")
        per_member = compress and cdx_dir is not None
        f = (
            raw_f
            if (not compress or per_member)
            else gzip.GzipFile(fileobj=raw_f, mode="wb", mtime=0)
        )
        n = 0
        idx: list[tuple] = []
        try:
            for pdf in batches:
                for row in zip(*[pdf[c] for c in cols]):
                    rec = rec_fn(*row)
                    if cdx_dir is not None:
                        off = raw_f.tell() if per_member else f.tell()
                        out = gzip.compress(rec, mtime=0) if per_member else rec
                        f.write(out)
                        digest, length = cdx_fn(*row)
                        idx.append(
                            (row[0], _ts_us(row[1]), path, off, len(out),
                             digest, length, cdx_mime, 200)
                        )
                    else:
                        f.write(rec)
                    n += 1
        finally:
            f.close()
            if f is not raw_f:
                raw_f.close()
        if n:
            os.replace(tmp, path)  # atomic publish (retry-idempotent)
            if cdx_dir is not None:
                import pyarrow as pa
                import pyarrow.parquet as pq

                t = pa.table(
                    dict(zip(
                        ("url", "ts_us", "file", "offset", "rec_bytes",
                         "digest", "length", "mime", "status"),
                        map(list, zip(*idx)),
                    ))
                )
                ipath = os.path.join(cdx_dir, f"part-{pid:05d}.parquet")
                pq.write_table(t, ipath + ".inprogress")
                os.replace(ipath + ".inprogress", ipath)
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
    cdx_dir: str | None = None,
) -> DataFrame:
    """Archive a corpus as WARC files, one per partition; returns the
    written manifest (path, n_records, n_bytes) — an ACTION has already
    run (the write happens eagerly so the manifest is truthful).

    `cdx_dir` additionally writes the CDX sidecar index (see
    _write_archive): per-record physical (file, offset, rec_bytes) —
    with compress=True the archive switches to one-gzip-member-per-
    record, the Common-Crawl layout that makes a CDX hit one ranged
    read. Load with :func:`read_cdx`."""
    return _write_archive(
        corpus.select(url_col, ts_col, html_col),
        out_dir,
        compress,
        ".warc",
        lambda url, ts, html: _record_bytes(
            url, ts, bytes(html) if html is not None else b""
        ),
        cdx_dir=cdx_dir,
        cdx_fn=lambda url, ts, html: (
            hashlib.sha256(bytes(html) if html is not None else b"").hexdigest(),
            len(html) if html is not None else 0,
        ),
    )


def read_cdx(spark: SparkSession, cdx_dir: str) -> DataFrame:
    """CDX sidecar → the standard capture-index shape with the SURT
    sort key attached: (surt, ts_us, url, mime, status, digest,
    length, file, offset, rec_bytes) — cdx.CDX_COLUMNS plus the
    physical coordinates. Feed to cdx.cdx_lookup / cdx.write_cdx; a
    hit resolves to one ranged read via :func:`fetch_record`."""
    from pyspark.sql import functions as F

    from .canonicalize import surt_key_expr

    df = spark.read.parquet(cdx_dir)
    return df.select(
        surt_key_expr("url").alias("surt"),
        "ts_us", "url", "mime", "status", "digest", "length",
        "file", "offset", "rec_bytes",
    )


def fetch_record(file: str, offset: int, rec_bytes: int) -> bytes:
    """Random-access record fetch: ONE ranged read of
    [offset, offset+rec_bytes), gunzipped if the slice is a gzip
    member — the replay path a CDX hit drives (pywb's range request
    against a .warc.gz)."""
    with open(file, "rb") as fh:
        fh.seek(offset)
        raw = fh.read(rec_bytes)
    return gzip.decompress(raw) if raw[:2] == b"\x1f\x8b" else raw


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
    cdx_dir: str | None = None,
) -> DataFrame:
    """Deliver extracted text as WET (`conversion`) archives — the
    Common-Crawl companion format downstream text pipelines consume
    without touching the response HTML. Same sink contract as
    write_warc: one file per partition, atomic publish, manifest
    returned; `cdx_dir` writes the sidecar capture index (see
    write_warc)."""
    return _write_archive(
        extracted.select(url_col, ts_col, text_col),
        out_dir,
        compress,
        ".warc.wet",
        _wet_record_bytes,
        cdx_dir=cdx_dir,
        cdx_fn=lambda url, ts, text: (
            hashlib.sha256((text or "").encode("utf-8")).hexdigest(),
            len((text or "").encode("utf-8")),
        ),
        cdx_mime="text/plain",
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


def _revisit_record_bytes(
    url: str, ts, refers_url: str, refers_ts, digest_hex: str
) -> bytes:
    """One deterministic WARC `revisit` record (WARC/1.1 §6.7.2,
    identical-payload-digest profile): no payload block — only the
    pointer headers at the original capture. This is the record
    Heritrix/Common Crawl emit instead of re-storing a byte-duplicate
    response."""
    when = "1970-01-01T00:00:00Z" if ts is None or pd.isna(ts) else ts.strftime(_WARC_TS)
    rwhen = (
        "1970-01-01T00:00:00Z"
        if refers_ts is None or pd.isna(refers_ts)
        else refers_ts.strftime(_WARC_TS)
    )
    rid = hashlib.sha256(url.encode("utf-8")).hexdigest()
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: revisit\r\n"
        b"WARC-Profile: http://netpreserve.org/warc/1.1/revisit/"
        b"identical-payload-digest\r\n"
        b"WARC-Record-ID: <urn:sha256:rv:" + rid.encode() + b">\r\n"
        b"WARC-Date: " + when.encode() + b"\r\n"
        b"WARC-Target-URI: " + url.encode("utf-8") + b"\r\n"
        b"WARC-Refers-To-Target-URI: " + (refers_url or "").encode("utf-8") + b"\r\n"
        b"WARC-Refers-To-Date: " + rwhen.encode() + b"\r\n"
        b"WARC-Payload-Digest: sha-256:" + (digest_hex or "").encode() + b"\r\n"
        b"Content-Length: 0\r\n\r\n"
    ) + _CRLF + _CRLF


def write_warc_deduped(
    corpus: DataFrame,
    out_dir: str,
    compress: bool = True,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
) -> DataFrame:
    """write_warc with digest-based payload dedup: the earliest capture
    of each sha256(html) is stored as a full `response` record, every
    later capture of the same bytes becomes a zero-payload `revisit`
    record pointing at it — the Common-Crawl/Heritrix storage layout.
    :func:`read_warc` on the output sees only the stored responses
    (revisits are not `response` records); :func:`read_warc_deduped`
    reconstructs the FULL capture set by digest join.

    Scale shape: the election is cdx.revisit_records (map-side-combined
    min(struct) groupBy + digest equi-join — a hot digest never
    serializes onto one task); the classification joins back to the
    corpus on (url, ts) — an equi-join co-shuffled on the same key —
    and revisit rows drop their payload BEFORE the sink, so duplicate
    bytes never travel to the writer. Response records carry
    WARC-Payload-Digest too, so the rehydrating reader joins on a
    header, not a recomputed hash.
    """
    from . import cdx as cdxmod

    src = corpus.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("warc_ts"),
        F.col(html_col).alias("html"),
    ).withColumn("ts_us", F.unix_micros("warc_ts"))
    rec = cdxmod.revisit_records(
        src, url_col="url", ts_col="ts_us", payload_col="html"
    )
    is_resp = F.col("record_type") == "response"
    sel = (
        src.join(rec, ["url", "ts_us"])
        .select(
            "url",
            "warc_ts",
            F.when(is_resp, F.col("html")).alias("html"),
            "record_type",
            "refers_to_url",
            F.timestamp_micros(F.col("refers_to_ts_us")).alias("refers_to_ts"),
            "digest",
        )
    )

    def rec_fn(url, ts, html, rtype, r_url, r_ts, digest):
        if rtype == "response":
            body = bytes(html) if html is not None else b""
            full = _record_bytes(url, ts, body)
            # splice the payload digest into the header block so the
            # rehydrating reader never re-hashes stored bytes
            head, sep, rest = full.partition(b"\r\nContent-Type: application/http")
            return (
                head
                + b"\r\nWARC-Payload-Digest: sha-256:" + digest.encode()
                + sep + rest
            )
        return _revisit_record_bytes(url, ts, r_url, r_ts, digest)

    return _write_archive(sel, out_dir, compress, ".warc", rec_fn)


def _parse_warc_dedup_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Like _parse_warc_batches but keeps `revisit` records and the
    WARC-Payload-Digest header so the reader can rehydrate."""
    for pdf in batches:
        urls, whens, htmls, statuses, types, digests = [], [], [], [], [], []
        for content in pdf["content"]:
            data = _decompress(bytes(content))
            for headers, payload in _iter_records(data):
                rtype = headers.get("warc-type")
                if rtype not in ("response", "revisit"):
                    continue
                if rtype == "response":
                    status, body = _parse_http(payload)
                else:
                    status, body = 0, None
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
                types.append(rtype)
                digests.append(
                    headers.get("warc-payload-digest", "").removeprefix("sha-256:")
                )
        yield pd.DataFrame(
            {
                "url": pd.Series(urls, dtype="object"),
                "warc_ts": pd.Series(whens, dtype="datetime64[ns, UTC]"),
                "html": pd.Series(htmls, dtype="object"),
                "status": pd.Series(statuses, dtype="int32"),
                "record_type": pd.Series(types, dtype="object"),
                "digest": pd.Series(digests, dtype="object"),
            }
        )


def read_warc_deduped(spark: SparkSession, path: str) -> DataFrame:
    """Read a :func:`write_warc_deduped` archive back to the FULL
    capture set: (url, warc_ts, html, status, was_revisit). Revisit
    rows get their payload (and HTTP status) from the stored response
    with the same WARC-Payload-Digest — one digest-keyed equi-join;
    stored payload bytes travel once, never per-revisit-file."""
    parsed = (
        spark.read.format("binaryFile")
        .load(path)
        .select("content")
        .mapInPandas(
            _parse_warc_dedup_batches,
            schema=(
                "url string, warc_ts timestamp, html binary, status int,"
                " record_type string, digest string"
            ),
        )
    )
    originals = parsed.filter(F.col("record_type") == "response").select(
        F.col("digest").alias("digest"),
        F.col("html").alias("_o_html"),
        F.col("status").alias("_o_status"),
    )
    return (
        parsed.join(originals, "digest", "left")
        .select(
            "url",
            "warc_ts",
            F.coalesce("html", "_o_html").alias("html"),
            F.when(F.col("record_type") == "response", F.col("status"))
            .otherwise(F.col("_o_status"))
            .cast("int")
            .alias("status"),
            (F.col("record_type") == "revisit").alias("was_revisit"),
        )
    )


__all__ = ["write_warc", "read_warc", "read_warc_stream", "warc_corpus",
           "write_wet", "read_wet", "write_warc_deduped", "read_warc_deduped",
           "wat_metadata", "write_wat", "read_wat"]


# ---------------------------------------------------------------------------
# WAT — Common Crawl's metadata companion (WARC-Type: metadata records
# whose payload is a JSON "Envelope" describing the response: head
# title + outgoing links). Completes the WARC/WAT/WET delivery trio.
# ---------------------------------------------------------------------------


def _wat_record_bytes(url: str, ts, title: str, links) -> bytes:
    """One deterministic WAT `metadata` record: JSON Envelope payload
    (sorted keys, no whitespace — byte-reproducible), refers-to the
    response record of the same URL (the shared sha256 URN scheme)."""
    import json

    when = "1970-01-01T00:00:00Z" if ts is None or pd.isna(ts) else ts.strftime(_WARC_TS)
    env = {
        "Envelope": {
            "WARC-Header-Metadata": {
                "WARC-Date": when,
                "WARC-Target-URI": url,
                "WARC-Type": "response",
            },
            "Payload-Metadata": {
                "HTTP-Response-Metadata": {
                    "HTML-Metadata": {
                        "Head": {"Title": title or ""},
                        "Links": [
                            {"path": "A@/href", "url": str(l)}
                            for l in (links if links is not None else [])
                        ],
                    }
                }
            },
        }
    }
    body = json.dumps(env, sort_keys=True, separators=(",", ":")).encode("utf-8")
    rid = hashlib.sha256(url.encode("utf-8")).hexdigest()
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: metadata\r\n"
        b"WARC-Record-ID: <urn:sha256:wat:" + rid.encode() + b">\r\n"
        b"WARC-Refers-To: <urn:sha256:" + rid.encode() + b">\r\n"
        b"WARC-Date: " + when.encode() + b"\r\n"
        b"WARC-Target-URI: " + url.encode("utf-8") + b"\r\n"
        b"Content-Type: application/json\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
    )
    return head + body + _CRLF + _CRLF


def wat_metadata(
    corpus: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
) -> DataFrame:
    """(url, warc_ts, title, links) per page — the WAT extraction pass:
    <title> text plus every a[href] in document order (the UNFILTERED
    raw-page link stream, deliberately upstream of the crawl kernel's
    exclude-selectors: WAT describes the page as served). One
    Arrow-batched parse per page inside the task that scanned it;
    payload bytes never shuffle."""
    from gocrawl_spark.extract import extract_links
    from gocrawl_spark.htmlmini.css import find
    from gocrawl_spark.htmlmini.dom import parse

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            titles, links = [], []
            for raw in pdf[html_col]:
                html = (
                    bytes(raw).decode("utf-8", "replace")
                    if isinstance(raw, (bytes, bytearray, memoryview))
                    else (raw or "")
                )
                root = parse(html)
                t = find(root, "title")
                titles.append(t[0].text().strip() if t else "")
                links.append(extract_links(root))
            yield pd.DataFrame(
                {
                    "url": pdf[url_col].astype("object"),
                    "warc_ts": pdf[ts_col],
                    "title": pd.Series(titles, dtype="object"),
                    "links": pd.Series(links, dtype="object"),
                }
            )

    return corpus.select(url_col, ts_col, html_col).mapInPandas(
        gen, schema="url string, warc_ts timestamp, title string, links array<string>"
    )


def write_wat(
    meta: DataFrame,
    out_dir: str,
    compress: bool = True,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    title_col: str = "title",
    links_col: str = "links",
    cdx_dir: str | None = None,
) -> DataFrame:
    """Archive page metadata as WAT files (one per partition, atomic
    publish, manifest returned — write_warc's sink contract). Input is
    :func:`wat_metadata`'s shape; `cdx_dir` writes the capture-index
    sidecar keyed by the JSON payload digest."""
    import json as _json

    def _digest(url, ts, title, links):
        body = _wat_record_bytes(url, ts, title, links)
        # digest the JSON payload only (after the blank line), matching
        # the other formats' payload-identity convention
        payload = body.split(b"\r\n\r\n", 1)[1][: -len(_CRLF * 2)]
        return hashlib.sha256(payload).hexdigest(), len(payload)

    return _write_archive(
        meta.select(url_col, ts_col, title_col, links_col),
        out_dir,
        compress,
        ".warc.wat",
        _wat_record_bytes,
        cdx_dir=cdx_dir,
        cdx_fn=_digest,
        cdx_mime="application/json",
    )


def read_wat(spark: SparkSession, path: str) -> DataFrame:
    """WAT files → (url, warc_ts, title, links) rows; `metadata`
    records only, envelope fields read back from the JSON payload."""
    import json

    def parse_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, whens, titles, links = [], [], [], []
            for content in pdf["content"]:
                data = _decompress(bytes(content))
                for headers, payload in _iter_records(data):
                    if headers.get("warc-type") != "metadata":
                        continue
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
                    try:
                        env = json.loads(payload.decode("utf-8", "replace"))
                        hm = env["Envelope"]["Payload-Metadata"][
                            "HTTP-Response-Metadata"
                        ]["HTML-Metadata"]
                        titles.append(hm.get("Head", {}).get("Title", ""))
                        links.append([l["url"] for l in hm.get("Links", [])])
                    except (ValueError, KeyError, TypeError):
                        titles.append("")
                        links.append([])
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype="object"),
                    "warc_ts": pd.Series(whens, dtype="datetime64[ns, UTC]"),
                    "title": pd.Series(titles, dtype="object"),
                    "links": pd.Series(links, dtype="object"),
                }
            )

    files = spark.read.format("binaryFile").load(path)
    return files.select("content").mapInPandas(
        parse_files,
        schema="url string, warc_ts timestamp, title string, links array<string>",
    )
