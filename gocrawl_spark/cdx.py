"""CDX capture index over a crawl corpus (web-archive lookup surface).

The Common-Crawl / pywb ecosystem exposes crawled captures through a
CDX(J) index: one record per (SURT key, timestamp) carrying the
original URL, content digest, MIME, HTTP status, and payload length,
sorted by key so a host or domain is one contiguous range scan. The
reference stores documents keyed by sha256(url) in Elasticsearch
(/root/reference/internal/storage/storage.go:102-108,
articles/extractor.go:172-178) with no temporal or range dimension;
this module adds the archive-native index a Common-Crawl-style corpus
(BASELINE.json input_hint: url, warc_ts, html, text, lang) expects.

Scale shape: building the index is a pure scan projection (the SURT
key is a codegen'd expression, canonicalize.surt_key_expr — no UDF,
no shuffle); writing it sorted-by-(surt, ts) is one range-partitioned
sort, the same layout a 100 TB cluster would bucket by surt prefix.
Lookups are a prefix filter (pushed to the parquet scan when the
index is stored sorted/z-ordered on `surt`) plus an optional
latest-capture collapse — one groupBy on the matched slice only,
never a global shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .canonicalize import surt_key_expr

CDX_COLUMNS = ("surt", "ts_us", "url", "mime", "status", "digest", "length")


def cdx_index(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts_us",
    payload_col: str = "text",
    mime_col: str | None = None,
    status_col: str | None = None,
) -> DataFrame:
    """One CDX record per capture row: (surt, ts_us, url, mime,
    status, digest, length). `ts_col` is epoch-µs (long) — the
    engine-stable timestamp convention; `digest` is sha256 of the
    payload column, matching the reference's content identity
    (extractor.go:172-178 uses sha256 for ids)."""
    mime = F.col(mime_col) if mime_col else F.lit("text/html")
    status = (
        F.col(status_col).cast("int") if status_col else F.lit(200)
    )
    return captures.select(
        surt_key_expr(url_col).alias("surt"),
        F.col(ts_col).cast("long").alias("ts_us"),
        F.col(url_col).alias("url"),
        mime.alias("mime"),
        status.alias("status"),
        F.sha2(F.col(payload_col), 256).alias("digest"),
        F.length(payload_col).cast("long").alias("length"),
    )


def write_cdx(index: DataFrame, path: str, buckets: int = 32) -> None:
    """Persist the index sorted by (surt, ts_us) — repartitionByRange
    on surt keeps each host/domain in few files (range pruning ≈ the
    flat-file CDX binary search), sortWithinPartitions gives the
    in-file order pywb expects."""
    (
        index.repartitionByRange(buckets, "surt")
        .sortWithinPartitions("surt", "ts_us")
        .write.mode("overwrite")
        .parquet(path)
    )


def revisit_records(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts_us",
    payload_col: str = "text",
    digest_col: str | None = None,
) -> DataFrame:
    """WARC revisit-record election (digest-based capture dedup).

    Web archives store a payload once: the earliest capture of each
    content digest is a full ``response`` record; every later capture
    of the same digest becomes a ``revisit`` record that carries only
    a pointer at the original (WARC/1.1 §6.7.2 `revisit` with
    WARC-Refers-To-Target-URI / WARC-Refers-To-Date — the mechanism
    Common Crawl and Heritrix use for URL-agnostic history dedup).
    The digest is sha256 of the payload, the reference's content
    identity (/root/reference/internal/articles/extractor.go:172-178).

    Output, one row per capture: (url, ts_us, digest, record_type,
    refers_to_url, refers_to_ts_us, saved_bytes) where the refers_to
    columns are NULL on ``response`` rows and ``saved_bytes`` is the
    payload length a revisit avoids re-storing (0 for responses).

    Scale shape: the original capture per digest is elected with ONE
    partially-aggregated groupBy — min(struct(ts, url)) combines
    map-side, so a pathological digest (the empty page, a boilerplate
    404 captured billions of times) reduces to one row per map task
    before the shuffle — then joined back on digest (equi-join, AQE
    skew-split applies). No window sort over the digest partition:
    a per-digest window would serialize the hot digest onto one task.
    """
    d = F.sha2(F.col(payload_col), 256) if digest_col is None else F.col(digest_col)
    rec = captures.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("long").alias("ts_us"),
        d.alias("digest"),
        F.length(payload_col).cast("long").alias("length"),
    )
    firsts = rec.groupBy("digest").agg(
        F.min(F.struct("ts_us", "url")).alias("_first")
    )
    joined = rec.join(firsts, "digest")
    is_orig = (F.col("ts_us") == F.col("_first.ts_us")) & (
        F.col("url") == F.col("_first.url")
    )
    return joined.select(
        "url",
        "ts_us",
        "digest",
        F.when(is_orig, F.lit("response")).otherwise(F.lit("revisit")).alias(
            "record_type"
        ),
        F.when(~is_orig, F.col("_first.url")).alias("refers_to_url"),
        F.when(~is_orig, F.col("_first.ts_us")).alias("refers_to_ts_us"),
        F.when(~is_orig, F.col("length")).otherwise(F.lit(0)).cast("long").alias(
            "saved_bytes"
        ),
    )


def cdx_lookup(
    index: DataFrame, surt_prefix: str, latest_only: bool = False
) -> DataFrame:
    """Range lookup: all captures whose SURT starts with
    `surt_prefix` (a domain is `com,example,` — note the trailing
    comma; an exact page is its full key). `latest_only` collapses to
    the most recent capture per key (pywb's default replay pick):
    max_by over ts_us, one partial-aggregated groupBy on the matched
    slice."""
    hit = index.filter(F.col("surt").startswith(surt_prefix))
    if not latest_only:
        return hit
    return hit.groupBy("surt").agg(
        F.count("*").alias("n_captures"),
        F.max("ts_us").alias("last_ts_us"),
        F.max_by("url", "ts_us").alias("url"),
        F.max_by("digest", "ts_us").alias("digest"),
        F.max_by("length", "ts_us").alias("length"),
    )


def host_dup_rate(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts_us",
    payload_col: str = "text",
) -> DataFrame:
    """Per-host duplication audit over the revisit election — the
    archive-side dashboard number crawl operators watch (what fraction
    of a host's captures are byte-duplicates, and how many bytes the
    revisit mechanism saves). Common Crawl publishes exactly this
    rollup per crawl in its dedup statistics.

    Output, one row per host: (host, n_captures, n_responses,
    n_revisits, dup_bp, bytes_total, bytes_saved) where ``dup_bp`` is
    the duplicate share in basis points (n_revisits * 10000 DIV
    n_captures — integer arithmetic, no float) and ``bytes_saved`` is
    the payload bytes revisit pointers avoided re-storing.

    Scale shape: revisit_records' digest election (map-side-combined
    min(struct) groupBy + digest equi-join) followed by ONE host-keyed
    groupBy with partial aggregation — conditional counts fold
    map-side, so a 10^10-capture crawl reduces to #hosts rows. Host is
    the authority component of the URL (``split(url,'/')[2]``), a
    codegen'd expression, no UDF.
    """
    rec = revisit_records(
        captures, url_col=url_col, ts_col=ts_col, payload_col=payload_col
    )
    host = F.split(F.col("url"), "/").getItem(2)
    is_rev = F.col("record_type") == "revisit"
    return (
        rec.withColumn("host", host)
        .groupBy("host")
        .agg(
            F.count("*").alias("n_captures"),
            F.sum(F.when(~is_rev, 1).otherwise(0)).cast("long").alias("n_responses"),
            F.sum(F.when(is_rev, 1).otherwise(0)).cast("long").alias("n_revisits"),
            F.sum("saved_bytes").cast("long").alias("bytes_saved"),
        )
        .withColumn(
            "dup_bp",
            F.expr("n_revisits * 10000 DIV n_captures").cast("long"),
        )
        .select(
            "host", "n_captures", "n_responses", "n_revisits",
            "dup_bp", "bytes_saved",
        )
    )
