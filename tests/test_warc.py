"""WARC source/sink: byte-reproducible archives, lossless round-trip,
and crawl-from-WARC equivalence with the parquet corpus path."""

from __future__ import annotations

import glob
import gzip
import os

import pytest
from pyspark.sql import functions as F

from gocrawl_spark import synth, warc


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return synth.corpus_from_documents(spark, sf_dir)


def test_roundtrip_lossless(spark, corpus, tmp_path):
    out = str(tmp_path / "arch")
    manifest = warc.write_warc(corpus.repartition(4), out)
    rows = manifest.collect()
    assert sum(r["n_records"] for r in rows) == corpus.count()
    assert all(r["path"].endswith(".warc.gz") for r in rows)

    back = warc.read_warc(spark, out)
    a = corpus.select("url", F.sha2("html", 256).alias("h"), "warc_ts")
    b = back.select("url", F.sha2("html", 256).alias("h"), "warc_ts", "status")
    assert b.filter("status != 200").count() == 0
    j = a.join(b, ["url", "h", "warc_ts"], "inner")
    assert j.count() == corpus.count()  # every row survives byte-identically


def test_plain_and_gzip_equivalent(spark, corpus, tmp_path):
    small = corpus.limit(20)
    gz_dir, plain_dir = str(tmp_path / "gz"), str(tmp_path / "plain")
    warc.write_warc(small.coalesce(1), gz_dir, compress=True)
    warc.write_warc(small.coalesce(1), plain_dir, compress=False)
    (gz_file,) = glob.glob(os.path.join(gz_dir, "*.warc.gz"))
    (plain_file,) = glob.glob(os.path.join(plain_dir, "*.warc"))
    with open(gz_file, "rb") as f:
        unzipped = gzip.decompress(f.read())
    with open(plain_file, "rb") as f:
        raw = f.read()
    assert unzipped == raw  # same bytes inside; mtime=0 pins the gz too
    a = sorted(map(tuple, warc.read_warc(spark, gz_dir).collect()))
    b = sorted(map(tuple, warc.read_warc(spark, plain_dir).collect()))
    assert a == b


def test_reader_skips_non_response_records(spark, tmp_path):
    # hand-built file: warcinfo record, then one response whose BODY
    # contains header-like bytes (Content-Length walking must not split)
    body = b"<html>fake\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n</html>"
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    )
    rec = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 9\r\n\r\nsoftware\n"
        b"\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x.example.com/a\r\n"
        b"WARC-Date: 2026-01-02T03:04:05Z\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n" + http + b"\r\n\r\n"
    )
    p = tmp_path / "mixed.warc"
    p.write_bytes(rec)
    got = warc.read_warc(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0]["url"] == "https://x.example.com/a"
    assert bytes(got[0]["html"]) == body
    assert str(got[0]["warc_ts"]).startswith("2026-01-02 03:04:05")


def test_streaming_warc_ingest_exactly_once(spark, corpus, tmp_path):
    """read_warc_stream: archives landing in two drops are ingested
    incrementally with exactly-once semantics across restarts (same
    checkpoint, file-level progress)."""
    land = str(tmp_path / "land")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(land)

    first = corpus.limit(60)
    warc.write_warc(first.coalesce(2), land)

    def drain():
        q = (
            warc.read_warc_stream(spark, land)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    n1 = spark.read.parquet(out).count()
    assert n1 == 60

    # drop 2 lands later under different names; restart drains ONLY it
    rest = corpus.subtract(first)
    warc.write_warc(rest.coalesce(2), str(tmp_path / "stage"))
    for f in glob.glob(str(tmp_path / "stage" / "*.warc.gz")):
        os.rename(f, os.path.join(land, "drop2-" + os.path.basename(f)))
    drain()
    got = spark.read.parquet(out)
    assert got.count() == corpus.count()
    assert got.select("url").distinct().count() == corpus.count()  # exactly-once


def test_crawl_from_warc_matches_parquet_corpus(spark, corpus, sf_dir, tmp_path):
    from gocrawl_spark.rounds import CrawlConfig, CrawlRun

    out = str(tmp_path / "arch2")
    warc.write_warc(corpus, out)
    wcorpus = warc.warc_corpus(spark, out)

    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    seeds = synth.seed_urls(n, k=6)
    cfg = CrawlConfig(max_depth=1, round_wall_s=10.0, max_rounds=3, use_bloom=False)
    r1 = CrawlRun(spark, corpus, seeds, str(tmp_path / "runA"), cfg)
    r1.run()
    r2 = CrawlRun(spark, wcorpus, seeds, str(tmp_path / "runB"), cfg)
    r2.run()
    a = sorted(
        map(tuple, r1.articles().select("id", F.sha2("body", 256)).collect())
    )
    b = sorted(
        map(tuple, r2.articles().select("id", F.sha2("body", 256)).collect())
    )
    assert a == b and len(a) > 0  # WARC corpus crawls byte-identically


def test_wet_roundtrip_and_cross_links(spark, corpus, tmp_path):
    """WET conversion records: lossless text round-trip, refers-to
    linkage to the response record id, gzip/plain byte equality."""
    docs = corpus.select(
        "url", "warc_ts",
        F.decode(F.col("html"), "utf-8").alias("text"),
    ).limit(200)
    out = str(tmp_path / "wet")
    manifest = warc.write_wet(docs.repartition(3), out)
    rows = manifest.collect()
    assert sum(r["n_records"] for r in rows) == docs.count()
    assert all(r["path"].endswith(".warc.wet.gz") for r in rows)

    back = warc.read_wet(spark, out)
    j = docs.join(back, ["url", "warc_ts", "text"], "inner")
    assert j.count() == docs.count()

    # record ids cross-link to the response records of the same URL
    raw = gzip.decompress(open(rows[0]["path"], "rb").read())
    assert b"WARC-Type: conversion" in raw
    assert b"WARC-Record-ID: <urn:sha256:wet:" in raw
    assert b"WARC-Refers-To: <urn:sha256:" in raw

    # plain vs gzip: identical decompressed bytes per partition
    out2 = str(tmp_path / "wet_plain")
    warc.write_wet(docs.repartition(3), out2, compress=False)
    for r in rows:
        plain = os.path.join(
            out2, os.path.basename(r["path"])[: -len(".gz")])
        assert gzip.decompress(open(r["path"], "rb").read()) == \
            open(plain, "rb").read()


def test_wet_reader_skips_response_records(spark, corpus, tmp_path):
    """A mixed archive (WARC responses + WET conversions in one dir)
    parses cleanly from both readers: each picks only its type."""
    docs = corpus.limit(50)
    out = str(tmp_path / "mixed")
    warc.write_warc(docs, out)
    warc.write_wet(
        docs.select("url", "warc_ts",
                    F.decode(F.col("html"), "utf-8").alias("text")),
        str(tmp_path / "mixed_wet"),
    )
    # point both readers at a dir union via glob-style load of each
    n = docs.count()
    assert warc.read_warc(spark, out).count() == n
    assert warc.read_wet(spark, str(tmp_path / "mixed_wet")).count() == n
    # WET reader over the RESPONSE archive yields nothing (type skip)
    assert warc.read_wet(spark, out).count() == 0
    assert warc.read_warc(spark, str(tmp_path / "mixed_wet")).count() == 0


def test_warc_and_wet_coexist_in_one_dir(spark, corpus, tmp_path):
    """A WARC+WET pair written into the SAME directory (the Common-Crawl
    layout the cross-linked record ids invite): a re-run of either
    writer sweeps only its own stale parts, never the companion's."""
    docs = corpus.limit(40)
    texts = docs.select(
        "url", "warc_ts", F.decode(F.col("html"), "utf-8").alias("text"))
    out = str(tmp_path / "pair")
    warc.write_warc(docs.repartition(2), out)
    warc.write_wet(texts.repartition(2), out)
    n = docs.count()
    assert warc.read_warc(spark, out).count() == n
    assert warc.read_wet(spark, out).count() == n

    # re-run the WARC writer with fewer partitions: its own stale part
    # disappears, the WET parts all survive
    wet_parts = sorted(glob.glob(os.path.join(out, "*.warc.wet.gz")))
    assert len(wet_parts) == 2
    warc.write_warc(docs.repartition(1), out)
    assert sorted(glob.glob(os.path.join(out, "*.warc.wet.gz"))) == wet_parts
    assert len(glob.glob(os.path.join(out, "*[0-9].warc.gz"))) == 1
    assert warc.read_warc(spark, out).count() == n
    assert warc.read_wet(spark, out).count() == n

    # and the WET writer's sweep leaves the WARC parts alone
    warc.write_wet(texts.repartition(1), out)
    assert len(glob.glob(os.path.join(out, "*.warc.wet.gz"))) == 1
    assert warc.read_warc(spark, out).count() == n
    assert warc.read_wet(spark, out).count() == n


def test_cdx_sidecar_random_access_gz(spark, corpus, tmp_path):
    """cdx_dir: per-record gzip members + physical offsets — a CDX hit
    is ONE ranged read; the archive still round-trips via the normal
    multi-member reader."""
    out, cdx_dir = str(tmp_path / "arch"), str(tmp_path / "cdx")
    warc.write_warc(corpus.repartition(3), out, cdx_dir=cdx_dir)
    idx = warc.read_cdx(spark, cdx_dir)
    assert idx.count() == corpus.count()
    # every record fetchable by (file, offset, rec_bytes) alone
    for r in idx.orderBy("surt").limit(5).collect():
        rec = warc.fetch_record(r["file"], r["offset"], r["rec_bytes"])
        assert rec.startswith(b"WARC/1.0\r\n")
        assert ("WARC-Target-URI: " + r["url"]).encode() in rec
    # digest = sha256 of the payload html; surt is the sort key
    one = idx.limit(1).collect()[0]
    row = corpus.filter(F.col("url") == one["url"]).collect()[0]
    import hashlib
    assert one["digest"] == hashlib.sha256(bytes(row["html"])).hexdigest()
    assert one["length"] == len(bytes(row["html"]))
    assert one["surt"].startswith("com,example,")
    # multi-member gzip reads transparently: full round-trip intact
    back = warc.read_warc(spark, out)
    assert back.count() == corpus.count()
    # sidecar composes with the cdx module's lookup
    from gocrawl_spark import cdx as cdxmod
    hit = cdxmod.cdx_lookup(idx, one["surt"]).collect()
    assert len(hit) == 1 and hit[0]["url"] == one["url"]


def test_cdx_sidecar_plain_offsets(spark, corpus, tmp_path):
    out, cdx_dir = str(tmp_path / "plain"), str(tmp_path / "pcdx")
    warc.write_warc(corpus.repartition(2), out, compress=False,
                    cdx_dir=cdx_dir)
    r = warc.read_cdx(spark, cdx_dir).orderBy("offset").limit(3).collect()
    assert r[0]["offset"] == 0
    for row in r:
        rec = warc.fetch_record(row["file"], row["offset"], row["rec_bytes"])
        assert rec.startswith(b"WARC/1.0\r\n") and rec.endswith(b"\r\n\r\n")


def test_cdx_sidecar_wet(spark, corpus, tmp_path):
    out, cdx_dir = str(tmp_path / "wet"), str(tmp_path / "wcdx")
    ex = corpus.select("url", "warc_ts", "text")
    warc.write_wet(ex, out, cdx_dir=cdx_dir)
    idx = warc.read_cdx(spark, cdx_dir)
    assert idx.count() == corpus.count()
    one = idx.limit(1).collect()[0]
    rec = warc.fetch_record(one["file"], one["offset"], one["rec_bytes"])
    assert b"WARC-Type: conversion" in rec


def test_crawl_archive_export(spark, corpus, tmp_path):
    """run.archive(): the crawl's fetched pages delivered as WARC+CDX;
    the archive re-reads to exactly the fetch-hit set and a CDX hit
    replays one record by ranged read."""
    from gocrawl_spark.rounds import CrawlConfig, CrawlRun

    n = corpus.count()
    cfg = CrawlConfig(max_depth=1, max_rounds=2, round_wall_s=10.0)
    run = CrawlRun(spark, corpus, synth.seed_urls(n, k=6),
                   str(tmp_path / "run"), cfg)
    run.run()
    out = str(tmp_path / "delivery")
    manifest = run.archive(out)
    fetched = run.extracted().select("url").distinct().count()
    assert sum(r["n_records"] for r in manifest.collect()) == fetched
    back = warc.read_warc(spark, out)
    assert back.select("url").distinct().count() == fetched
    idx = warc.read_cdx(spark, os.path.join(out, "cdx"))
    assert idx.count() == fetched
    one = idx.limit(1).collect()[0]
    rec = warc.fetch_record(one["file"], one["offset"], one["rec_bytes"])
    assert ("WARC-Target-URI: " + one["url"]).encode() in rec


def test_deduped_write_and_rehydrate(spark, corpus, tmp_path):
    # duplicate every payload under a second URL, one day later — the
    # second capture of each digest must become a revisit record
    base = corpus.limit(30).select("url", "warc_ts", "html")
    dup = base.select(
        F.concat(F.lit("https://mirror.example/"), F.col("url")).alias("url"),
        (F.col("warc_ts") + F.expr("INTERVAL 1 DAY")).alias("warc_ts"),
        "html",
    )
    caps = base.unionAll(dup)
    out = str(tmp_path / "dedup")
    manifest = warc.write_warc_deduped(caps.repartition(4), out)
    assert sum(r["n_records"] for r in manifest.collect()) == 60

    # the plain reader sees only the stored responses — one per digest
    stored = warc.read_warc(spark, out)
    assert stored.count() == 30
    assert stored.filter(F.col("url").startswith("https://mirror.")).count() == 0

    # the rehydrating reader reconstructs the FULL capture set
    back = warc.read_warc_deduped(spark, out)
    assert back.count() == 60
    assert back.filter("was_revisit").count() == 30
    assert back.filter("status != 200").count() == 0
    a = caps.select("url", F.sha2("html", 256).alias("h"))
    b = back.select("url", F.sha2("html", 256).alias("h"))
    assert a.join(b, ["url", "h"]).count() == 60

    # dedup actually saves bytes vs the plain archive
    plain = str(tmp_path / "plain")
    warc.write_warc(caps.repartition(4), plain)
    size = lambda d: sum(
        os.path.getsize(p) for p in glob.glob(os.path.join(d, "part-*"))
    )
    assert size(out) < size(plain)


def test_wat_roundtrip_and_envelope(spark, corpus, tmp_path):
    """WAT metadata records: title+links extraction, lossless JSON
    envelope round-trip, refers-to linkage, deterministic bytes."""
    docs = corpus.limit(120)
    meta = warc.wat_metadata(docs)
    out = str(tmp_path / "wat")
    manifest = warc.write_wat(meta.repartition(3), out)
    rows = manifest.collect()
    assert sum(r["n_records"] for r in rows) == docs.count()
    assert all(r["path"].endswith(".warc.wat.gz") for r in rows)

    back = warc.read_wat(spark, out)
    a = meta.select("url", "warc_ts", "title",
                    F.concat_ws("|", "links").alias("lk"))
    b = back.select("url", "warc_ts", "title",
                    F.concat_ws("|", "links").alias("lk"))
    assert a.join(b, ["url", "warc_ts", "title", "lk"]).count() == docs.count()
    # the extraction pass found real titles and links
    assert meta.filter(F.length("title") > 0).count() == docs.count()
    assert meta.filter(F.size("links") > 0).count() > 0

    raw = gzip.decompress(open(rows[0]["path"], "rb").read())
    assert b"WARC-Type: metadata" in raw
    assert b"WARC-Record-ID: <urn:sha256:wat:" in raw
    assert b"WARC-Refers-To: <urn:sha256:" in raw
    assert b'"HTML-Metadata"' in raw and b'"Links"' in raw

    # plain vs gzip byte equality (mtime=0 determinism contract)
    out2 = str(tmp_path / "wat_plain")
    warc.write_wat(meta.repartition(3), out2, compress=False)
    for r in rows:
        plain = os.path.join(out2, os.path.basename(r["path"])[: -len(".gz")])
        assert gzip.decompress(open(r["path"], "rb").read()) == \
            open(plain, "rb").read()


def test_warc_wat_wet_trio_one_dir(spark, corpus, tmp_path):
    """The full Common-Crawl trio in ONE directory: each writer sweeps
    only its own stale parts; each reader picks only its type."""
    docs = corpus.limit(30)
    out = str(tmp_path / "trio")
    warc.write_warc(docs.repartition(2), out)
    warc.write_wet(
        docs.select("url", "warc_ts",
                    F.decode(F.col("html"), "utf-8").alias("text")).repartition(2),
        out)
    warc.write_wat(warc.wat_metadata(docs).repartition(2), out)
    n = docs.count()
    assert warc.read_warc(spark, out).count() == n
    assert warc.read_wet(spark, out).count() == n
    assert warc.read_wat(spark, out).count() == n

    # re-run the WAT writer with fewer partitions: WARC and WET parts
    # untouched, stale WAT part swept
    warc_parts = sorted(glob.glob(os.path.join(out, "*[0-9].warc.gz")))
    wet_parts = sorted(glob.glob(os.path.join(out, "*.warc.wet.gz")))
    warc.write_wat(warc.wat_metadata(docs).repartition(1), out)
    assert sorted(glob.glob(os.path.join(out, "*[0-9].warc.gz"))) == warc_parts
    assert sorted(glob.glob(os.path.join(out, "*.warc.wet.gz"))) == wet_parts
    assert len(glob.glob(os.path.join(out, "*.warc.wat.gz"))) == 1
    assert warc.read_wat(spark, out).count() == n
    # WAT reader over response/conversion records yields nothing extra:
    # metadata type-skip keeps the trio separable in one dir
