"""CDX capture index + SURT keys (cdx.py, canonicalize.surt_key_expr).

The SURT cases pin the pywb/Heritrix canonicalization rules one by
one; the index tests pin the on-disk sorted layout and that a prefix
lookup reaches the parquet scan as a pushed filter (the range-pruning
contract that makes a domain lookup a slice, not a full scan).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from gocrawl_spark import cdx
from gocrawl_spark.canonicalize import surt_key_expr


def _surt(spark, url: str) -> str:
    return (
        spark.createDataFrame([(url,)], "url string")
        .select(surt_key_expr("url").alias("s"))
        .first()["s"]
    )


@pytest.mark.parametrize(
    "url,expected",
    [
        # host reversal + scheme drop
        ("https://example.com/", "com,example)/"),
        ("http://example.com/", "com,example)/"),
        # www label stripped (www, www2, …)
        ("https://www.example.com/a", "com,example)/a"),
        ("https://www2.example.com/a", "com,example)/a"),
        # case folding on host, path, query
        ("HTTPS://News.Example.COM/Arts/Item", "com,example,news)/arts/item"),
        # default ports dropped, explicit ports kept
        ("https://example.com:443/x", "com,example)/x"),
        ("http://example.com:80/x", "com,example)/x"),
        ("http://example.com:8080/x", "com,example:8080)/x"),
        # query canon: sorted, empties dropped, fragment dropped
        ("https://example.com/p?b=2&a=1", "com,example)/p?a=1&b=2"),
        ("https://example.com/p?b=2&&a=1#frag", "com,example)/p?a=1&b=2"),
        ("https://example.com/p?", "com,example)/p"),
        # empty path → "/"
        ("https://example.com", "com,example)/"),
        # userinfo stripped
        ("https://u:pw@example.com/x", "com,example)/x"),
    ],
)
def test_surt_cases(spark, url, expected):
    assert _surt(spark, url) == expected


def test_surt_non_http_passthrough(spark):
    assert _surt(spark, "FTP://Example.com/X") == "ftp://example.com/x"


def _captures(spark):
    rows = [
        ("https://www.example.com/a?x=1", 1000, "payload-a-v0"),
        ("https://example.com/a?x=1", 2000, "payload-a-v1"),
        ("https://example.com/b", 1500, "payload-b"),
        ("https://other.org/c", 1200, "payload-c"),
    ]
    return spark.createDataFrame(rows, "url string, ts_us long, text string")


def test_cdx_index_records(spark):
    idx = cdx.cdx_index(_captures(spark)).orderBy("surt", "ts_us").collect()
    assert [r["surt"] for r in idx] == [
        "com,example)/a?x=1",
        "com,example)/a?x=1",
        "com,example)/b",
        "org,other)/c",
    ]
    r = idx[0]
    assert r["mime"] == "text/html" and r["status"] == 200
    assert r["length"] == len("payload-a-v0")
    assert len(r["digest"]) == 64  # sha256 hex
    # the two captures of /a share a key but not a digest
    assert idx[0]["digest"] != idx[1]["digest"]


def test_cdx_lookup_latest_collapse(spark):
    idx = cdx.cdx_index(_captures(spark))
    hit = cdx.cdx_lookup(idx, "com,example)", latest_only=True).collect()
    by_key = {r["surt"]: r for r in hit}
    assert set(by_key) == {"com,example)/a?x=1", "com,example)/b"}
    a = by_key["com,example)/a?x=1"]
    assert a["n_captures"] == 2 and a["last_ts_us"] == 2000
    assert a["url"] == "https://example.com/a?x=1"  # the ts=2000 capture


def test_cdx_write_layout_and_pushdown(spark, tmp_path):
    """write_cdx persists sorted by (surt, ts_us); a prefix lookup on
    the stored index is pushed to the scan (StringStartsWith)."""
    out = str(tmp_path / "cdx")
    cdx.write_cdx(cdx.cdx_index(_captures(spark)), out, buckets=2)
    stored = spark.read.parquet(out)
    plan = (
        cdx.cdx_lookup(stored, "com,example)")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "StartsWith" in plan and "surt" in plan
    # in-file order: each parquet file is internally sorted
    import pyarrow.parquet as pq
    import os

    for name in os.listdir(out):
        if not name.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(out, name), columns=["surt", "ts_us"])
        keys = list(zip(t["surt"].to_pylist(), t["ts_us"].to_pylist()))
        assert keys == sorted(keys)


def test_revisit_records_election(spark):
    rows = [
        ("https://a.com/1", 1000, "same"),
        ("https://b.com/2", 2000, "same"),
        ("https://c.com/3", 1000, "same"),  # ts tie with a.com/1 → url breaks it
        ("https://d.com/4", 500, "uniq"),
    ]
    caps = spark.createDataFrame(rows, "url string, ts_us long, text string")
    got = {r["url"]: r for r in cdx.revisit_records(caps).collect()}
    assert got["https://a.com/1"]["record_type"] == "response"
    assert got["https://d.com/4"]["record_type"] == "response"
    for u in ("https://a.com/1", "https://d.com/4"):
        assert got[u]["refers_to_url"] is None
        assert got[u]["refers_to_ts_us"] is None
        assert got[u]["saved_bytes"] == 0
    for u in ("https://b.com/2", "https://c.com/3"):
        assert got[u]["record_type"] == "revisit"
        assert got[u]["refers_to_url"] == "https://a.com/1"
        assert got[u]["refers_to_ts_us"] == 1000
        assert got[u]["saved_bytes"] == len("same")
    # digest column is the sha256 payload identity
    assert got["https://b.com/2"]["digest"] == got["https://a.com/1"]["digest"]
    assert got["https://d.com/4"]["digest"] != got["https://a.com/1"]["digest"]


def test_host_dup_rate_rollup(spark):
    rows = [
        ("https://a.com/1", 1000, "same"),   # response (earliest of digest)
        ("https://a.com/2", 2000, "same"),   # revisit on a.com
        ("https://b.com/3", 3000, "same"),   # revisit on b.com
        ("https://b.com/4", 500, "uniq"),    # response
    ]
    caps = spark.createDataFrame(rows, "url string, ts_us long, text string")
    got = {r["host"]: r for r in cdx.host_dup_rate(caps).collect()}
    a, b = got["a.com"], got["b.com"]
    assert (a["n_captures"], a["n_responses"], a["n_revisits"]) == (2, 1, 1)
    assert a["dup_bp"] == 5000 and a["bytes_saved"] == len("same")
    assert (b["n_captures"], b["n_responses"], b["n_revisits"]) == (2, 1, 1)
    assert b["dup_bp"] == 5000 and b["bytes_saved"] == len("same")
