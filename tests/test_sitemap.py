"""Sitemap ingestion: robots Sitemap: directive, XML parsing (urlset +
sitemapindex, lastmod binding), distributed discovery, live fetch."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from gocrawl_spark import sitemap as sm

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://site00.example.com/article/4</loc>
       <lastmod>2026-01-15</lastmod><priority>0.9</priority></url>
  <url><loc>https://site00.example.com/page/8</loc>
       <lastmod>2026-02-01T10:20:30Z</lastmod><priority>0.3</priority></url>
  <url><loc>https://site00.example.com/article/12</loc></url>
</urlset>
"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://site00.example.com/sitemap-a.xml</loc></sitemap>
  <sitemap><loc>https://site00.example.com/sitemap-b.xml</loc>
           <lastmod>2026-03-01</lastmod></sitemap>
</sitemapindex>
"""

CHILD_B = """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc>https://site00.example.com/page/16</loc></url></urlset>
"""


def test_parse_urlset_binds_lastmod_per_loc():
    got = sm.parse_sitemap(URLSET)
    assert [u for u, *_ in got] == [
        "https://site00.example.com/article/4",
        "https://site00.example.com/page/8",
        "https://site00.example.com/article/12",
    ]
    assert str(got[0][1]).startswith("2026-01-15 00:00")
    assert str(got[1][1]).startswith("2026-02-01 10:20:30")
    assert got[2][1] is None
    assert all(not is_idx for _, _, is_idx, _ in got)
    # priority binds per-loc too; absent → None, out-of-range clamps
    assert [p for *_, p in got] == [0.9, 0.3, None]
    clamped = sm.parse_sitemap("<urlset><url><loc>u</loc><priority>7</priority></url></urlset>")
    assert clamped[0][3] == 1.0


def test_parse_sitemapindex():
    got = sm.parse_sitemap(INDEX)
    assert [u for u, *_ in got] == [
        "https://site00.example.com/sitemap-a.xml",
        "https://site00.example.com/sitemap-b.xml",
    ]
    assert all(is_idx for _, _, is_idx, _ in got)
    assert sm.parse_sitemap("") == [] and sm.parse_sitemap(None) == []


def test_seed_priorities_bucketing(spark):
    rows = [
        ("https://h/a", 0.95), ("https://h/b", 0.7), ("https://h/c", 0.6),
        ("https://h/d", 0.5), ("https://h/e", None),
    ]
    df = spark.createDataFrame(rows, "url string, priority double")
    got = {r["url_hash"]: r["priority"] for r in sm.seed_priorities(df).collect()}
    import hashlib

    sha = lambda u: hashlib.sha256(u.encode()).hexdigest()
    assert got == {sha("https://h/a"): 8, sha("https://h/b"): 7, sha("https://h/c"): 6}


def test_sitemaps_from_robots(spark):
    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /x\nSitemap: https://a.com/s.xml\n"),
            ("b.com", "SITEMAP: https://b.com/m.xml  # comment\nUser-agent: *\n"),
            ("c.com", "User-agent: *\nDisallow: /\n"),
        ],
        "host string, rules string",
    )
    got = sorted(map(tuple, sm.sitemaps_from_robots(robots).collect()))
    assert got == [
        ("a.com", "https://a.com/s.xml"),
        ("b.com", "https://b.com/m.xml"),
    ]


def test_discover_seeds_expands_index(spark):
    """Static-resolution discovery: index hop → child sitemaps → seeds,
    deduped; the injectable fetch keeps the network out."""
    robots = spark.createDataFrame(
        [("site00.example.com",
          "User-agent: *\nSitemap: https://site00.example.com/sitemap.xml\n")],
        "host string, rules string",
    )
    table = {
        "https://site00.example.com/sitemap.xml": INDEX,
        "https://site00.example.com/sitemap-a.xml": URLSET,
        "https://site00.example.com/sitemap-b.xml": CHILD_B,
    }

    def static_fetch(pending, **kw):
        rows = [(r["sitemap_url"], table.get(r["sitemap_url"], "")) for r in pending.collect()]
        return spark.createDataFrame(rows, "sitemap_url string, xml string")

    seeds = sm.discover_seeds(spark, robots, fetch=static_fetch)
    urls = sorted(r["url"] for r in seeds.collect())
    assert urls == [
        "https://site00.example.com/article/12",
        "https://site00.example.com/article/4",
        "https://site00.example.com/page/16",
        "https://site00.example.com/page/8",
    ]
    lm = {r["url"]: r["lastmod"] for r in seeds.collect()}
    assert lm["https://site00.example.com/article/4"] is not None

    # incremental cut: since keeps fresh + lastmod-less entries only
    from datetime import datetime, timezone

    fresh = sm.discover_seeds(
        spark, robots, fetch=static_fetch,
        since=datetime(2026, 1, 20, tzinfo=timezone.utc),
    )
    got = sorted(r["url"] for r in fresh.collect())
    # article/4 (2026-01-15) is stale; page/8 (2026-02-01) is fresh;
    # article/12 and page/16 carry no lastmod and always pass
    assert got == [
        "https://site00.example.com/article/12",
        "https://site00.example.com/page/16",
        "https://site00.example.com/page/8",
    ]


@pytest.fixture()
def xml_server():
    docs = {
        "/site00.example.com/sitemap.xml": URLSET.encode(),
    }

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def do_GET(self):
            body = docs.get(self.path)
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_sitemaps_live(spark, xml_server):
    urls = spark.createDataFrame(
        [("https://site00.example.com/sitemap.xml",),
         ("https://site00.example.com/missing.xml",)],
        "sitemap_url string",
    )
    got = {
        r["sitemap_url"]: r["xml"]
        for r in sm.fetch_sitemaps(urls, proxy_base=xml_server).collect()
    }
    assert got["https://site00.example.com/sitemap.xml"] == URLSET
    assert got["https://site00.example.com/missing.xml"] == ""
    entries = sm.sitemap_entries(
        sm.fetch_sitemaps(urls, proxy_base=xml_server)
    ).filter(~F.col("is_index"))
    assert entries.count() == 3


def test_seeds_drive_a_crawl(spark, sf_dir, tmp_path):
    """Sitemap seeds plug into the distributed frontier path
    (init_frontier_df) and the crawl runs from them."""
    from gocrawl_spark import synth
    from gocrawl_spark.rounds import CrawlConfig, CrawlRun

    corpus = synth.corpus_from_documents(spark, sf_dir)
    want = sorted(synth.url_of(i) for i in (4, 8, 12))
    xml = "<urlset>" + "".join(f"<url><loc>{u}</loc></url>" for u in want) + "</urlset>"
    xml_df = spark.createDataFrame([("s", xml)], "sitemap_url string, xml string")
    seeds = sm.sitemap_entries(xml_df).select(F.col("loc").alias("url"))
    cfg = CrawlConfig(max_depth=0, max_rounds=1, use_bloom=False)
    run = CrawlRun(spark, corpus, seeds, str(tmp_path / "run"), cfg)
    run.run()
    got = sorted(r["url"] for r in run.extracted().select("url").collect())
    assert got == want


def test_coverage_audit(spark):
    from gocrawl_spark import sitemap

    declared = spark.createDataFrame(
        [("https://a.com/1",), ("https://a.com/2",), ("https://a.com/2",),
         ("https://b.com/x",)],
        "url string",
    )
    crawled = spark.createDataFrame(
        [("https://a.com/1",), ("https://a.com/3",), ("https://c.com/z",)],
        "url string",
    )
    got = {r["host"]: r for r in
           sitemap.coverage_audit(declared, crawled).collect()}
    a = got["a.com"]
    # declared {1,2} (dup collapses), crawled {1,3} → both=1
    assert (a["n_declared"], a["n_crawled"], a["n_both"]) == (2, 2, 1)
    assert (a["n_declared_only"], a["n_crawled_only"]) == (1, 1)
    assert a["coverage_bp"] == 5000
    b = got["b.com"]
    assert (b["n_declared"], b["n_crawled"], b["coverage_bp"]) == (1, 0, 0)
    c = got["c.com"]
    # nothing declared → coverage_bp pinned to 0, not a division error
    assert (c["n_declared"], c["n_crawled_only"], c["coverage_bp"]) == (0, 1, 0)


def test_stale_candidates(spark):
    """Only URLs with a declared lastmod strictly newer than the
    capture surface; the newest declaration wins; priority escalates
    one level per stale day, clamped at max."""
    from gocrawl_spark.sitemap import US_PER_DAY, stale_candidates

    crawled = spark.createDataFrame(
        [("u1", 1000), ("u2", 1000), ("u3", 1000)],
        "url string, fetch_ts_us long",
    )
    declared = spark.createDataFrame(
        [
            ("u1", 500),                      # older -> fresh
            ("u1", 1000 + 2 * US_PER_DAY),    # newest wins: 2 days stale
            ("u2", 1000 + 30 * US_PER_DAY),   # clamped at max_priority
            ("u4", 99999),                    # never crawled -> ignored
        ],
        "url string, lastmod_us long",
    )
    got = {
        r["url"]: (r["staleness_us"], r["refresh_priority"])
        for r in stale_candidates(crawled, declared).collect()
    }
    assert set(got) == {"u1", "u2"}
    assert got["u1"] == (2 * US_PER_DAY, 7)
    assert got["u2"] == (30 * US_PER_DAY, 10)
