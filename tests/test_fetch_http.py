"""S2 real-fetch mode: the engine crawls a LIVE HTTP endpoint (an
in-process loopback server standing in for the synthetic web, like the
reference's tests/helpers/server.go) and must produce byte-identical
output to the corpus-join mode on the same graph."""

from __future__ import annotations

import threading
from collections import defaultdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlsplit

import pytest

from gocrawl_spark import synth
from gocrawl_spark.rounds import CrawlConfig, CrawlRun


@pytest.fixture(scope="module")
def web(spark, sf_dir):
    """Loopback server serving the synthetic corpus at /<host>/<path>
    plus per-host /robots.txt; unknown paths 404. /flaky/... 503s on
    the first two hits (F9)."""
    from gocrawl_spark import robots as rb

    corpus = synth.corpus_from_documents(spark, sf_dir)
    pages = {}
    for r in corpus.collect():
        p = urlsplit(r["url"])
        pages[f"/{p.hostname}{p.path}"] = bytes(r["html"])
    for r in rb.synth_robots(spark).collect():
        pages[f"/{r['host']}/robots.txt"] = r["rules"].encode()
    hits = defaultdict(int)
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def do_GET(self):
            with lock:
                hits[self.path] += 1
                n = hits[self.path]
            if self.path.startswith("/flaky/") and n <= 2:
                self.send_response(503)
                self.end_headers()
                return
            if self.path.startswith("/throttle/") and n <= 2:
                # rate-limited host: 429 until the third visit
                self.send_response(429)
                self.end_headers()
                return
            if self.path.startswith("/hop/"):
                # F10: permanent redirect to the canonical location
                self.send_response(301)
                self.send_header("Location", self.path.removeprefix("/hop"))
                self.end_headers()
                return
            if "/moved/" in self.path:
                # crawl-space-visible redirect: moved path → article path
                self.send_response(301)
                self.send_header("Location", self.path.replace("/moved/", "/article/"))
                self.end_headers()
                return
            key = self.path.removeprefix("/flaky").removeprefix("/throttle")
            body = pages.get(key)
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            # strong validator (RFC 9110): content-addressed ETag,
            # honored for If-None-Match conditional GETs
            import hashlib as _hl

            etag = '"' + _hl.sha256(body).hexdigest()[:16] + '"'
            if self.headers.get("If-None-Match") == etag:
                self.send_response(304)
                self.send_header("ETag", etag)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("ETag", etag)
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", corpus, hits
    srv.shutdown()


def _crawl(spark, corpus, base, tmp, mode, proxy=None):
    cfg = CrawlConfig(
        max_depth=2, round_wall_s=10.0, max_rounds=4, use_bloom=False,
        fetch_mode=mode, http_proxy_base=proxy, delay_ms=0,
    )
    n = 500
    run = CrawlRun(
        spark, corpus if mode == "corpus" else None,
        synth.seed_urls(n, k=8), tmp, cfg,
    )
    run.run(resume=False)
    return run


def test_http_mode_equals_corpus_mode(spark, web, tmp_path):
    base, corpus, _ = web
    via_http = _crawl(spark, corpus, base, str(tmp_path / "http"), "http", proxy=base)
    via_join = _crawl(spark, corpus, base, str(tmp_path / "join"), "corpus")
    seen_h = sorted((r["url"], r["fetched_round"]) for r in via_http.seen_final().collect())
    seen_j = sorted((r["url"], r["fetched_round"]) for r in via_join.seen_final().collect())
    assert seen_h == seen_j and len(seen_h) > 20
    # extracted articles byte-identical across fetch modes
    art_h = {r["id"]: (r["title"], r["body"]) for r in via_http.articles().collect()}
    art_j = {r["id"]: (r["title"], r["body"]) for r in via_join.articles().collect()}
    assert art_h == art_j and len(art_h) > 0


def test_redirects_followed_and_recorded(spark, web):
    """F10: redirects are followed (colly/net/http default) and the
    landing URL is recorded in final_url, mapped back to crawl space."""
    from gocrawl_spark import fetch, udfs

    base, corpus, _ = web
    u = synth.url_of(4)
    batch = udfs.with_url_identity(
        corpus.sparkSession.createDataFrame([(u,)], "url string")
    )
    out = fetch.fetch_http(batch, proxy_base=base + "/hop").collect()
    assert len(out) == 1
    r = out[0]
    assert r["status"] == 200
    assert r["final_url"] == u  # /hop/<host><path> 301s to /<host><path>
    assert bytes(r["html"]).startswith(b"<!DOCTYPE html>")
    # no-redirect fetch keeps final_url == url
    out2 = fetch.fetch_http(batch, proxy_base=base).collect()
    assert out2[0]["final_url"] == u and out2[0]["status"] == 200


def test_fetch_robots_live(spark, web, tmp_path):
    """S3 live mode: robots.txt fetched per distinct host over HTTP;
    missing robots (404) → unrestricted (RFC 9309 §2.3.1.2); a crawl
    gated by the live-fetched table must equal one gated by the static
    synth table."""
    from gocrawl_spark import fetch
    from gocrawl_spark import robots as rb

    base, corpus, _ = web
    hosts = spark.createDataFrame(
        [("site00.example.com",), ("site02.example.com",), ("nowhere.example.com",)],
        "host string",
    )
    got = {r["host"]: r["rules"] for r in
           fetch.fetch_robots(hosts, proxy_base=base).collect()}
    assert "Disallow: /page/" in got["site00.example.com"]  # host 0: i%3==0 rules
    assert "Disallow: /" in got["site02.example.com"]  # host 2: i%5==2
    assert got["nowhere.example.com"] == ""  # 404 → unrestricted

    all_hosts = spark.createDataFrame(
        [(f"site{i:02d}.example.com",) for i in range(16)], "host string"
    )
    live = fetch.fetch_robots(all_hosts, proxy_base=base)
    n = 500
    seeds = synth.seed_urls(n, k=8)
    cfg = CrawlConfig(max_depth=1, round_wall_s=10.0, max_rounds=3,
                      use_bloom=False, respect_robots=True)
    run_live = CrawlRun(spark, corpus, seeds, str(tmp_path / "live"), cfg, robots=live)
    run_live.run(resume=False)
    run_static = CrawlRun(
        spark, corpus, seeds, str(tmp_path / "static"), cfg, robots=rb.synth_robots(spark)
    )
    run_static.run(resume=False)
    sl = sorted(r["url"] for r in run_live.seen_final().collect())
    ss = sorted(r["url"] for r in run_static.seen_final().collect())
    assert sl == ss and len(sl) > 0


def test_live_robots_autodiscovery_in_crawl(spark, web, tmp_path):
    """An http-mode crawl with respect_robots and NO static table must
    discover per-host robots.txt live and match the corpus-join crawl
    gated by the equivalent static table."""
    from gocrawl_spark import robots as rb

    base, corpus, _ = web
    n = 500
    seeds = synth.seed_urls(n, k=8)
    live_cfg = CrawlConfig(
        max_depth=1, round_wall_s=10.0, max_rounds=3, use_bloom=False,
        respect_robots=True, fetch_mode="http", http_proxy_base=base, delay_ms=0,
    )
    run_live = CrawlRun(spark, None, seeds, str(tmp_path / "live"), live_cfg)
    run_live.run(resume=False)
    static_cfg = CrawlConfig(
        max_depth=1, round_wall_s=10.0, max_rounds=3, use_bloom=False,
        respect_robots=True,
    )
    run_static = CrawlRun(
        spark, corpus, seeds, str(tmp_path / "static"), static_cfg,
        robots=rb.synth_robots(spark),
    )
    run_static.run(resume=False)
    sl = sorted(r["url"] for r in run_live.seen_final().collect())
    ss = sorted(r["url"] for r in run_static.seen_final().collect())
    assert sl == ss and len(sl) > 0
    # the disallowed /category/ URLs never got fetched
    assert not any("/category/" in u for u in sl)


def test_redirect_table_in_snapshot(spark, web, tmp_path):
    """A crawl in http mode records crawl-space-visible redirects in
    the round snapshot's `redirects` table (F10)."""
    base, corpus, _ = web
    canonical = synth.url_of(7)  # .../article/7
    moved = canonical.replace("/article/", "/moved/")
    cfg = CrawlConfig(
        max_depth=0, round_wall_s=10.0, max_rounds=1, use_bloom=False,
        fetch_mode="http", http_proxy_base=base,
    )
    run = CrawlRun(spark, None, [moved], str(tmp_path / "rdir"), cfg)
    history = run.run(resume=False)
    assert history[0]["fetched"] == 1
    rows = run.redirects().collect()
    assert [(r["url"], r["final_url"], r["status"]) for r in rows] == [
        (moved, canonical, 200)
    ]


def test_http_transient_503_retries(spark, web, tmp_path):
    """A URL that 503s twice then succeeds must be re-enqueued with
    attempt+1 and land in seen once fetched (F9 over live HTTP)."""
    base, corpus, hits = web
    flaky_url = synth.url_of(1)
    cfg = CrawlConfig(
        max_depth=0, round_wall_s=10.0, max_rounds=4, use_bloom=False,
        fetch_mode="http", http_proxy_base=base + "/flaky", max_retries=3,
    )
    run = CrawlRun(spark, None, [flaky_url], str(tmp_path / "flaky"), cfg)
    history = run.run(resume=False)
    seen = run.seen_final().collect()
    assert [r["url"] for r in seen] == [flaky_url]
    assert seen[0]["fetched_round"] == 2  # rounds 0,1 were 503s
    assert sum(h["retried"] for h in history) == 2
    p = urlsplit(flaky_url)
    assert hits[f"/flaky/{p.hostname}{p.path}"] == 3


def test_http_429_is_transient(spark, web, tmp_path):
    """429 Too Many Requests is the one 4xx a polite crawler retries
    (RFC 6585): twice-throttled URL re-enqueues and lands on round 2."""
    base, corpus, hits = web
    url = synth.url_of(2)
    cfg = CrawlConfig(
        max_depth=0, round_wall_s=10.0, max_rounds=4, use_bloom=False,
        fetch_mode="http", http_proxy_base=base + "/throttle", max_retries=3,
    )
    run = CrawlRun(spark, None, [url], str(tmp_path / "throttle"), cfg)
    history = run.run(resume=False)
    seen = run.seen_final().collect()
    assert [r["url"] for r in seen] == [url]
    assert seen[0]["fetched_round"] == 2  # rounds 0,1 were 429s
    assert sum(h["retried"] for h in history) == 2
    p = urlsplit(url)
    assert hits[f"/throttle/{p.hostname}{p.path}"] == 3


def test_adaptive_backoff_halves_budget_after_429(spark, sf_dir, tmp_path):
    """adaptive_backoff: a domain that 429'd in round r runs at double
    delay (half the pop budget) in round r+1; without the flag the
    budget is unchanged."""
    corpus = synth.corpus_from_documents(spark, sf_dir)
    pages = {}
    for r in corpus.collect():
        p = urlsplit(r["url"])
        pages[f"/{p.hostname}{p.path}"] = bytes(r["html"])
    hits = defaultdict(int)
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def do_GET(self):
            with lock:
                hits[self.path] += 1
                n = hits[self.path]
            if n == 1:  # host throttles the first visit of every page
                self.send_response(429)
                self.end_headers()
                return
            body = pages.get(self.path, b"")
            self.send_response(200 if body else 404)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # six same-host seeds (ids % 4 == 0 → site00); budget 4/round
        seeds = [synth.url_of(i) for i in (0, 4, 8, 12, 16, 20)]

        def run(flag, name):
            cfg = CrawlConfig(
                max_depth=0, max_rounds=4, use_bloom=False,
                fetch_mode="http", http_proxy_base=base, max_retries=4,
                delay_ms=1000, round_wall_s=4.0, parallelism=1,
                adaptive_backoff=flag,
            )
            r = CrawlRun(spark, None, seeds, str(tmp_path / name), cfg)
            return r.run(resume=False)

        hist = run(True, "on")
        assert hist[0]["popped"] == 4 and hist[0]["fetched"] == 0  # all 429
        assert hist[1]["popped"] == 2  # halved budget after throttling
        assert sum(h["fetched"] for h in hist) > 0

        hits.clear()
        hist2 = run(False, "off")
        assert hist2[0]["popped"] == 4 and hist2[1]["popped"] == 4  # no backoff
    finally:
        srv.shutdown()


def test_host_policy_delay_paces_live_fetch(spark, tmp_path):
    """ADVICE: per-source LimitRule delay overrides (host_policy) must
    be enforced BETWEEN live requests, not only in the pop budget — a
    host with a stricter configured delay may not be fetched faster
    than its policy allows."""
    import time

    times = defaultdict(list)
    lock = threading.Lock()
    body = b"<html><head><title>t</title></head><body><p>x</p></body></html>"

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def do_GET(self):
            host = self.path.split("/")[1]
            with lock:
                times[host].append(time.monotonic())
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        urls = [f"https://slow.example.com/p/{i}" for i in range(3)] + [
            f"https://fast.example.com/p/{i}" for i in range(3)
        ]
        cfg = CrawlConfig(
            max_depth=0, round_wall_s=10.0, max_rounds=1, use_bloom=False,
            fetch_mode="http", http_proxy_base=base, delay_ms=0,
        )
        policy = spark.createDataFrame(
            [("slow.example.com", 300, 1)],
            "domain string, delay_ms long, parallelism int",
        )
        run = CrawlRun(
            spark, None, urls, str(tmp_path / "paced"), cfg, host_policy=policy
        )
        run.run(resume=False)
        slow, fast = times["slow.example.com"], times["fast.example.com"]
        assert len(slow) == 3 and len(fast) == 3
        gaps = [b - a for a, b in zip(slow, slow[1:])]
        assert min(gaps) >= 0.25, f"policy delay not enforced: gaps={gaps}"
    finally:
        srv.shutdown()


def test_robots_discovery_is_distributed(spark, web, tmp_path, monkeypatch):
    """Live robots state must not accumulate on the driver: new hosts
    resolve via a left_anti join (no collect() anywhere in the
    discovery path) and rules land as parquet deltas that survive a
    restart."""
    from pyspark.sql import DataFrame as _DF

    from gocrawl_spark import synth as sy
    from gocrawl_spark import udfs

    base, corpus, _ = web
    cfg = CrawlConfig(
        respect_robots=True, fetch_mode="http", http_proxy_base=base, delay_ms=0
    )
    run = CrawlRun(spark, None, [sy.url_of(0)], str(tmp_path / "rb"), cfg)
    cand = udfs.with_url_identity(
        spark.createDataFrame([(sy.url_of(i),) for i in range(40)], "url string")
    )

    def no_collect(self):
        raise AssertionError("collect() in the robots discovery path")

    monkeypatch.setattr(_DF, "collect", no_collect)
    run._discover_robots(cand)
    run._discover_robots(cand)  # second pass: all hosts known, no-op
    monkeypatch.undo()

    tbl = run._robots_table()
    rows = {r["host"]: r["rules"] for r in tbl.collect()}
    assert len(rows) == 16 and "Disallow: /page/" in rows["site00.example.com"]
    # exactly one delta written (pass 2 discovered nothing new)
    import os as _os

    assert len(_os.listdir(run._robots_dir())) == 1
    # a restarted run on the same run_dir picks the table up from disk
    run2 = CrawlRun(spark, None, [sy.url_of(0)], str(tmp_path / "rb"), cfg)
    assert run2.robots is not None and run2.robots.count() == 16

    # P7: compact() folds multiple robots deltas into one, lossless
    extra = udfs.with_url_identity(
        spark.createDataFrame(
            [(f"https://ghost{i:02d}.example.com/x",) for i in range(5)], "url string"
        )
    )
    run2._discover_robots(extra)  # 404 robots → unrestricted, new delta
    assert len(_os.listdir(run2._robots_dir())) == 2
    cfg1 = CrawlConfig(
        respect_robots=True, fetch_mode="http", http_proxy_base=base,
        delay_ms=0, max_depth=0, max_rounds=1,
    )
    # url_of(4) = site00 /article/4 — allowed by the synth robots
    # (url_of(0) is /page/0, which site00 disallows → empty frontier
    # would commit no round and compact would no-op)
    run3 = CrawlRun(spark, None, [sy.url_of(4)], str(tmp_path / "rb"), cfg1)
    run3.run(resume=True)  # one committed round so compact() engages
    run3.compact(keep_rounds=0)
    assert len(_os.listdir(run3._robots_dir())) == 1
    folded = {r["host"] for r in run3._robots_table().collect()}
    assert len(folded) == 21 and "ghost00.example.com" in folded


def test_conditional_recrawl_304(spark, web, tmp_path):
    """Generation 2 with gen-1's validator cache: every carryable page
    revalidates as 304 (no body shipped, no kernel run) and the
    extracted output still matches gen 1 exactly."""
    base, corpus, _ = web
    n = 500
    cfg = CrawlConfig(
        max_depth=1, round_wall_s=10.0, max_rounds=3, use_bloom=False,
        fetch_mode="http", http_proxy_base=base, delay_ms=0,
    )
    g1 = CrawlRun(spark, None, synth.seed_urls(n, k=8),
                  str(tmp_path / "g1"), cfg)
    g1.run(resume=False)
    v = g1.validators()
    assert v.count() > 10  # every 200 left a validator

    g2 = CrawlRun(spark, None, synth.seed_urls(n, k=8),
                  str(tmp_path / "g2"), cfg,
                  prior_extracted=g1.extracted(), validators=v)
    g2.run(resume=False)
    resp2 = spark.read.option("basePath", str(tmp_path / "g2")).parquet(
        str(tmp_path / "g2") + "/rounds/round=*/responses")
    n304 = resp2.filter("status = 304").count()
    n200 = resp2.filter("status = 200").count()
    # carryable pages (prior links non-null) revalidate; final-tier
    # pages (links null in gen 1) must refetch unconditionally
    carryable = g1.extracted().filter("links is not null") \
        .select("url").distinct()
    n_carryable_fetched = resp2.join(carryable, "url").count()
    assert n304 == n_carryable_fetched and n304 > 10
    # no carryable page pays a full 200 re-download
    assert resp2.filter("status = 200").join(carryable, "url").count() == 0
    assert n200 + n304 <= resp2.count()
    # same crawl product: identical article ids + bodies
    a1 = sorted((r["id"], r["body"]) for r in g1.articles().collect())
    a2 = sorted((r["id"], r["body"]) for r in g2.articles().collect())
    assert a1 == a2 and len(a1) > 0


def test_robots_ttl_refetch(spark, web, tmp_path):
    """robots_ttl_rounds: cached robots.txt re-fetches once stale;
    cache-forever (default) fetches each host once."""
    base, corpus, hits = web

    def robots_hits():
        return {p: n for p, n in hits.items() if p.endswith("/robots.txt")}

    def crawl(ttl, d):
        cfg = CrawlConfig(
            max_depth=2, round_wall_s=10.0, max_rounds=3, use_bloom=False,
            fetch_mode="http", http_proxy_base=base, delay_ms=0,
            respect_robots=True, robots_ttl_rounds=ttl,
        )
        run = CrawlRun(spark, None, synth.seed_urls(500, k=8),
                       str(tmp_path / d), cfg)
        run.run(resume=False)
        return run

    before = robots_hits()
    run_forever = crawl(None, "forever")
    mid = robots_hits()
    once = {p: mid.get(p, 0) - before.get(p, 0) for p in mid}
    # default: each discovered host fetched exactly once
    assert once and all(n == 1 for p, n in once.items() if n > 0)

    run_ttl = crawl(1, "ttl")
    after = robots_hits()
    ttl_counts = [after.get(p, 0) - mid.get(p, 0) for p in after]
    # ttl=1: hosts present across rounds re-fetch at least twice
    assert max(ttl_counts) >= 2
    # latest-wins table stays one row per host
    t = run_ttl._robots_table()
    assert t.count() == t.select("host").distinct().count()
    # both crawls produce the same seen set (rules are static here)
    a = sorted(r["url"] for r in run_forever.seen_final().collect())
    b = sorted(r["url"] for r in run_ttl.seen_final().collect())
    assert a == b
