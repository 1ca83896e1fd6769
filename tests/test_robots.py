"""robots.txt evaluation (S3): parser, RFC 9309 matching, frontier gate.

The reference ships the flag but runs with robots off
(internal/crawler/crawler.go:201); these tests cover the configured
behavior our CrawlConfig.respect_robots enables.
"""

from __future__ import annotations

import tempfile

import pytest

from gocrawl_spark import robots as rb
from gocrawl_spark import synth

SIMPLE = """
User-agent: *
Disallow: /private/
Allow: /private/ok
"""

GROUPS = """
User-agent: googlebot
Disallow: /

User-agent: gocrawl
Disallow: /tag/

User-agent: *
Disallow: /all/
"""

WILDCARDS = """
User-agent: *
Disallow: /*.pdf$
Disallow: /tmp*/
Allow: /tmp-ok/
"""


def test_parse_picks_matching_group():
    rules = rb.parse_robots(GROUPS, ua="gocrawl")
    assert rules == [(False, "/tag/")]
    # unknown UA falls back to *
    assert rb.parse_robots(GROUPS, ua="otherbot") == [(False, "/all/")]
    # longest UA-token prefix wins over *
    assert rb.parse_robots(GROUPS, ua="googlebot-images") == [(False, "/")]


def test_longest_match_wins_allow_ties():
    rules = rb.parse_robots(SIMPLE)
    assert rb.robots_allowed("/private/secret", rules) is False
    assert rb.robots_allowed("/private/ok/page", rules) is True  # longer Allow
    assert rb.robots_allowed("/public/x", rules) is True  # no match ⇒ allow


def test_wildcard_and_anchor():
    rules = rb.parse_robots(WILDCARDS)
    assert rb.robots_allowed("/docs/report.pdf", rules) is False
    assert rb.robots_allowed("/docs/report.pdf.html", rules) is True  # $ anchor
    assert rb.robots_allowed("/tmp123/file", rules) is False
    assert rb.robots_allowed("/tmp-ok/file", rules) is True


def test_empty_and_comment_handling():
    assert rb.parse_robots("") == []
    assert rb.robots_allowed("/anything", []) is True
    rules = rb.parse_robots("User-agent: *  # all\nDisallow:  # empty = allow all\n")
    assert rules == []


def test_gate_filters_candidates(spark):
    robots = rb.synth_robots(spark)
    cand = spark.createDataFrame(
        [
            ("https://site01.example.com/article/4", "site01.example.com"),
            ("https://site01.example.com/category/3", "site01.example.com"),
            ("https://no-robots.example.com/category/9", "no-robots.example.com"),
        ],
        "url string, host string",
    )
    kept = {r.url for r in rb.gate(cand, robots).collect()}
    assert kept == {
        "https://site01.example.com/article/4",
        # host without a robots row is fully allowed
        "https://no-robots.example.com/category/9",
    }


@pytest.fixture(scope="module")
def robots_crawl(spark, sf_dir):
    from gocrawl_spark.rounds import CrawlConfig, CrawlRun

    corpus = synth.corpus_from_documents(spark, sf_dir)
    seeds = synth.seed_urls(500, k=16)
    run_dir = tempfile.mkdtemp(prefix="robots_crawl_")
    cfg = CrawlConfig(max_depth=2, round_wall_s=20.0, max_rounds=3, respect_robots=True)
    crawl = CrawlRun(
        spark, corpus, seeds, run_dir, cfg, robots=rb.synth_robots(spark)
    )
    crawl.run(resume=False)
    return crawl


def test_crawl_respects_robots(robots_crawl):
    seen = [r.url for r in robots_crawl.seen_final().collect()]
    assert seen, "robots crawl fetched nothing"
    # synth_robots disallows /category/ on every host
    assert not [u for u in seen if "/category/" in u]
    # hosts with "Disallow: /" (i % 5 == 2) must never be fetched
    blocked_hosts = {f"site{i:02d}.example.com" for i in range(synth.N_HOSTS) if i % 5 == 2}
    assert not [u for u in seen if any(h in u for h in blocked_hosts)]


def test_host_state_snapshot(robots_crawl):
    hs = {r.domain: r for r in robots_crawl.host_state().collect()}
    assert hs, "host_state empty"
    total = sum(r.fetched_total for r in hs.values())
    assert total == robots_crawl.seen_final().count()
    assert all(r.delay_ms == 2000 for r in hs.values())


def test_host_policy_budget(spark, sf_dir):
    """A restrictive per-host policy caps that host's pops per round."""
    from gocrawl_spark.rounds import CrawlConfig, CrawlRun

    corpus = synth.corpus_from_documents(spark, sf_dir)
    run_dir = tempfile.mkdtemp(prefix="policy_crawl_")
    # site00 (the hot host): 1 fetch per round; others default budget
    policy = spark.createDataFrame(
        [("site00.example.com", 20_000, 1)], "domain string, delay_ms long, parallelism int"
    )
    cfg = CrawlConfig(max_depth=0, round_wall_s=20.0, max_rounds=1)
    crawl = CrawlRun(
        spark, corpus, corpus.select("url"), run_dir, cfg, host_policy=policy
    )
    crawl.run(resume=False)
    by_host = {r.domain: r.fetched_total for r in crawl.host_state().collect()}
    assert by_host["site00.example.com"] == 1
    # un-policied hosts use the default budget (20s / 2s * 2 = 20)
    assert all(v <= 20 for h, v in by_host.items() if h != "site00.example.com")
    assert any(v > 1 for h, v in by_host.items() if h != "site00.example.com")


DELAYED = """
User-agent: googlebot
Crawl-delay: 1

User-agent: gocrawl
Disallow: /private/
Crawl-delay: 30

User-agent: *
Crawl-delay: 5
"""


def test_parse_crawl_delay_group_selection():
    assert rb.parse_crawl_delay(DELAYED, ua="gocrawl") == 30.0
    assert rb.parse_crawl_delay(DELAYED, ua="googlebot") == 1.0
    assert rb.parse_crawl_delay(DELAYED, ua="otherbot") == 5.0
    assert rb.parse_crawl_delay("User-agent: *\nCrawl-delay: 2.5\n") == 2.5
    assert rb.parse_crawl_delay("User-agent: *\nDisallow: /x\n") is None
    assert rb.parse_crawl_delay("User-agent: *\nCrawl-delay: soon\n") is None
    assert rb.parse_crawl_delay("") is None


def test_crawl_delay_policy_budget(spark, sf_dir):
    """robots Crawl-delay shapes the politeness budget (S3→P1 bridge):
    a 10s delay on site00 caps it at 2 pops in a 20s round, while an
    explicit host_policy row for the same host takes precedence."""
    from gocrawl_spark.rounds import CrawlConfig, CrawlRun

    corpus = synth.corpus_from_documents(spark, sf_dir)
    robots = spark.createDataFrame(
        [("site00.example.com", "User-agent: *\nCrawl-delay: 10\n")],
        "host string, rules string",
    )
    cfg = CrawlConfig(
        max_depth=0, round_wall_s=20.0, max_rounds=1,
        parallelism=1, robots_crawl_delay=True,
    )
    crawl = CrawlRun(
        spark, corpus, corpus.select("url"),
        tempfile.mkdtemp(prefix="cd_crawl_"), cfg, robots=robots,
    )
    crawl.run(resume=False)
    by_host = {r.domain: r.fetched_total for r in crawl.host_state().collect()}
    assert by_host["site00.example.com"] == 2  # floor(20s/10s) * 1
    assert any(v > 2 for h, v in by_host.items() if h != "site00.example.com")

    # explicit policy wins over the robots-derived row
    explicit = spark.createDataFrame(
        [("site00.example.com", 20_000, 1)], "domain string, delay_ms long, parallelism int"
    )
    crawl2 = CrawlRun(
        spark, corpus, corpus.select("url"),
        tempfile.mkdtemp(prefix="cd_crawl2_"), cfg,
        robots=robots, host_policy=explicit,
    )
    crawl2.run(resume=False)
    by_host2 = {r.domain: r.fetched_total for r in crawl2.host_state().collect()}
    assert by_host2["site00.example.com"] == 1  # explicit 20s, not robots 10s


def test_gate_join_strategy_dispatch(spark):
    """gate() must not hard-broadcast the robots table: forced
    broadcast=False yields a non-broadcast host join (the open-web
    shape where the rules corpus is too big for one address space),
    and both shapes return identical rows."""
    from gocrawl_spark import synth, udfs

    robots = rb.synth_robots(spark)
    cand = udfs.with_url_identity(
        spark.createDataFrame(
            [(synth.url_of(i),) for i in range(60)], "url string"
        )
    )
    bcast = rb.gate(cand, robots, broadcast=True)
    shuffled = rb.gate(cand, robots, broadcast=False)
    assert sorted(r.url for r in bcast.collect()) == sorted(
        r.url for r in shuffled.collect()
    )
    plan = shuffled._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan and "BroadcastExchange" not in plan


def test_parse_combines_matching_groups():
    """RFC 9309 §2.2.1: rules from ALL groups at the winning UA
    specificity combine — real robots.txt files often repeat
    'User-agent: *' groups and each one's rules apply."""
    text = (
        "User-agent: *\nDisallow: /a\n\n"
        "User-agent: *\nDisallow: /b\n\n"
        "User-agent: gocrawl\nDisallow: /g1\n\n"
        "User-agent: gocrawl\nDisallow: /g2\n"
    )
    star = rb.parse_robots(text, ua="otherbot")
    assert {p for _a, p in star} == {"/a", "/b"}
    # a more specific UA wins over * AND merges its own groups
    mine = rb.parse_robots(text, ua="gocrawl")
    assert {p for _a, p in mine} == {"/g1", "/g2"}
    assert rb.robots_allowed("/b/x", star) is False
    # crawl-delay: matching groups combine, last declared delay wins
    cd = "User-agent: *\nCrawl-delay: 5\n\nUser-agent: *\nDisallow: /x\nCrawl-delay: 2\n"
    assert rb.parse_crawl_delay(cd, ua="anybot") == 2.0


def test_unreachable_robots_disallows_without_persisting(spark):
    """RFC 9309 §2.3.1.4: a 5xx/unreachable robots.txt means complete
    disallow for the round (ok=False), while 4xx means unrestricted
    (ok=True) — and the gate enforces the synthesized rules."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from gocrawl_spark import fetch

    codes = {"h500.test": 500, "h404.test": 404, "h200.test": 200}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def do_GET(self):
            host = self.path.strip("/").split("/")[0]
            code = codes.get(host, 404)
            if code == 200:
                body = b"User-agent: *\nDisallow: /private\n"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(code)
                self.end_headers()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        hosts = spark.createDataFrame([(h,) for h in codes], "host string")
        rows = {r["host"]: r for r in
                fetch.fetch_robots(hosts, proxy_base=base).collect()}
        assert rows["h500.test"]["ok"] is False
        assert rows["h500.test"]["rules"] == fetch.UNREACHABLE_RULES
        assert rows["h404.test"]["ok"] is True and rows["h404.test"]["rules"] == ""
        assert rows["h200.test"]["ok"] is True
        assert "Disallow: /private" in rows["h200.test"]["rules"]

        # the synthesized rules gate EVERYTHING on the unreachable host
        cand = spark.createDataFrame(
            [("https://h500.test/any", "h500.test"),
             ("https://h404.test/any", "h404.test"),
             ("https://h200.test/private/x", "h200.test"),
             ("https://h200.test/ok", "h200.test")],
            "url string, host string",
        )
        robots_df = spark.createDataFrame(
            [(h, rows[h]["rules"]) for h in codes], "host string, rules string"
        )
        kept = {r["url"] for r in rb.gate(cand, robots_df).collect()}
        assert kept == {"https://h404.test/any", "https://h200.test/ok"}
    finally:
        srv.shutdown()


def test_ttl_refetch_unreachable_keeps_cached_rules(spark, tmp_path, monkeypatch):
    """A TTL re-fetch that fails (5xx/network) keeps the CACHED rules
    (RFC 9309 §2.4) — and never duplicates the host in the gate
    table."""
    from gocrawl_spark import fetch as fh
    from gocrawl_spark.rounds import CrawlConfig, CrawlRun

    cfg = CrawlConfig(
        respect_robots=True, fetch_mode="http", robots_ttl_rounds=1,
    )
    run = CrawlRun(spark, None, [], str(tmp_path / "r"), cfg)
    cand = spark.createDataFrame([("a.com",), ("b.com",)], "host string")

    def fake_ok(hosts, **kw):
        return spark.createDataFrame(
            [(r["host"], "User-agent: *\nDisallow: /private", True)
             for r in hosts.collect()],
            "host string, rules string, ok boolean",
        )

    monkeypatch.setattr(fh, "fetch_robots", fake_ok)
    run._discover_robots(cand, rnd=0)
    assert run.robots.count() == 2

    def fake_down(hosts, **kw):
        from gocrawl_spark.fetch import UNREACHABLE_RULES
        return spark.createDataFrame(
            [(r["host"], UNREACHABLE_RULES, False) for r in hosts.collect()],
            "host string, rules string, ok boolean",
        )

    monkeypatch.setattr(fh, "fetch_robots", fake_down)
    run._discover_robots(cand, rnd=5)  # TTL expired -> re-fetch fails
    rows = run.robots.collect()
    assert len(rows) == 2  # one row per host, no duplicate
    assert all("Disallow: /private" in r["rules"] for r in rows)  # cached wins
    # a NEVER-seen host that is unreachable still gets disallow-all
    cand3 = spark.createDataFrame([("c.com",)], "host string")
    run._discover_robots(cand3, rnd=5)
    got = {r["host"]: r["rules"] for r in run.robots.collect()}
    assert "Disallow: /" in got["c.com"] and len(got) == 3


def test_rule_attribution_winners(spark):
    """RFC 9309 winner election per URL: longest pattern, Allow wins
    ties, unmatched URLs attributed to a NULL rule; counts agree with
    the gate's verdicts."""
    from gocrawl_spark import robots as rb

    robots = rb.synth_robots(spark)
    urls = spark.createDataFrame(
        [
            ("site00.example.com", "https://site00.example.com/article/5"),
            ("site00.example.com", "https://site00.example.com/category/9"),
            ("site00.example.com", "https://site00.example.com/page/7"),
            ("site00.example.com", "https://site00.example.com/page/17"),
            ("site02.example.com", "https://site02.example.com/article/5"),
            ("site01.example.com", "https://site01.example.com/article/5"),
        ],
        "host string, url string",
    )
    got = {
        (r["host"], r["pattern"]): (r["verdict_allowed"], r["n_urls"])
        for r in rb.rule_attribution(urls, robots).collect()
    }
    # site00 (hi%3=0): /page/7 → Disallow /page/; /page/17 → the
    # LONGER Allow /page/1; /category/9 → Disallow /category/;
    # /article/5 matches nothing
    assert got[("site00.example.com", "/page/")] == (False, 1)
    assert got[("site00.example.com", "/page/1")] == (True, 1)
    assert got[("site00.example.com", "/category/")] == (False, 1)
    assert got[("site00.example.com", None)] == (True, 1)
    # site02 (hi%5=2): Disallow / catches everything unhandled
    assert got[("site02.example.com", "/")] == (False, 1)
    assert got[("site01.example.com", None)] == (True, 1)
    # attribution's allowed mass equals the gate's kept count
    kept = rb.gate(urls, robots).count()
    assert kept == sum(n for (ok, n) in got.values() if ok)

    # crawl-log-shaped input: repeated URL rows each count — n_urls
    # is a ROW count (the winner window partitions on a per-row id,
    # not the URL string)
    dup = urls.unionAll(
        urls.filter("url = 'https://site00.example.com/page/7'")
    )
    got_dup = {
        (r["host"], r["pattern"]): r["n_urls"]
        for r in rb.rule_attribution(dup, robots).collect()
    }
    assert got_dup[("site00.example.com", "/page/")] == 2
