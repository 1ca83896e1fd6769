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
