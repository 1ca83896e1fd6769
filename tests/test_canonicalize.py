"""URL junk-filter/absolutization/hash tests (link_handler.go:26-58)."""

from gocrawl_spark.canonicalize import (
    absolutize,
    host_of,
    is_junk_link,
    is_valid_url,
    registrable_domain,
)


def test_junk_prefixes():
    assert is_junk_link("#top")
    assert is_junk_link("javascript:void(0)")
    assert is_junk_link("mailto:a@b.c")
    assert is_junk_link("tel:+1555")
    assert not is_junk_link("/path")
    assert not is_junk_link("https://e.com")


def test_absolutize_relative():
    assert absolutize("https://e.com/a/b", "c") == "https://e.com/a/c"
    assert absolutize("https://e.com/a/b", "/c") == "https://e.com/c"
    assert absolutize("https://e.com/a/", "../x") == "https://e.com/x"
    assert absolutize("https://e.com/a", "//other.com/p") == "https://other.com/p"
    assert absolutize("https://e.com/a", "https://abs.com/x") == "https://abs.com/x"


def test_absolutize_fragment_returns_empty():
    assert absolutize("https://e.com/a", "#frag") == ""


def test_absolutize_strips_fragment():
    assert absolutize("https://e.com/a", "/p#sec") == "https://e.com/p"


def test_absolutize_non_http_empty():
    assert absolutize("https://e.com/a", "ftp://x/y") == ""


def test_valid_url():
    assert is_valid_url("https://e.com/a")
    assert not is_valid_url("not a url")


def test_host_and_registrable_domain():
    assert host_of("https://Sub.Example.COM/p") == "sub.example.com"
    assert registrable_domain("sub.example.com") == "example.com"
    assert registrable_domain("a.b.co.uk") == "b.co.uk"
    assert registrable_domain("example.com") == "example.com"


def test_host_col_matches_python_host_of(spark):
    """The JVM-side host expression (udfs.host_col, parse_url) must
    agree with canonicalize.host_of (urlsplit) on every URL shape the
    crawl produces — plus casing, ports, userinfo, query/fragment — so
    swapping the frontier identity path to codegen is behavior-free."""
    from pyspark.sql import functions as F

    from gocrawl_spark import synth, udfs

    urls = [synth.url_of(i) for i in range(500)]
    urls += [
        "https://Sub.Example.COM/p",
        "http://example.com:8080/a?b=c",
        "https://user:pw@example.com/x",
        "https://example.com/a#frag",
        "http://example.com",
        "https://example.com/",
        "https://a.b.co.uk/deep/path?q=1&r=2",
        "https://xn--bcher-kva.example/x",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["url"]: r["h"] for r in df.select("url", udfs.host_col("url").alias("h")).collect()}
    for u in urls:
        assert got[u] == host_of(u), u


def test_normalize_url_expr(spark):
    """RFC 3986 §6 normalization (opt-in frontier-dedup op): case,
    default ports, fragments, tracking params, empty paths; non-http
    schemes pass through untouched."""
    from gocrawl_spark.canonicalize import normalize_url_expr

    cases = [
        ("HTTP://Example.COM:80/a?b=2&utm_source=x&a=1#frag",
         "http://example.com/a?a=1&b=2"),
        ("https://example.com:443/", "https://example.com/"),
        ("https://example.com", "https://example.com/"),
        ("https://example.com/p?utm_campaign=z", "https://example.com/p"),
        ("https://example.com:8080/p?z=1&a=2",
         "https://example.com:8080/p?a=2&z=1"),
        ("mailto:x@example.com", "mailto:x@example.com"),
        ("ftp://example.com/f", "ftp://example.com/f"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["n"] for r in
           df.select(normalize_url_expr("url").alias("n")).collect()]
    assert got == [want for _, want in cases]


def test_is_trap_expr_gates(spark):
    """Each trap class trips exactly its gate; clean URLs pass. The
    opt-in frontier filter (CrawlConfig(drop_traps=True)) applies this
    expression to candidates ahead of the seen filter."""
    from pyspark.sql import functions as F

    from gocrawl_spark.canonicalize import is_trap_expr, trap_signals

    cases = [
        ("https://h.com/a/a/a/p/1", True),        # repeated segment ×3
        ("https://h.com/a/b/a/p/1", False),       # twice only — legitimate
        ("https://h.com/" + "/".join(f"p{i}" for i in range(13)), True),  # deep
        ("https://h.com/doc?" + "&".join(f"k{i}={i}" for i in range(9)), True),
        ("https://h.com/doc/1?phpsessid=abc", True),
        ("https://h.com/doc/1?JSESSIONID=x", True),
        ("https://h.com/doc/1?page=2&sort=asc", False),
        ("https://h.com/a/b/c/d/e/f/g", False),   # deep-ish but under 12
        ("https://h.com/", False),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r["url"]: r["t"]
        for r in df.select("url", is_trap_expr("url").alias("t")).collect()
    }
    for u, want in cases:
        assert got[u] is want, u
    s = trap_signals("url")
    row = (
        df.filter(F.col("url") == "https://h.com/a/b/a/p/1")
        .select(s["n_repeats"].alias("r"), s["n_segments"].alias("n"))
        .collect()[0]
    )
    assert (row["r"], row["n"]) == (1, 5)  # a,b,a,p,1 → one repetition


def test_drop_traps_filters_candidates(spark):
    """CrawlConfig(drop_traps=True) drops trap children in
    expand_candidates; the parity default keeps them."""
    from gocrawl_spark import rounds, udfs
    from gocrawl_spark.rounds import CrawlConfig, expand_candidates

    batch = udfs.with_url_identity(
        spark.createDataFrame(
            [("https://h.com/start", 0, 5, 0, 0, 0)],
            "url string, depth int, priority int, discovered_round int,"
            " discovery_seq long, attempt int",
        )
    )
    extracted = spark.createDataFrame(
        [("https://h.com/start", ["/ok/page", "/a/a/a/trap", "/d?phpsessid=1"])],
        "url string, links array<string>",
    )
    cfg_off = CrawlConfig(max_depth=2)
    cfg_on = CrawlConfig(max_depth=2, drop_traps=True)
    off = {r["url"] for r in expand_candidates(extracted, batch, cfg_off, 0).collect()}
    on = {r["url"] for r in expand_candidates(extracted, batch, cfg_on, 0).collect()}
    assert "https://h.com/a/a/a/trap" in off and "https://h.com/d?phpsessid=1" in off
    assert on == {"https://h.com/ok/page"}


def test_dust_rules(spark):
    """dust_rules learns a strip rule only when the stripped alias was
    crawled AND its digest agrees, with min_support enforcement and a
    violation killing the rule (Bar-Yossef et al. WWW'07 semantics)."""
    from gocrawl_spark.canonicalize import dust_rules

    rows = []
    # h1.com: ?sid= is pure noise on 3 pages -> validated rule
    for i in range(3):
        rows.append((f"https://h1.com/p/{i}?a=1&sid={i}", f"d1-{i}"))
        rows.append((f"https://h1.com/p/{i}?a=1", f"d1-{i}"))
    # h2.com: sid changes content on two of 3 pages -> violated
    for i in range(3):
        rows.append((f"https://h2.com/p/{i}?a=1&sid={i}", f"d2-{i}-sid"))
        rows.append((f"https://h2.com/p/{i}?a=1", f"d2-{i}" if i else "d2-0-sid"))
    # h3.com: only 2 supports -> below min_support=3
    for i in range(2):
        rows.append((f"https://h3.com/p/{i}?sid={i}", f"d3-{i}"))
        rows.append((f"https://h3.com/p/{i}", f"d3-{i}"))
    # h4.com: stripping 'a' never lands on a crawled URL -> no row
    rows.append(("https://h4.com/p/0?a=1", "d4"))
    pages = spark.createDataFrame(rows, "url string, digest string")
    got = {
        (r["host"], r["param"]): (r["support"], r["violations"], r["rule_ok"])
        for r in dust_rules(pages, min_support=3).collect()
    }
    assert got[("h1.com", "sid")] == (3, 0, True)
    assert got[("h2.com", "sid")] == (1, 2, False)
    assert got[("h3.com", "sid")] == (2, 0, False)
    assert ("h4.com", "a") not in got
    # the a= strip on h1/h2 never matches a crawled URL either
    assert ("h1.com", "a") not in got


def test_apply_dust_rules(spark):
    """apply_dust_rules strips only validated (host, param) rules:
    rule-hosts lose the param, no-rule hosts and query-less URLs pass
    through, and a fully-stripped query drops its '?'."""
    from gocrawl_spark.canonicalize import apply_dust_rules

    rules = spark.createDataFrame(
        [("h1.com", "sid", 3, 0, True), ("h2.com", "sid", 1, 2, False)],
        "host string, param string, support long, violations long,"
        " rule_ok boolean",
    )
    urls = spark.createDataFrame(
        [
            ("https://h1.com/p?a=1&sid=9",),
            ("https://h1.com/p?sid=9",),
            ("https://h1.com/plain",),
            ("https://h2.com/p?a=1&sid=9",),
            ("https://h3.com/p?sid=9",),
        ],
        "url string",
    )
    got = {
        r["url"]: r["canonical_url"]
        for r in apply_dust_rules(urls, rules).collect()
    }
    assert got["https://h1.com/p?a=1&sid=9"] == "https://h1.com/p?a=1"
    assert got["https://h1.com/p?sid=9"] == "https://h1.com/p"
    assert got["https://h1.com/plain"] == "https://h1.com/plain"
    assert got["https://h2.com/p?a=1&sid=9"] == "https://h2.com/p?a=1&sid=9"
    assert got["https://h3.com/p?sid=9"] == "https://h3.com/p?sid=9"


def test_url_templates(spark):
    """Digit runs mask to N; min_count filters singletons; example is
    the lexicographic min member."""
    from gocrawl_spark.canonicalize import url_templates

    urls = [
        "https://h.com/p/1", "https://h.com/p/22", "https://h.com/p/9",
        "https://h.com/cal/2024/3/14", "https://h.com/cal/2023/1/2",
        "https://h.com/about",
        "https://other.com/p/5",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        (r["host"], r["template"]): (r["n_urls"], r["example_url"])
        for r in url_templates(df, min_count=2).collect()
    }
    assert got[("h.com", "/p/N")] == (3, "https://h.com/p/1")
    assert got[("h.com", "/cal/N/N/N")] == (2, "https://h.com/cal/2023/1/2")
    assert ("h.com", "/about") not in got       # singleton dropped
    assert ("other.com", "/p/N") not in got     # singleton dropped


def test_trap_rules_learn_low_yield_space(spark):
    """A calendar space minting 12 URLs with 2 distinct digests is a
    trap; an article space hashing unique is not; a space under
    min_urls never trips however low its yield."""
    from gocrawl_spark.canonicalize import apply_trap_rules, trap_rules

    rows = (
        [(f"https://a.com/cal/2024/{m}/{d}", "dupA") for m in range(3) for d in range(2)]
        + [(f"https://a.com/cal/2023/{m}/{d}", "dupB") for m in range(3) for d in range(2)]
        + [(f"https://a.com/p/{i}", f"u{i}") for i in range(10)]
        + [("https://b.com/x/1", "z"), ("https://b.com/x/2", "z")]
    )
    pages = spark.createDataFrame(rows, "url string, digest string")
    rules = trap_rules(pages, min_urls=8, max_yield_bp=3000)
    got = {
        (r["host"], r["template"]): (r["n_urls"], r["n_digests"], r["trap"])
        for r in rules.collect()
    }
    assert got[("a.com", "/cal/N/N/N")] == (12, 2, True)
    assert got[("a.com", "/p/N")] == (10, 10, False)
    assert got[("b.com", "/x/N")] == (2, 1, False)  # under min_urls

    frontier = spark.createDataFrame(
        [
            ("https://a.com/cal/2025/7/9",),   # unseen member of the space
            ("https://a.com/p/99",),
            ("https://b.com/x/3",),
            ("https://c.com/cal/2024/1/1",),   # other host: no rule
        ],
        "url string",
    )
    flagged = {
        r["url"]: r["is_trap"]
        for r in apply_trap_rules(frontier, rules).collect()
    }
    assert flagged == {
        "https://a.com/cal/2025/7/9": True,
        "https://a.com/p/99": False,
        "https://b.com/x/3": False,
        "https://c.com/cal/2024/1/1": False,
    }
