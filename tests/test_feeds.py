"""RSS/Atom feed ingestion: parse both dialects, discover feed
advertisements from page HTML, seed from entries, adaptive polling."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from gocrawl_spark import feeds

RSS = """<rss version="2.0"><channel><title>Blog</title>
<item><title><![CDATA[Post one]]></title><link>https://a.com/1</link>
<pubDate>Mon, 05 Jan 2026 08:30:45 GMT</pubDate></item>
<item><title>Post two</title><link> https://a.com/2 </link>
<pubDate>02 Feb 2026 10:00:00 +0200</pubDate></item>
<item><link>https://a.com/3</link></item>
<item><title>no link, skipped</title></item>
</channel></rss>"""

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom"><title>site</title>
<entry><title>E1</title><link rel="self" href="https://b.com/self"/>
<link rel="alternate" href="https://b.com/e1"/>
<updated>2026-03-01T12:00:00Z</updated></entry>
<entry><title>E2</title><link href="https://b.com/e2"/>
<published>2026-03-02T12:00:00+01:00</published></entry>
<entry><title>only self</title><link rel="self" href="https://b.com/s2"/></entry>
</feed>"""


def test_parse_rss_items_bind_per_item():
    rows = feeds.parse_feed(RSS)
    assert [r[0] for r in rows] == [
        "https://a.com/1", "https://a.com/2", "https://a.com/3",
    ]
    # CDATA unwrapped, whitespace trimmed, RFC822 with and without
    # weekday + non-UTC zone normalized to UTC
    assert rows[0][1] == "Post one"
    assert rows[0][2] == datetime(2026, 1, 5, 8, 30, 45, tzinfo=timezone.utc)
    assert rows[1][2] == datetime(2026, 2, 2, 8, 0, 0, tzinfo=timezone.utc)
    assert rows[2][1] is None and rows[2][2] is None
    assert all(r[3] == "rss" for r in rows)


def test_parse_atom_link_rel_priority():
    rows = feeds.parse_feed(ATOM)
    # rel=alternate wins over rel=self; rel-less defaults to alternate;
    # a self-only entry falls back to its only href
    assert [r[0] for r in rows] == [
        "https://b.com/e1", "https://b.com/e2", "https://b.com/s2",
    ]
    assert rows[0][2] == datetime(2026, 3, 1, 12, 0, tzinfo=timezone.utc)
    assert rows[1][2] == datetime(2026, 3, 2, 11, 0, tzinfo=timezone.utc)
    assert all(r[3] == "atom" for r in rows)


def test_parse_feed_date_variants():
    pd_ = feeds.parse_feed_date
    assert pd_("Mon, 05 Jan 2026 08:30:45 GMT") == datetime(
        2026, 1, 5, 8, 30, 45, tzinfo=timezone.utc
    )
    assert pd_("2026-03-02T12:00:00.250+01:00") == datetime(
        2026, 3, 2, 11, 0, 0, 250000, tzinfo=timezone.utc
    )
    assert pd_("2026-03-02") == datetime(2026, 3, 2, tzinfo=timezone.utc)
    assert pd_("not a date") is None
    assert pd_(None) is None


def test_feeds_from_html_attribute_order_and_case(spark):
    pages = spark.createDataFrame(
        [
            (
                "https://a.com/",
                '<html><head><link rel="alternate" type="application/rss+xml"'
                ' href="/feed.xml"><link href="/style.css" rel="stylesheet">'
                "</head>",
            ),
            (
                "https://b.com/",
                "<html><head><LINK TYPE='application/atom+xml'"
                " HREF='https://b.com/atom' REL='alternate'/></head>",
            ),
            ("https://c.com/", "<html><head><link rel='alternate'></head>"),
        ],
        "url string, html string",
    )
    got = {(r["url"], r["feed_url"]) for r in feeds.feeds_from_html(pages).collect()}
    assert got == {
        ("https://a.com/", "/feed.xml"),
        ("https://b.com/", "https://b.com/atom"),
    }


def _static_fetch_factory(spark, table):
    def static_fetch(pending, **kw):
        rows = [
            (r["feed_url"], table.get(r["feed_url"], ""))
            for r in pending.collect()
        ]
        return spark.createDataFrame(rows, "feed_url string, xml string")

    return static_fetch


def test_discover_feed_seeds_resolves_and_since(spark):
    pages = spark.createDataFrame(
        [
            (
                "https://a.com/index.html",
                '<link rel="alternate" type="application/rss+xml" href="/feed.xml">',
            ),
            (
                "https://b.com/",
                '<link rel="alternate" type="application/atom+xml"'
                ' href="https://b.com/atom">',
            ),
        ],
        "url string, html string",
    )
    fetch = _static_fetch_factory(
        spark, {"https://a.com/feed.xml": RSS, "https://b.com/atom": ATOM}
    )
    seeds = feeds.discover_feed_seeds(pages, fetch=fetch)
    got = {r["url"] for r in seeds.collect()}
    assert got == {
        "https://a.com/1", "https://a.com/2", "https://a.com/3",
        "https://b.com/e1", "https://b.com/e2", "https://b.com/s2",
    }
    # since cut: dated-stale dropped, undated kept
    fresh = feeds.discover_feed_seeds(
        pages, fetch=fetch, since=datetime(2026, 2, 15, tzinfo=timezone.utc)
    )
    got = {r["url"] for r in fresh.collect()}
    assert got == {
        "https://a.com/3",  # undated always passes
        "https://b.com/e1", "https://b.com/e2",
        "https://b.com/s2",  # undated
    }


def test_poll_intervals_median_and_clamp(spark):
    base = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = []
    # hourly feed: gaps 3600s → interval 3600
    for i in range(5):
        rows.append(("hourly", datetime(2026, 1, 1, i, tzinfo=timezone.utc)))
    # bursty feed: gaps [60, 60, 7200] → lower median 60 → clamped to 300
    for s in (0, 60, 120, 7320):
        rows.append(("bursty", datetime.fromtimestamp(1767225600 + s, tz=timezone.utc)))
    # monthly feed: one 30-day gap → clamped to 86400
    rows.append(("monthly", base))
    rows.append(("monthly", datetime(2026, 1, 31, tzinfo=timezone.utc)))
    # single-entry feed: unknown cadence → max
    rows.append(("single", base))
    df = spark.createDataFrame(rows, "feed_url string, published timestamp")
    got = {r["feed"]: r["interval_s"] for r in feeds.poll_intervals(df).collect()}
    assert got == {"hourly": 3600, "bursty": 300, "monthly": 86400, "single": 86400}
