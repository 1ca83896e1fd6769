"""RSS/Atom feed ingestion: page ``<link rel="alternate">`` discovery
→ feed XML → entry URLs with publish timestamps → adaptive poll
schedule.

The reference seeds crawls from configured source URLs and (since the
sitemap module) from sitemaps.org declarations; the third standard
discovery channel on the open web is the site's syndication feed —
RSS 2.0 ``<item><link>/<pubDate>`` and Atom 1.0 ``<entry><link
href>/<updated>``. Feeds are fresher than sitemaps (they list the
newest N entries, not the whole site), so they drive the incremental
re-crawl path: poll each feed at its own cadence, seed only entries
published since the last generation.

Spark shape (mirrors sitemap.py, the proven layout for this family):

- ``feeds_from_html`` is pure codegen'd expressions over the fetched
  page table — no UDF, the html column never shuffles;
- ``feed_entries`` parses XML per row inside an Arrow batch
  (mapInPandas) — only the extracted (link, published) rows shuffle;
- ``fetch_feeds`` reuses sitemap.fetch_sitemaps' distributed GET
  (per-URL task-local I/O, no driver hop);
- ``poll_intervals`` is one groupBy per feed with an integer
  lower-median over inter-entry gaps — cross-engine-exact (no float
  division) and O(entries-per-feed) aggregation state, which the feed
  format itself bounds (feeds carry the newest N entries, typically
  ≤ a few hundred).

Reference parity note: jonesrussell/gocrawl has no feed reader — this
is beyond-reference crawl infrastructure, same category as sitemap.py
(cited there: internal/crawler seeds from config only).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from datetime import datetime, timezone
from email.utils import parsedate_to_datetime

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gocrawl_spark.sitemap import fetch_sitemaps

_ITEM_RE = re.compile(r"<\s*item[\s>](.*?)<\s*/\s*item\s*>", re.I | re.S)
_ENTRY_RE = re.compile(r"<\s*entry[\s>](.*?)<\s*/\s*entry\s*>", re.I | re.S)
_RSS_LINK_RE = re.compile(r"<\s*link\s*>\s*(.*?)\s*<\s*/\s*link\s*>", re.I | re.S)
_ATOM_LINK_RE = re.compile(r"<\s*link\b([^>]*?)/?>", re.I | re.S)
_HREF_RE = re.compile(r"""href\s*=\s*["']([^"']*)["']""", re.I)
_REL_RE = re.compile(r"""rel\s*=\s*["']([^"']*)["']""", re.I)
_TITLE_RE = re.compile(r"<\s*title[^>]*>\s*(.*?)\s*<\s*/\s*title\s*>", re.I | re.S)
_PUBDATE_RE = re.compile(r"<\s*pubDate\s*>\s*(.*?)\s*<\s*/\s*pubDate\s*>", re.I | re.S)
_UPDATED_RE = re.compile(
    r"<\s*(updated|published)\s*>\s*(.*?)\s*<\s*/\s*\1\s*>", re.I | re.S
)
_ATOM_ROOT_RE = re.compile(r"<\s*feed[\s>]", re.I)
_CDATA_RE = re.compile(r"^\s*<!\[CDATA\[(.*?)\]\]>\s*$", re.S)


def _uncdata(s: str) -> str:
    m = _CDATA_RE.match(s)
    return m.group(1).strip() if m else s.strip()


def parse_feed_date(s: str | None):
    """RSS pubDate is RFC 822/1123 ("Mon, 02 Jan 2026 15:04:05 GMT");
    Atom updated/published is RFC 3339. Accept both everywhere — real
    feeds mix them freely. Returns an aware-UTC datetime or None."""
    if not s:
        return None
    s = s.strip()
    # RFC 822 first (the comma is a reliable discriminator, but
    # weekday-less "02 Jan 2026 ..." is also legal)
    try:
        dt = parsedate_to_datetime(s)
        if dt is not None:
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            return dt.astimezone(timezone.utc)
    except (TypeError, ValueError):
        pass
    for fmt in (
        "%Y-%m-%dT%H:%M:%S%z",
        "%Y-%m-%dT%H:%M:%SZ",
        "%Y-%m-%dT%H:%M:%S.%f%z",
        "%Y-%m-%dT%H:%M:%S.%fZ",
        "%Y-%m-%d",
    ):
        try:
            dt = datetime.strptime(s, fmt)
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            return dt.astimezone(timezone.utc)
        except ValueError:
            continue
    return None


def _atom_entry_link(block: str) -> str | None:
    """Atom <link>: prefer rel="alternate" (or rel-less, which
    defaults to alternate per RFC 4287 §4.2.7.2) over self/edit/
    enclosure links."""
    fallback = None
    for m in _ATOM_LINK_RE.finditer(block):
        attrs = m.group(1)
        href = _HREF_RE.search(attrs)
        if not href:
            continue
        rel = _REL_RE.search(attrs)
        rel_v = rel.group(1).strip().lower() if rel else "alternate"
        if rel_v == "alternate":
            return href.group(1)
        if fallback is None:
            fallback = href.group(1)
    return fallback


def parse_feed(xml: str | None) -> list[tuple[str, str | None, object, str]]:
    """[(link, title|None, published|None, kind)] from one feed
    document; kind is 'rss' or 'atom' (root-element sniff). Block-
    scoped regexes (the sitemap.py lesson): each date/title binds to
    ITS item, namespaces and attribute noise don't trip tag matching."""
    if not xml:
        return []
    out: list[tuple[str, str | None, object, str]] = []
    if _ATOM_ROOT_RE.search(xml):
        for m in _ENTRY_RE.finditer(xml):
            block = m.group(1)
            link = _atom_entry_link(block)
            if not link:
                continue
            t = _TITLE_RE.search(block)
            d = _UPDATED_RE.search(block)
            out.append(
                (
                    link.strip(),
                    _uncdata(t.group(1)) if t else None,
                    parse_feed_date(d.group(2) if d else None),
                    "atom",
                )
            )
        return out
    for m in _ITEM_RE.finditer(xml):
        block = m.group(1)
        link = _RSS_LINK_RE.search(block)
        if not link:
            continue
        t = _TITLE_RE.search(block)
        d = _PUBDATE_RE.search(block)
        out.append(
            (
                _uncdata(link.group(1)),
                _uncdata(t.group(1)) if t else None,
                parse_feed_date(d.group(1) if d else None),
                "rss",
            )
        )
    return out


def feeds_from_html(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, html) → (url, feed_url): every ``<link rel="alternate"
    type="application/rss+xml|atom+xml" href=…>`` advertisement in the
    page head. Pure codegen'd expressions — the html column is scanned
    once and never shuffles; only the (url, href) pairs do. href may
    be relative; resolve against the page URL with
    udfs.resolve_links_udf downstream (discover_feed_seeds does)."""
    tags = F.regexp_extract_all(F.col(html_col), F.lit(r"(?i)<link\b[^>]*>"), 0)
    feedish = F.filter(
        tags,
        lambda t: F.lower(t).contains("alternate")
        & (F.lower(t).contains("rss+xml") | F.lower(t).contains("atom+xml")),
    )
    hrefs = F.transform(
        feedish,
        lambda t: F.regexp_extract(t, r"""(?i)href\s*=\s*["']([^"']*)["']""", 1),
    )
    return (
        pages.select(F.col(url_col).alias("url"), F.explode(hrefs).alias("feed_url"))
        .filter(F.col("feed_url") != "")
    )


def feed_entries(
    xml_df: DataFrame, url_col: str = "feed_url", xml_col: str = "xml"
) -> DataFrame:
    """(feed_url, xml) rows → (feed_url, link, title, published,
    kind): one Arrow-batched parse per row; the XML never shuffles —
    only extracted entry rows do (sitemap_entries' shape)."""

    def run(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in parts:
            src, links, titles, pubs, kinds = [], [], [], [], []
            for u, x in zip(pdf[url_col], pdf[xml_col]):
                for link, title, pub, kind in parse_feed(x):
                    src.append(u)
                    links.append(link)
                    titles.append(title)
                    pubs.append(pub)
                    kinds.append(kind)
            yield pd.DataFrame(
                {
                    "feed_url": src,
                    "link": links,
                    "title": titles,
                    "published": pubs,
                    "kind": kinds,
                }
            )

    return xml_df.select(
        F.col(url_col).alias(url_col), F.col(xml_col).alias(xml_col)
    ).mapInPandas(
        run,
        schema=(
            "feed_url string, link string, title string, "
            "published timestamp, kind string"
        ),
    )


def fetch_feeds(urls: DataFrame, **kwargs) -> DataFrame:
    """(feed_url) → (feed_url, xml): distributed conditional-free GET —
    sitemap.fetch_sitemaps with this module's column name (same
    politeness caveats: one GET per distinct feed URL per poll)."""
    return fetch_sitemaps(urls, url_col="feed_url", **kwargs)


def discover_feed_seeds(
    pages: DataFrame,
    fetch=fetch_feeds,
    since=None,
    **fetch_kwargs,
) -> DataFrame:
    """Fetched pages → feed advertisements → fetch → entries →
    (url, published) seed rows, freshest-publish-wins per URL.
    ``since`` keeps only entries published on/after it — the
    incremental poll cut (entries WITHOUT a date always pass; absence
    is not staleness, mirroring sitemap.discover_seeds). ``fetch`` is
    injectable so tests resolve feed XML from a static table."""
    from gocrawl_spark import udfs

    ads = feeds_from_html(pages)
    resolved = ads.select(
        udfs.resolve_links_udf(F.col("url"), F.array(F.col("feed_url"))).getItem(0).alias(
            "feed_url"
        )
    ).filter(F.col("feed_url").isNotNull() & (F.col("feed_url") != ""))
    entries = feed_entries(fetch(resolved.distinct(), **fetch_kwargs))
    seeds = entries.select(F.col("link").alias("url"), "published")
    if since is not None:
        seeds = seeds.filter(
            F.col("published").isNull() | (F.col("published") >= F.lit(since))
        )
    return seeds.groupBy("url").agg(F.max("published").alias("published"))


def poll_intervals(
    entries: DataFrame,
    feed_col: str = "feed_url",
    published_col: str = "published",
    min_s: int = 300,
    max_s: int = 86400,
) -> DataFrame:
    """Adaptive per-feed poll schedule: (feed, interval_s) where
    interval_s is the LOWER MEDIAN of the feed's inter-entry gaps
    (seconds), clamped to [min_s, max_s] — the classic feed-reader
    heuristic (poll a feed about as often as it publishes). Feeds with
    <2 dated entries poll at max_s (unknown cadence → slow).

    Cross-engine-exact by construction: gaps are epoch-microsecond
    LONG differences over the value-sorted publish list (ties
    order-free), the median is an element pick (no float averaging),
    and seconds use integer division. Aggregation state is
    O(entries-per-feed), bounded by the format itself (a feed carries
    its newest N entries)."""
    # cast: parquet timestamps read as TIMESTAMP_NTZ, which
    # unix_micros rejects; the session zone is pinned UTC everywhere
    us = F.unix_micros(F.col(published_col).cast("timestamp"))
    agg = (
        entries.filter(F.col(published_col).isNotNull())
        .groupBy(F.col(feed_col).alias("feed"))
        .agg(F.array_sort(F.collect_list(us)).alias("ts"))
    )
    n = F.size(F.col("ts"))
    gaps = F.zip_with(
        F.slice(F.col("ts"), 2, F.greatest(n - 1, F.lit(0))),
        F.slice(F.col("ts"), 1, F.greatest(n - 1, F.lit(0))),
        lambda a, b: a - b,
    )
    sorted_gaps = F.array_sort(gaps)
    median_us = F.element_at(sorted_gaps, ((F.size(sorted_gaps) + 1) / 2).cast("int"))
    interval = F.least(
        F.lit(max_s).cast("long"),
        F.greatest(F.lit(min_s).cast("long"), F.expr("_m DIV 1000000")),
    )
    return (
        agg.withColumn("_m", median_us)
        .withColumn(
            "interval_s",
            F.when(n < 2, F.lit(max_s).cast("long")).otherwise(interval),
        )
        .select("feed", "interval_s")
    )
