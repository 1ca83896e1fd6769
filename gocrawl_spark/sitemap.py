"""Sitemap ingestion: robots ``Sitemap:`` directives → sitemap.xml →
seed URLs (sitemaps.org protocol).

The reference seeds crawls from configured source URLs only; at
open-web scale the standard complement is the site's own sitemap —
robots.txt advertises it (a GLOBAL directive, outside any UA group,
RFC 9309 §2.2.4 allows unknown lines and sitemaps.org defines this
one), and the XML lists canonical page URLs with optional lastmod
hints that slot straight into the frontier and the re-crawl
scheduler.

Spark shape: everything is a narrow map. ``sitemaps_from_robots`` is a
pure-expression extraction over the robots table;
``sitemap_entries`` parses XML per row inside a pandas UDF batch (the
XML never shuffles — only the extracted (url, lastmod) rows do);
``fetch_sitemaps`` mirrors fetch_robots' distributed GET. A
``sitemapindex`` expands one level per call — the driver loops while
index rows remain (sitemaps.org caps nesting in practice at one
index level; the loop handles any depth, bounded by ``max_hops``).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOC_RE = re.compile(r"<\s*loc\s*>\s*(.*?)\s*<\s*/\s*loc\s*>", re.I | re.S)
_URL_BLOCK_RE = re.compile(r"<\s*(url|sitemap)\s*>(.*?)<\s*/\s*\1\s*>", re.I | re.S)
_LASTMOD_RE = re.compile(r"<\s*lastmod\s*>\s*(.*?)\s*<\s*/\s*lastmod\s*>", re.I | re.S)
_PRIORITY_RE = re.compile(r"<\s*priority\s*>\s*(.*?)\s*<\s*/\s*priority\s*>", re.I | re.S)
_INDEX_RE = re.compile(r"<\s*sitemapindex[\s>]", re.I)


def _parse_lastmod(s: str | None):
    """W3C datetime (the sitemaps.org lastmod format): date-only or
    full timestamp, optional timezone."""
    if not s:
        return None
    s = s.strip()
    for fmt in (
        "%Y-%m-%d",
        "%Y-%m-%dT%H:%M:%S%z",
        "%Y-%m-%dT%H:%M:%SZ",
        # fractional seconds and minute precision are valid W3C
        # datetime variants many CMSes emit — rejecting them silently
        # disabled the `since` incremental cut for those sites
        "%Y-%m-%dT%H:%M:%S.%f%z",
        "%Y-%m-%dT%H:%M:%S.%fZ",
        "%Y-%m-%dT%H:%M%z",
        "%Y-%m-%dT%H:%MZ",
    ):
        try:
            dt = datetime.strptime(s, fmt)
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            return dt.astimezone(timezone.utc)
        except ValueError:
            continue
    return None


def parse_sitemap(xml: str | None) -> list[tuple[str, object, bool, float | None]]:
    """[(loc, lastmod|None, is_index_entry, priority|None)] from one
    sitemap document.

    Regex-scoped to <url>/<sitemap> blocks (default-namespace-proof —
    real sitemaps carry the sitemaps.org xmlns, which trips strict tag
    matching) so each lastmod/priority binds to ITS loc, not a
    neighbor's. priority is the protocol's 0.0-1.0 hint (default 0.5
    per sitemaps.org; None = not stated)."""
    if not xml:
        return []
    is_index = bool(_INDEX_RE.search(xml))
    out = []
    for m in _URL_BLOCK_RE.finditer(xml):
        block = m.group(2)
        loc = _LOC_RE.search(block)
        if not loc:
            continue
        lm = _LASTMOD_RE.search(block)
        pr = _PRIORITY_RE.search(block)
        prio: float | None = None
        if pr:
            try:
                prio = min(1.0, max(0.0, float(pr.group(1))))
            except ValueError:
                prio = None
        out.append(
            (
                loc.group(1),
                _parse_lastmod(lm.group(1) if lm else None),
                is_index,
                prio,
            )
        )
    return out


def sitemaps_from_robots(robots: DataFrame) -> DataFrame:
    """robots(host, rules) → (host, sitemap_url): every ``Sitemap:``
    line (global directive — group membership is irrelevant), comments
    stripped. Pure codegen'd expressions, no UDF."""
    # \r?\n: robots.py parses rules with splitlines() (CRLF-safe);
    # splitting on bare \n here would leave a trailing \r on every
    # sitemap URL from a CRLF robots.txt
    lines = F.split(F.col("rules"), "\r?\n")
    # "sitemap:" is 8 chars; the value itself contains a colon, so
    # strip the fixed-length prefix rather than splitting on ":"
    urls = F.transform(
        F.filter(
            F.transform(lines, lambda l: F.trim(F.split(l, "#").getItem(0))),
            lambda l: F.lower(l).startswith("sitemap:"),
        ),
        lambda l: F.trim(F.substring(l, 9, 1 << 20)),
    )
    return robots.select("host", F.explode(urls).alias("sitemap_url")).filter(
        F.col("sitemap_url") != ""
    )


def sitemap_entries(xml_df: DataFrame, url_col: str = "sitemap_url", xml_col: str = "xml") -> DataFrame:
    """(sitemap_url, xml) rows → (sitemap_url, loc, lastmod, is_index):
    one Arrow-batched parse per row; only extracted rows shuffle."""

    def run(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in parts:
            src, locs, lastmods, idx, prios = [], [], [], [], []
            for u, x in zip(pdf[url_col], pdf[xml_col]):
                for loc, lm, is_idx, prio in parse_sitemap(x):
                    src.append(u)
                    locs.append(loc)
                    lastmods.append(lm)
                    idx.append(is_idx)
                    prios.append(prio)
            yield pd.DataFrame(
                {
                    "sitemap_url": src,
                    "loc": locs,
                    "lastmod": lastmods,
                    "is_index": idx,
                    "priority": pd.array(prios, dtype="float64"),
                }
            )

    return xml_df.select(
        F.col(url_col).alias(url_col), F.col(xml_col).alias(xml_col)
    ).mapInPandas(
        run,
        schema=(
            "sitemap_url string, loc string, lastmod timestamp, "
            "is_index boolean, priority double"
        ),
    )


def fetch_sitemaps(
    urls: DataFrame,
    user_agent: str = "gocrawl",
    timeout_s: float = 10.0,
    proxy_base: str | None = None,
    url_col: str = "sitemap_url",
) -> DataFrame:
    """(sitemap_url) → (sitemap_url, xml): distributed GET, one per
    distinct sitemap URL (fetch_robots' pattern); unavailable → empty
    xml (no entries, like an unavailable robots file)."""

    def run(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import urllib.request
        from urllib.parse import urlsplit

        for pdf in parts:
            xmls = []
            for u in pdf[url_col]:
                target = u
                if proxy_base is not None:
                    # .hostname (not .netloc): lowercased, port/userinfo
                    # stripped — the same proxy-path convention as
                    # fetch.py's page/robots rewrites
                    parts_ = urlsplit(u)
                    target = f"{proxy_base.rstrip('/')}/{parts_.hostname}{parts_.path}"
                text = ""
                try:
                    req = urllib.request.Request(target, headers={"User-Agent": user_agent})
                    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                        if int(resp.status) == 200:
                            text = resp.read().decode("utf-8", errors="replace")
                except Exception:
                    text = ""
                xmls.append(text)
            yield pd.DataFrame({url_col: list(pdf[url_col]), "xml": xmls})

    return urls.select(url_col).distinct().mapInPandas(
        run, schema=f"{url_col} string, xml string"
    )


def discover_seeds(
    spark: SparkSession,
    robots: DataFrame,
    fetch=fetch_sitemaps,
    max_hops: int = 3,
    since=None,
    **fetch_kwargs,
) -> DataFrame:
    """robots table → seed URLs (url, lastmod): advertise → fetch →
    parse, expanding sitemapindex hops until none remain (≤ max_hops).
    ``fetch`` is injectable so tests can resolve sitemap URLs from a
    static table instead of the network. ``since`` (timestamp) keeps
    only entries modified on/after it — the incremental re-crawl cut:
    a generation seeds from pages the site itself marked fresh
    (entries WITHOUT a lastmod always pass; absence is not staleness)."""
    pending = sitemaps_from_robots(robots).select("sitemap_url")
    seeds = None
    for _ in range(max_hops):
        if pending.limit(1).count() == 0:
            break
        # persist: the fetch lineage is non-deterministic network I/O
        # referenced by this hop's index test, the next hop, AND the
        # final seed evaluation — without the pin each reference
        # re-issues every prior hop's GETs
        entries = sitemap_entries(fetch(pending, **fetch_kwargs)).persist()
        leaf = entries.filter(~F.col("is_index")).select(
            F.col("loc").alias("url"), "lastmod", "priority"
        )
        seeds = leaf if seeds is None else seeds.unionByName(leaf)
        pending = entries.filter(F.col("is_index")).select(
            F.col("loc").alias("sitemap_url")
        )
    if seeds is None:
        return spark.createDataFrame(
            [], "url string, lastmod timestamp, priority double"
        )
    if since is not None:
        seeds = seeds.filter(
            F.col("lastmod").isNull() | (F.col("lastmod") >= F.lit(since))
        )
    # deterministic merge for URLs listed in several sitemaps: keep
    # the freshest lastmod and the highest priority (dropDuplicates
    # would keep an arbitrary partition-order row)
    return seeds.groupBy("url").agg(
        F.max("lastmod").alias("lastmod"), F.max("priority").alias("priority")
    )


def seed_priorities(seeds: DataFrame, base: int = 5) -> DataFrame:
    """(url_hash, priority) overrides from the sitemap ``priority``
    hint, for CrawlRun(rank_priority=...): the protocol's 0.5 default
    is "average", so only above-average hints boost — >= 0.9 →
    base+3, >= 0.7 → base+2, > 0.5 → base+1; unstated or ≤ 0.5 rows
    are dropped (the frontier default already is `base`). Same int
    scale as graphrank.rank_priorities, so site-declared and
    link-graph priorities compose on the same mechanism."""
    from gocrawl_spark import udfs

    pri = (
        F.when(F.col("priority") >= 0.9, base + 3)
        .when(F.col("priority") >= 0.7, base + 2)
        .when(F.col("priority") > 0.5, base + 1)
    )
    out = udfs.with_url_identity(
        seeds.filter(F.col("priority").isNotNull()).select(
            "url", pri.alias("priority")
        )
    )
    return out.filter(F.col("priority").isNotNull()).select("url_hash", "priority")


def coverage_audit(
    declared: DataFrame, crawled: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Sitemap-vs-crawl coverage audit, one row per host — the crawl
    completeness report a site-level operator reads: of the URLs a
    host DECLARES in its sitemaps, how many did the crawl actually
    fetch, and how much did the crawl fetch that the sitemaps never
    mentioned (discovery-only URLs — or crawl-trap noise).

    Output: (host, n_declared, n_crawled, n_both, n_declared_only,
    n_crawled_only, coverage_bp) where ``coverage_bp`` =
    n_both * 10000 DIV n_declared in basis points (integer
    arithmetic; 0 when the host declares nothing).

    Scale shape: both inputs dedupe to distinct URLs (map-side
    combined), meet in ONE url-keyed full-outer equi-join — the two
    biggest tables co-shuffle on the same key, broadcast never needed
    — then fold to #hosts rows in a host-keyed partial-agg groupBy.
    Host is the URL authority (``split(url,'/')[2]``), codegen'd.
    """
    d = declared.select(F.col(url_col).alias("url")).distinct().withColumn(
        "_d", F.lit(1)
    )
    c = crawled.select(F.col(url_col).alias("url")).distinct().withColumn(
        "_c", F.lit(1)
    )
    both = d.join(c, "url", "full_outer")
    in_d = F.col("_d").isNotNull()
    in_c = F.col("_c").isNotNull()
    return (
        both.withColumn("host", F.split(F.col("url"), "/").getItem(2))
        .groupBy("host")
        .agg(
            F.sum(F.when(in_d, 1).otherwise(0)).cast("long").alias("n_declared"),
            F.sum(F.when(in_c, 1).otherwise(0)).cast("long").alias("n_crawled"),
            F.sum(F.when(in_d & in_c, 1).otherwise(0)).cast("long").alias("n_both"),
            F.sum(F.when(in_d & ~in_c, 1).otherwise(0)).cast("long").alias(
                "n_declared_only"
            ),
            F.sum(F.when(in_c & ~in_d, 1).otherwise(0)).cast("long").alias(
                "n_crawled_only"
            ),
        )
        .withColumn(
            "coverage_bp",
            F.when(
                F.col("n_declared") > 0,
                F.expr("n_both * 10000 DIV n_declared"),
            ).otherwise(F.lit(0)).cast("long"),
        )
    )


__all__ = [
    "parse_sitemap", "sitemaps_from_robots", "sitemap_entries",
    "fetch_sitemaps", "discover_seeds", "seed_priorities",
    "coverage_audit", "stale_candidates",
]


US_PER_DAY = 86_400_000_000


def stale_candidates(
    crawled: DataFrame,
    declared: DataFrame,
    url_col: str = "url",
    fetched_us_col: str = "fetch_ts_us",
    lastmod_us_col: str = "lastmod_us",
    base_priority: int = 5,
    max_priority: int = 10,
) -> DataFrame:
    """Lastmod-driven conditional recrawl: URLs whose newest declared
    sitemap ``lastmod`` is strictly newer than the stored capture —
    the sitemap-side freshness layer beside the ETag validators
    (rounds.py) and the observed change-rate scheduler
    (scheduler.change_rates). Output (url, fetch_ts_us, lastmod_us,
    staleness_us, refresh_priority) where priority escalates one level
    per stale DAY from `base_priority`, clamped at `max_priority`, so
    long-stale pages jump the frontier queue (epoch-µs longs, integer
    DIV — bit-equal across engines).

    Scale shape: declared side dedupes to max(lastmod) per loc
    (map-side combined), then ONE url-keyed equi-join against the
    capture table; output is only the stale subset.
    """
    d = (
        declared.groupBy(F.col(url_col).alias("url"))
        .agg(F.max(F.col(lastmod_us_col).cast("long")).alias("lastmod_us"))
    )
    c = crawled.select(
        F.col(url_col).alias("url"),
        F.col(fetched_us_col).cast("long").alias("fetch_ts_us"),
    )
    j = c.join(d, "url").filter(F.col("lastmod_us") > F.col("fetch_ts_us"))
    stale = (F.col("lastmod_us") - F.col("fetch_ts_us")).alias("staleness_us")
    prio = F.least(
        F.lit(int(max_priority)).cast("long"),
        F.lit(int(base_priority)).cast("long")
        + F.expr(f"(lastmod_us - fetch_ts_us) DIV {US_PER_DAY}"),
    )
    return j.select(
        "url", "fetch_ts_us", "lastmod_us", stale,
        prio.alias("refresh_priority"),
    )
