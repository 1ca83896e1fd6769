"""Spark StructTypes for every table in the engine (SURVEY.md §1.1/§1.3).

The corpus table shape is mandated by BASELINE.json:input_hint:
``pages_corpus(url string, warc_ts timestamp, html binary, text string,
lang string)``.

Crawl-state tables replace gocrawl's in-memory structures
(reference: internal/crawler/crawler.go:197-228, state.go:13-24):
frontier ← colly's async queue, seen ← the visited set, host_state ←
the per-domain LimitRule, round_metrics ← state/metrics counters.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------- corpus
PAGES_CORPUS = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

# --------------------------------------------------------------- frontier
# One row per pending URL. discovery_seq gives the deterministic BFS
# tie-break (SURVEY.md §7.3 item 3): (priority desc, depth, discovery_seq,
# url_hash) replaces colly's timing-dependent async order.
FRONTIER = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_hash", StringType(), False),  # hex(sha256(url)), E11
        StructField("host", StringType()),
        StructField("domain", StringType()),  # registrable domain (politeness shard)
        StructField("depth", IntegerType(), False),
        StructField("priority", IntegerType(), False),
        StructField("discovered_round", IntegerType(), False),
        StructField("discovery_seq", LongType(), False),
        StructField("attempt", IntegerType(), False),
    ]
)

# ------------------------------------------------------------------- seen
SEEN = StructType(
    [
        StructField("url_hash", StringType(), False),
        StructField("url", StringType()),
        StructField("fetched_round", IntegerType(), False),
    ]
)

# ------------------------------------------------------------- host_state
# Batch analogue of colly.LimitRule (crawler.go:223-228): per-host token
# bucket; budget(host, round) = floor(round_wall_s / delay_s).
HOST_STATE = StructType(
    [
        StructField("domain", StringType(), False),
        StructField("delay_ms", LongType(), False),
        StructField("parallelism", IntegerType(), False),
        StructField("fetched_total", LongType(), False),
        StructField("last_round", IntegerType(), False),
    ]
)

# --------------------------------------------------------------- articles
# domain.Article (internal/domain/article.go:12-62) as a Spark row.
ARTICLE = StructType(
    [
        StructField("id", StringType(), False),
        StructField("title", StringType()),
        StructField("body", StringType()),
        StructField("author", StringType()),
        StructField("byline_name", StringType()),
        StructField("published_date", TimestampType()),
        StructField("source", StringType()),  # the page URL, like gocrawl
        StructField("tags", ArrayType(StringType())),
        StructField("intro", StringType()),
        StructField("description", StringType()),
        StructField("og_title", StringType()),
        StructField("og_description", StringType()),
        StructField("og_image", StringType()),
        StructField("og_url", StringType()),
        StructField("canonical_url", StringType()),
        StructField("word_count", IntegerType()),
        StructField("category", StringType()),
        StructField("section", StringType()),
        StructField("keywords", ArrayType(StringType())),
    ]
)

# ------------------------------------------------------------------ pages
# domain.Page (internal/domain/page.go:11-41).
PAGE = StructType(
    [
        StructField("id", StringType(), False),
        StructField("url", StringType()),
        StructField("title", StringType()),
        StructField("content", StringType()),
        StructField("description", StringType()),
        StructField("keywords", ArrayType(StringType())),
        StructField("og_title", StringType()),
        StructField("og_description", StringType()),
        StructField("og_image", StringType()),
        StructField("og_url", StringType()),
        StructField("canonical_url", StringType()),
    ]
)

# ---------------------------------------------------------- round metrics
# CrawlerState + metrics counters (state.go:160-173, metrics.go:10-31)
# as one row per (round, metric).
ROUND_METRICS = StructType(
    [
        StructField("round", IntegerType(), False),
        StructField("metric", StringType(), False),
        StructField("value", LongType(), False),
    ]
)

# ------------------------------------------------- fused extraction output
# Single-DOM-pass output (SURVEY.md §4 "single-pass DOM reuse"):
# detect + extract(article|page) + links in ONE pandas-UDF pass.
EXTRACTED = StructType(
    [
        StructField("content_type", StringType()),
        StructField("article", ARTICLE),
        StructField("page", PAGE),
        StructField("links", ArrayType(StringType())),
    ]
)
