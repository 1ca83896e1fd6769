"""E15: selector auto-discovery as a distributed batch job.

The reference ships an offline generator that inspects a page and
proposes CSS selectors per field with confidence scores — semantic HTML
beats meta tags beats class-name patterns
(internal/generator/discovery.go:42-810: DiscoverTitleSelectors :138-189,
DiscoverBodySelectors :192-241, author/date/image/category :244-420,
exclusion candidates :423-470).

Spark-first shape: the per-page candidate generation is one pandas-UDF
pass over a SAMPLE of the corpus (mapInPandas over (url, html)); the
corpus-wide vote is a groupBy((field, selector)) aggregation of support
(fraction of pages where the candidate matched) × confidence — the
whole job is one UDF stage and one shuffle, so it runs on 10^6 sampled
pages as easily as on ten. The output is one best selector per field,
ready to drop into a Source config (sources.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gocrawl_spark.htmlmini import find, parse

# (field, selector, confidence) candidate rules, ordered like the
# reference's strategy chains: semantic elements first, then meta,
# then class-pattern guesses (discovery.go:138-420).
CANDIDATES: list[tuple[str, str, float]] = [
    ("title", "h1", 0.9),
    ("title", "meta[property='og:title']", 0.8),
    ("title", ".headline", 0.7),
    ("title", ".title", 0.6),
    ("title", "title", 0.5),
    ("body", "article", 0.9),
    ("body", "main", 0.7),
    ("body", ".article-content", 0.65),
    ("body", ".article-body", 0.65),
    ("body", ".content", 0.6),
    ("author", "[rel='author']", 0.9),
    ("author", ".author", 0.8),
    ("author", ".byline", 0.7),
    ("author", "meta[name='author']", 0.6),
    ("published_time", "time[datetime]", 0.9),
    ("published_time", "[itemprop='datePublished']", 0.85),
    ("published_time", "meta[property='article:published_time']", 0.8),
    ("published_time", "meta[name='date']", 0.5),
    ("image", "meta[property='og:image']", 0.9),
    ("image", "article img", 0.6),
    ("category", ".category", 0.8),
    ("category", ".breadcrumbs", 0.6),
    ("intro", "p.lead", 0.8),
    ("intro", ".intro", 0.7),
    ("exclude", "script", 0.9),
    ("exclude", "style", 0.9),
    ("exclude", "nav", 0.8),
    ("exclude", ".sidebar", 0.7),
    ("exclude", ".ad", 0.7),
    ("exclude", "footer", 0.6),
]

def _page_candidates(html: str) -> list[tuple[str, str, float]]:
    try:
        root = parse(html)
    except Exception:
        return []
    out = []
    for fld, sel, conf in CANDIDATES:
        try:
            if find(root, sel):
                out.append((fld, sel, conf))
        except Exception:
            continue
    return out


def discover_selectors(
    corpus: DataFrame, sample: int | None = 1000, min_support: float = 0.2
) -> DataFrame:
    """(field, selector, support, confidence, score) over a corpus
    sample, one pandas-UDF pass + one aggregation. score = support ×
    confidence; downstream picks the max per field.

    ``sample=None`` scores the whole corpus (pass a pre-filtered
    deterministic slice for reproducible support fractions). With a
    ``limit`` sample the rows are materialized ONCE (persist) so the
    support denominator and the candidate scan see the same rows —
    ``limit`` without ordering is not otherwise guaranteed to pick the
    same rows across the two jobs."""
    schema = "field string, selector string, confidence double"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"field": [], "selector": [], "confidence": []}
            for html in pdf["html"]:
                h = (
                    html.decode("utf-8", errors="replace")
                    if isinstance(html, (bytes, bytearray))
                    else (html or "")
                )
                for fld, sel, conf in _page_candidates(h):
                    rows["field"].append(fld)
                    rows["selector"].append(sel)
                    rows["confidence"].append(conf)
            yield pd.DataFrame(rows)

    sampled = corpus.select("html")
    if sample is not None:
        sampled = sampled.limit(sample).persist()
    n = sampled.count()
    hits = sampled.mapInPandas(gen, schema=schema)
    return (
        hits.groupBy("field", "selector", "confidence")
        .agg((F.count("*") / F.lit(float(n or 1))).alias("support"))
        .filter(F.col("support") >= min_support)
        .withColumn("score", F.col("support") * F.col("confidence"))
    )


def best_selectors(corpus: DataFrame, sample: int = 1000) -> dict:
    """Winner per field (max score, selector as tie-break for
    determinism); exclude keeps every qualifying candidate, like the
    reference's exclusion list (discovery.go:423-470)."""
    scored = discover_selectors(corpus, sample=sample).collect()
    best: dict[str, tuple[float, str]] = {}
    excludes: list[tuple[float, str]] = []
    for r in scored:
        if r.field == "exclude":
            excludes.append((r.score, r.selector))
        else:
            cur = best.get(r.field)
            cand = (r.score, r.selector)
            if cur is None or (cand[0], cur[1]) > (cur[0], cand[1]):
                best[r.field] = cand
    out = {f: s for f, (sc, s) in best.items()}
    out["exclude"] = [s for _, s in sorted(excludes, key=lambda t: (-t[0], t[1]))]
    return out
