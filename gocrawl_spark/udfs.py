"""Arrow-batched pandas-UDF wrappers around the extraction kernel.

Everything per-row-Python in the engine lives here, batched through
Arrow (input_hint: "no per-row Python"). Two entry points:

- :func:`resolve_links_udf` — the F2/F3/F4 link pipeline, vectorized
  over ``array<string>`` href batches (one Python call per ~10k pages).
- :func:`extract_pages` — the fused single-DOM-pass extraction
  (detect C1 → extract E1–E14 → validate V1–V7 → prepare V9 → links F1),
  mirroring ProcessHTML (reference internal/crawler/crawler.go:900-951),
  as ``mapInPandas`` so one parse serves classification, both
  extractors, and link discovery (SURVEY.md §4 "single-pass DOM reuse").

Everything else in the engine (hashing, filters, joins, windows,
aggregations) stays JVM-side in whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from gocrawl_spark import canonicalize as canon
from gocrawl_spark import validate as v
from gocrawl_spark.extract import (
    ArticleSelectors,
    PageSelectors,
    process_html,
)
from gocrawl_spark.schema import ARTICLE, EXTRACTED, PAGE

# ---------------------------------------------------------------------------
# Link canonicalization (F2 junk filter, F3 absolutize, F4 validate)
# ---------------------------------------------------------------------------


@F.pandas_udf(ArrayType(StringType()))
def resolve_links_udf(base: pd.Series, links: pd.Series) -> pd.Series:
    """hrefs → absolute candidate URLs (order-preserving, per page).

    link_handler.go:33-58: drop #/javascript:/mailto:/tel:, resolve
    against the request URL, keep only parseable results.
    """

    def one(b: str, hrefs) -> list[str]:
        if hrefs is None:
            return []
        out = []
        for h in hrefs:
            if not h or canon.is_junk_link(h):
                continue
            absu = canon.absolutize(b, h)
            if absu and canon.is_valid_url(absu):
                out.append(absu)
        return out

    return pd.Series([one(b, ls) for b, ls in zip(base, links)])


def host_col(url_col) -> "F.Column":
    """Hostname per URL (reference uses raw hostname for domain checks,
    internal/content/articles/service.go:199-205) — JVM-side via
    ``parse_url(url, 'HOST')``, lowercased to match Python's
    ``urlsplit().hostname``. Equivalence with ``canon.host_of`` over the
    crawl URL shapes is pinned by tests/test_properties.py (the last
    Python touch on the frontier identity path, removed per round-1
    review)."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.coalesce(F.lower(F.parse_url(c, F.lit("HOST"))), F.lit(""))


def parse_date_udf(col):
    """E10: the Go 20-layout parse cascade (articles/extractor.go:127-169)
    as an Arrow-batched UDF — first matching layout wins, else null."""
    from pyspark.sql.types import TimestampType

    from gocrawl_spark.extract import parse_date

    @F.pandas_udf(TimestampType())
    def _parse(s: pd.Series) -> pd.Series:
        return s.map(lambda x: parse_date(x) if x else None)

    return _parse(col)


def with_url_identity(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach url_hash (E11: hex(sha256(url)) — Spark built-in, exact
    match with the Go reference) + host + politeness domain. All
    JVM-side, whole-stage-codegen'd — no Python on the frontier
    identity path."""
    return (
        df.withColumn("url_hash", F.sha2(F.col(url_col), 256))
        .withColumn("host", host_col(url_col))
        .withColumn("domain", F.col("host"))
    )


# ---------------------------------------------------------------------------
# Fused extraction pass
# ---------------------------------------------------------------------------

_ART_FIELDS = [f.name for f in ARTICLE.fields]
_PAGE_FIELDS = [f.name for f in PAGE.fields]

# The UDF ships FLAT typed columns (a_*/p_*) over Arrow — primitive
# arrays serialize far cheaper than object-dtype dict-per-row struct
# columns — and extract_pages re-assembles the article/page structs
# JVM-side with one codegen'd projection (null struct when the row is
# the other content type, preserving the nullable-struct contract).
_FLAT_SCHEMA = (
    "url string, content_type string, links array<string>, "
    "article_valid boolean, skip_reason string, "
    + ", ".join(f"a_{f.name} {f.dataType.simpleString()}" for f in ARTICLE.fields)
    + ", "
    + ", ".join(f"p_{f.name} {f.dataType.simpleString()}" for f in PAGE.fields)
)

EXTRACT_SCHEMA = (
    "url string, content_type string, links array<string>, "
    "article_valid boolean, skip_reason string, "
    f"article struct<{', '.join(f'{f.name}: {f.dataType.simpleString()}' for f in ARTICLE.fields)}>, "
    f"page struct<{', '.join(f'{f.name}: {f.dataType.simpleString()}' for f in PAGE.fields)}>"
)


def _article_row(d: dict | None) -> dict | None:
    if d is None:
        return None
    d = dict(d)
    d["word_count"] = v.calculate_word_count(d.get("body", ""))
    d = v.prepare_for_indexing(d)  # V9 blank-out/dedupe, like gocrawl pre-index
    return d


def make_extract_fn(
    article_sel: ArticleSelectors,
    page_sel: PageSelectors,
    sel_map: dict | None = None,
    want_links: bool = True,
    repeat: int = 1,
    meta_robots: bool = False,
):
    """Returns the mapInPandas function: (url, html binary) batches →
    EXTRACT_SCHEMA batches. Selectors are captured in the closure and
    shipped once per task (broadcast-equivalent for config). sel_map
    (host → (ArticleSelectors, PageSelectors), from sources.selector_map)
    lets each source's configured selectors drive extraction (J1);
    unmatched hosts fall back to the defaults."""

    def pick(url: str) -> tuple[ArticleSelectors, PageSelectors]:
        if not sel_map:
            return article_sel, page_sel
        host = canon.host_of(url)
        hit = sel_map.get(host)
        if hit is None and host:
            # *.domain suffix match, like sources.match_source
            for d, v in sel_map.items():
                if host.endswith("." + d):
                    hit = v
                    break
        return hit if hit is not None else (article_sel, page_sel)

    a_cols = [f"a_{f}" for f in _ART_FIELDS]
    p_cols = [f"p_{f}" for f in _PAGE_FIELDS]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                k: []
                for k in (
                    ["url", "content_type", "links", "article_valid", "skip_reason"]
                    + a_cols
                    + p_cols
                )
            }
            for url, html in zip(pdf["url"], pdf["html"]):
                h = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else (html or "")
                a_sel, p_sel = pick(url)
                res = process_html(
                    h, url, a_sel, p_sel,
                    want_links=want_links, meta_robots=meta_robots,
                )
                # calibration-only (bench arithmetic-intensity sweep):
                # re-run the kernel to raise compute-per-byte without
                # changing inputs, outputs, or shuffle volume
                for _ in range(repeat - 1):
                    process_html(h, url, a_sel, p_sel, want_links=want_links)
                art, page = res["article"], res["page"]
                valid, reason = (True, "")
                if art is not None:
                    valid, reason = v.validate_article(art)
                    if meta_robots and res.get("noindex"):
                        # page-level noindex gates publication like a
                        # failed V-gate: still crawled (links/seen keep
                        # their semantics), never indexed; the directive
                        # outranks any quality verdict
                        valid, reason = False, "noindex"
                    art = _article_row(art)
                rows["url"].append(url)
                rows["content_type"].append(res["content_type"])
                rows["links"].append(res["links"])
                rows["article_valid"].append(bool(valid))
                rows["skip_reason"].append(reason)
                if art is not None:
                    for f, c in zip(_ART_FIELDS, a_cols):
                        rows[c].append(art.get(f))
                    for c in p_cols:
                        rows[c].append(None)
                else:
                    for c in a_cols:
                        rows[c].append(None)
                    for f, c in zip(_PAGE_FIELDS, p_cols):
                        rows[c].append(page.get(f) if page else None)
            yield pd.DataFrame(rows)

    return run


def extract_pages(
    fetched: DataFrame,
    article_sel: ArticleSelectors | None = None,
    page_sel: PageSelectors | None = None,
    sel_map: dict | None = None,
    want_links: bool = True,
    repeat: int = 1,
    meta_robots: bool = False,
) -> DataFrame:
    """(url, html, …) → one row per page with content_type, article/page
    structs (byte-identical text inside), validation verdict, links.
    sel_map routes each host to its source's configured selectors;
    want_links=False skips link discovery (depth-bound tiers); repeat
    is the bench-only arithmetic-intensity calibration knob."""
    article_sel = article_sel or ArticleSelectors.default()
    page_sel = page_sel or PageSelectors.default()
    fn = make_extract_fn(
        article_sel, page_sel, sel_map=sel_map, want_links=want_links,
        repeat=repeat, meta_robots=meta_robots,
    )
    flat = fetched.select("url", "html").mapInPandas(fn, schema=_FLAT_SCHEMA)
    # re-assemble the nullable structs JVM-side (one codegen projection)
    art = F.when(
        F.col("content_type") == "article",
        F.struct(*[F.col(f"a_{f}").alias(f) for f in _ART_FIELDS]),
    ).otherwise(F.lit(None).cast(ARTICLE))
    page = F.when(
        F.col("content_type") != "article",
        F.struct(*[F.col(f"p_{f}").alias(f) for f in _PAGE_FIELDS]),
    ).otherwise(F.lit(None).cast(PAGE))
    return flat.select(
        "url",
        "content_type",
        "links",
        "article_valid",
        "skip_reason",
        art.alias("article"),
        page.alias("page"),
    )


__all__ = [
    "resolve_links_udf",
    "host_col",
    "with_url_identity",
    "extract_pages",
    "make_extract_fn",
    "EXTRACT_SCHEMA",
    "EXTRACTED",
]
