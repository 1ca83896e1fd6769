"""Selector validation + source-YAML generation (cmd/sources parity).

The reference ships two operator tools next to the crawler:

- ``sources validate`` — test a source's CSS selectors against sample
  article pages and report per-field hit rates
  (cmd/sources/validate.go:27-… → internal/generator/validate.go:44-110).
- ``sources generate`` — analyze a site and emit a starter source YAML
  with discovered selectors + confidence comments
  (cmd/sources/generate.go:26-88 → internal/generator/yaml.go:12-131).

Spark-first shape: the reference fetches pages one-by-one over HTTP;
here the sample pages come from the corpus table (the engine's S2
corpus-join fetch mode), and per-page selector evaluation runs as ONE
Arrow-batched ``mapInPandas`` pass emitting (url, field, value) rows —
the per-field rollup (hit counts, sample values, failed URLs) is a
single aggregation, so validating 5 pages and validating 10^6 pages is
the same plan. Only the per-field aggregate crosses to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gocrawl_spark.extract import ArticleSelectors
from gocrawl_spark.htmlmini import Selection, parse

# validate.go fieldOrder (cmd/sources/validate.go:155); this engine's
# ArticleSelectors carries the reference's og_image selector where the
# generator type has Image, and has no listing-page Link selector
# (selectors.go:33-90), so the map is 8 fields wide.
FIELD_ORDER = [
    "title", "body", "author", "byline",
    "published_time", "image", "category", "section",
]
CRITICAL_FIELDS = ("title", "body")  # validate.go:64

_ATTR_WHITELIST = ("datetime", "src", "href")  # validate.go:249-251


def field_map(selectors: ArticleSelectors) -> dict[str, str]:
    """field → selector (generator/validate.go:73-86 buildFieldMap)."""
    return {
        "title": selectors.title,
        "body": selectors.body,
        "author": selectors.author,
        "byline": selectors.byline,
        "published_time": selectors.published_time,
        "image": selectors.og_image,
        "category": selectors.category,
        "section": selectors.section,
    }


def extract_value(doc: Selection, selector: str) -> str:
    """First-match extraction, goquery-equivalent
    (generator/validate.go:203-283 extractValueFromDocument):
    ``meta[...]`` → content attribute; ``x[attr]`` → whitelisted
    attribute (datetime/src/href); else comma-chain of selectors,
    first non-empty trimmed text wins."""
    if not selector:
        return ""
    if selector.startswith("meta["):
        sel = doc.find(selector).first()
        return (sel.attr("content") or "").strip() if sel.length else ""
    if "[" in selector:
        elem_sel, _, attr_part = selector.partition("[")
        attr = attr_part.rstrip("]").split("=")[0].strip("'\"")
        if attr not in _ATTR_WHITELIST:
            return ""
        sel = doc.find(selector).first()
        return (sel.attr(attr) or "").strip() if sel.length else ""
    for part in selector.split(","):
        part = part.strip()
        if not part:
            continue
        sel = doc.find(part).first()
        if sel.length:
            text = sel.text().strip()
            if text:
                return text
    return ""


def validate_selectors(
    pages: DataFrame,
    selectors: ArticleSelectors,
    max_samples: int = 5,
) -> dict:
    """Validate ``selectors`` against sample article pages.

    ``pages``: (url, html) rows; the deterministic sample is the first
    ``max_samples`` by url order (the reference truncates its URL list
    the same way, validate.go:54-56). Returns the ValidationResult
    shape (validate.go:17-41): ``{"total_articles",
    "successful_articles", "field_results": {field: {"success_count",
    "total_count", "success_rate", "failed_urls", "sample_values"}}}``.

    Per-page evaluation is one mapInPandas pass; the rollup collects
    one row per field plus one per-URL critical bit.
    """
    fields = field_map(selectors)
    active = {f: s for f, s in fields.items() if s}
    sample = pages.select("url", "html").orderBy("url").limit(int(max_samples))

    schema = "url string, field string, value string"

    def evaluate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"url": [], "field": [], "value": []}
            for url, html in zip(pdf["url"], pdf["html"]):
                h = (
                    html.decode("utf-8", errors="replace")
                    if isinstance(html, (bytes, bytearray))
                    else (html or "")
                )
                try:
                    doc = Selection.root(parse(h))
                except Exception:
                    doc = None
                for fld, sel in active.items():
                    value = extract_value(doc, sel) if doc is not None else ""
                    rows["url"].append(url)
                    rows["field"].append(fld)
                    rows["value"].append(value)
            yield pd.DataFrame(rows)

    hits = sample.mapInPandas(evaluate, schema=schema).persist()
    per_field = (
        hits.groupBy("field")
        .agg(
            F.count(F.when(F.col("value") != "", 1)).alias("success_count"),
            F.count("*").alias("total_count"),
            # ordered by url for deterministic samples / failure lists
            F.slice(
                F.transform(
                    F.filter(
                        F.array_sort(F.collect_list(F.struct("url", "value"))),
                        lambda x: x["value"] != "",
                    ),
                    lambda x: x["value"],
                ),
                1, 3,
            ).alias("sample_values"),  # max 3 samples (validate.go:168)
            F.transform(
                F.filter(
                    F.array_sort(F.collect_list(F.struct("url", "value"))),
                    lambda x: x["value"] == "",
                ),
                lambda x: x["url"],
            ).alias("failed_urls"),
        )
        .collect()
    )
    critical = (
        hits.filter(F.col("field").isin(list(CRITICAL_FIELDS)))
        .groupBy("url")
        .agg(F.min(F.col("value") != "").alias("all_critical"))
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("all_critical"), 1)).alias("good"),
        )
        .collect()[0]
    )
    hits.unpersist()

    field_results = {}
    for r in per_field:
        total = int(r["total_count"])
        field_results[r["field"]] = {
            "success_count": int(r["success_count"]),
            "total_count": total,
            "success_rate": 100.0 * int(r["success_count"]) / max(total, 1),
            "sample_values": [
                v if len(v) <= 100 else v[:100] + "..."  # validate.go:173
                for v in r["sample_values"]
            ],
            "failed_urls": list(r["failed_urls"]),
        }
    return {
        "total_articles": int(critical["n"]),
        "successful_articles": int(critical["good"]),
        "field_results": field_results,
    }


def _status_emoji(rate: float) -> str:
    """validate.go:186-197 (≥90 ✅, ≥70 ⚠️, else ❌)."""
    if rate >= 90.0:
        return "✅"
    if rate >= 70.0:
        return "⚠️"
    return "❌"


def validation_report(result: dict) -> str:
    """The reference's printed report (cmd/sources/validate.go:136-247):
    header with critical-field summary, one block per field in
    FIELD_ORDER (rate, ≤2 sample values at ≤60 chars, ≤3 failed URLs),
    and the closing summary line."""
    lines = ["📊 Validation Results:", ""]
    total = result["total_articles"]
    good = result["successful_articles"]
    pct = 100.0 * good / max(total, 1)
    lines.append(f"Total articles tested: {total}")
    lines.append(f"Articles with all critical fields: {good} ({pct:.0f}%)")
    lines.append("")
    for fld in FIELD_ORDER:
        fr = result["field_results"].get(fld)
        if not fr or fr["total_count"] == 0:
            continue
        lines.append(
            f"{_status_emoji(fr['success_rate'])} {fld}: "
            f"{fr['success_rate']:.0f}% "
            f"({fr['success_count']}/{fr['total_count']})"
        )
        for i, sample in enumerate(fr["sample_values"][:2]):
            show = sample if len(sample) <= 60 else sample[:60] + "..."
            lines.append(f'   Sample {i + 1}: "{show}"')
        for url in fr["failed_urls"][:3]:
            lines.append(f"   Failed: {url}")
        lines.append("")
    lines.append("---")
    lines.append("")
    if good == total:
        lines.append("✅ All articles have all critical fields!")
    else:
        lines.append("⚠️  Some articles are missing critical fields.")
        lines.append(
            "   Review failed URLs above and refine selectors if needed."
        )
    return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------------
# sources generate (yaml.go)
# ---------------------------------------------------------------------------

def generate_source_name(hostname: str) -> str:
    """yaml.go:120-156: strip www, title-case the registrable label;
    common TLDs (com/org/net) drop, others append uppercased."""
    hostname = hostname.removeprefix("www.").removeprefix("www")
    parts = hostname.split(".")
    main = parts[-2] if len(parts) >= 2 else parts[0]
    if not main:
        return hostname
    main = main[:1].upper() + main[1:].lower()
    tld = parts[-1] if len(parts) > 1 else ""
    if tld in ("com", "org", "net"):
        return main
    return f"{main} {tld.upper()}" if tld else main


def generate_index_name(hostname: str, suffix: str) -> str:
    """yaml.go:158-175: www-stripped snake_case hostname + suffix."""
    hostname = hostname.removeprefix("www.").removeprefix("www")
    hostname = hostname.replace(".", "_").replace("-", "_").lower()
    return hostname.strip("_") + "_" + suffix


def escape_yaml_string(s: str) -> str:
    """yaml.go:178-…: backslash first, then newlines and quotes."""
    return (
        s.replace("\\", "\\\\")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace('"', '\\"')
    )


# discovery-field → YAML-field order, yaml.go:62-69 (link omitted: this
# engine's discovery has no listing-link strategy chain)
_YAML_FIELDS = [
    "title", "body", "author", "published_time", "image", "category",
]


def generate_source_yaml(
    source_url: str,
    candidates: dict[str, tuple[str, float, str]],
    exclusions: list[str] | None = None,
) -> str:
    """Starter source YAML in the reference's exact layout
    (yaml.go:12-117): header with derived name/index names, fixed
    rate_limit/max_depth/schedule, one selector line per discovered
    field with a confidence comment and optional sample comment, then
    the exclusion block.

    ``candidates``: field → (selector, confidence, sample_text)."""
    import re

    m = re.match(r"^[a-z][a-z0-9+.-]*://([^/:]+)", source_url, re.I)
    hostname = (m.group(1) if m else source_url).lower()
    out = [
        f'  - name: "{generate_source_name(hostname)}"',
        f'    url: "{source_url}"',
        f'    article_index: "{generate_index_name(hostname, "articles")}"',
        f'    page_index: "{generate_index_name(hostname, "pages")}"',
        "    rate_limit: 1s",
        "    max_depth: 2",
        "    time:",
        '      - "11:45"',
        '      - "23:45"',
        "    selectors:",
        "      article:",
    ]
    for fld in _YAML_FIELDS:
        got = candidates.get(fld)
        if not got or not got[0]:
            continue
        selector, confidence, sample = got
        out.append(
            f'        {fld}: "{selector}"  # Confidence: {confidence:.2f}'
        )
        if sample:
            out.append(f'        # Sample: "{escape_yaml_string(sample)}"')
    if exclusions:
        out.append("        exclude: [")
        out.extend(f'          "{e}",' for e in exclusions)
        out.append("        ]")
    return "\n".join(out) + "\n"


def discover_candidates(
    corpus: DataFrame, sample: int = 500
) -> tuple[dict[str, tuple[str, float, str]], list[str]]:
    """Winner per field from the distributed selector-discovery job
    (discovery.discover_selectors, E15) plus a sample value extracted
    from the first page — the inputs ``generate_source_yaml`` wants.
    Returns (candidates, exclusions)."""
    from gocrawl_spark import discovery

    scored = discovery.discover_selectors(corpus, sample=sample).collect()
    best: dict[str, tuple[float, str, float]] = {}
    excludes: list[tuple[float, str]] = []
    for r in scored:
        if r.field == "exclude":
            excludes.append((r.score, r.selector))
        else:
            cur = best.get(r.field)
            if cur is None or (r.score, cur[1]) > (cur[0], r.selector):
                best[r.field] = (r.score, r.selector, r.confidence)
    first = corpus.select("url", "html").orderBy("url").limit(1).collect()
    doc = None
    if first:
        h = first[0]["html"]
        h = (
            h.decode("utf-8", errors="replace")
            if isinstance(h, (bytes, bytearray))
            else (h or "")
        )
        try:
            doc = Selection.root(parse(h))
        except Exception:
            doc = None
    candidates = {}
    for fld, (_score, selector, confidence) in best.items():
        sample_text = ""
        if doc is not None:
            sample_text = extract_value(doc, selector)
            if len(sample_text) > 100:
                sample_text = sample_text[:100] + "..."
        candidates[fld] = (selector, confidence, sample_text)
    exclusions = [s for _, s in sorted(excludes, key=lambda t: (-t[0], t[1]))]
    return candidates, exclusions


__all__ = [
    "FIELD_ORDER",
    "CRITICAL_FIELDS",
    "field_map",
    "extract_value",
    "validate_selectors",
    "validation_report",
    "generate_source_name",
    "generate_index_name",
    "escape_yaml_string",
    "generate_source_yaml",
    "discover_candidates",
]
