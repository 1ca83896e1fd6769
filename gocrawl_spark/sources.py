"""Source configs (S4/J1): load, validate, match URLs to sources.

Mirrors the reference's source model (internal/config/types/source.go:8-33,
selectors internal/config/types/selectors.go, rules
internal/config/types/rules.go:6-38) and the URL→source matching chain of
internal/content/articles/service.go:194-232 / page/service.go:152-192:
exact hostname, allowed-domain list, ``*.host`` suffix — all
case-insensitive (internal/sources/sources.go:443-511).

The reference loads sources from a REST API (sources.go:252-281) with a
YAML loader for tests; here the loader handles both — YAML/JSON files
and an http(s) sources-API endpoint (same response shape). Sources
are driver-side config: small enough to broadcast, either as a python
closure captured by the extraction UDF (per-host selector map) or as a
broadcast DataFrame for the politeness policy join.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field, fields

from gocrawl_spark.extract import ArticleSelectors, PageSelectors

_DUR_RE = re.compile(r"(\d+(?:\.\d+)?)(ms|s|m|h)")
_DUR_UNIT_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000}


def parse_duration_ms(s: str | int | float | None, default_ms: int = 2000) -> int:
    """Go duration strings ('2s', '500ms', '1m30s') → milliseconds
    (source rate_limit, internal/sources/sources.go:330-345)."""
    if s is None or s == "":
        return default_ms
    if isinstance(s, (int, float)):
        return int(s)
    total = 0.0
    pos = 0
    for m in _DUR_RE.finditer(s):
        if m.start() != pos:
            raise ValueError(f"bad duration: {s!r}")
        total += float(m.group(1)) * _DUR_UNIT_MS[m.group(2)]
        pos = m.end()
    if pos != len(s):
        raise ValueError(f"bad duration: {s!r}")
    return int(total)


@dataclass
class Rule:
    """rules.go:6-13; actions allow|disallow (constants.go:267-273)."""

    pattern: str
    action: str = "allow"
    priority: int = 5

    def validate(self) -> None:  # rules.go:19-38
        if not self.pattern:
            raise ValueError("rule pattern must not be empty")
        if self.action not in ("allow", "disallow"):
            raise ValueError(f"rule action must be allow|disallow, got {self.action!r}")
        re.compile(self.pattern)


@dataclass
class Source:
    """source.go:8-33 (durations pre-parsed to ms)."""

    name: str
    url: str
    allowed_domains: list[str] = field(default_factory=list)
    start_urls: list[str] = field(default_factory=list)
    rate_limit_ms: int = 2000  # DefaultRateLimit 2s (constants.go:70)
    max_depth: int = 3  # DefaultMaxDepth (constants.go:73)
    parallelism: int = 2  # DefaultParallelism (constants.go:76)
    index: str = ""
    article_index: str = "articles"
    page_index: str = "pages"
    article_selectors: ArticleSelectors = field(default_factory=ArticleSelectors.default)
    page_selectors: PageSelectors = field(default_factory=PageSelectors.default)
    rules: list[Rule] = field(default_factory=list)

    @property
    def host(self) -> str:
        m = re.match(r"^[a-z][a-z0-9+.-]*://([^/:]+)", self.url, re.I)
        return (m.group(1) if m else self.url).lower()

    def validate(self) -> None:  # sources.go:445-511 (ValidateSource)
        if not self.name:
            raise ValueError("source name must not be empty")
        if not self.url:
            raise ValueError(f"source {self.name}: url must not be empty")
        for r in self.rules:
            r.validate()


def _selectors_from_dict(d: dict | None, cls, defaults):
    if not d:
        return defaults
    known = {f.name for f in fields(cls)}
    kwargs = {k: v for k, v in d.items() if k in known}
    return cls(**{**{f.name: getattr(defaults, f.name) for f in fields(cls)}, **kwargs})


def source_from_dict(d: dict) -> Source:
    sel = d.get("selectors") or {}
    src = Source(
        name=d.get("name", ""),
        url=d.get("url", ""),
        allowed_domains=list(d.get("allowed_domains") or []),
        start_urls=list(d.get("start_urls") or []),
        rate_limit_ms=parse_duration_ms(d.get("rate_limit")),
        max_depth=int(d.get("max_depth") or 3),
        parallelism=int(d.get("parallelism") or 2),
        index=d.get("index", ""),
        article_index=d.get("article_index", "articles"),
        page_index=d.get("page_index", "pages"),
        article_selectors=_selectors_from_dict(
            sel.get("article"), ArticleSelectors, ArticleSelectors.default()
        ),
        page_selectors=_selectors_from_dict(
            sel.get("page"), PageSelectors, PageSelectors.default()
        ),
        rules=[Rule(**r) for r in (d.get("rules") or [])],
    )
    # reference behavior: allowed_domains defaults to the source URL's
    # hostname (sources.go:360-369)
    if not src.allowed_domains and src.host:
        src.allowed_domains = [src.host]
    src.validate()
    return src


def load_sources(path: str, timeout_s: float = 30.0) -> list[Source]:
    """YAML (`sources:` list or bare list), JSON file, or an
    ``http(s)://`` sources-API endpoint → [Source].

    The REST branch is the reference's PRIMARY loader (apiclient
    GET base_url → ``{"sources": [...], "count": N}``,
    internal/sources/apiclient/client.go:68-80 + types.go:83-86,
    wired API-only in sources.go:252-281); the file branch mirrors its
    YAML test loader. Both shapes land in the same
    :func:`source_from_dict` normalization."""
    if path.startswith(("http://", "https://")):
        import urllib.request

        req = urllib.request.Request(path, headers={"Accept": "application/json"})
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            data = json.loads(resp.read().decode("utf-8"))
    else:
        with open(path) as f:
            text = f.read()
        if path.endswith(".json"):
            data = json.loads(text)
        else:
            import yaml

            data = yaml.safe_load(text)
    if isinstance(data, dict):
        data = data.get("sources", [])
    return [source_from_dict(d) for d in data]


def match_source(sources: list[Source], host: str) -> Source | None:
    """J1: URL host → source. Exact hostname, then allowed-domains,
    then ``*.domain`` suffix; case-insensitive (service.go:194-232)."""
    h = (host or "").lower()
    for s in sources:
        if s.host == h:
            return s
    for s in sources:
        for d in s.allowed_domains:
            d = d.lower()
            if h == d or (d.startswith("*.") and h.endswith(d[1:])) or h.endswith("." + d):
                return s
    return None


def selector_map(sources: list[Source]) -> dict[str, tuple[ArticleSelectors, PageSelectors]]:
    """host → (article, page) selectors, for the fused extraction UDF."""
    out: dict[str, tuple[ArticleSelectors, PageSelectors]] = {}
    for s in sources:
        for d in {s.host, *[x.lower().lstrip("*.") for x in s.allowed_domains]}:
            if d:
                out[d] = (s.article_selectors, s.page_selectors)
    return out


def host_policy_df(spark, sources: list[Source]):
    """Per-source politeness contract as the CrawlRun host_policy table
    (domain, delay_ms, parallelism) — the LimitRule analogue (P1)."""
    rows = [
        (d, s.rate_limit_ms, s.parallelism)
        for s in sources
        for d in {s.host, *[x.lower().lstrip("*.") for x in s.allowed_domains]}
        if d
    ]
    return spark.createDataFrame(rows, "domain string, delay_ms long, parallelism int")


def combined_rules(sources: list[Source]) -> list[dict]:
    """Flatten source rules for frontier.apply_rules (F8)."""
    return [
        {"pattern": r.pattern, "action": r.action, "priority": r.priority}
        for s in sources
        for r in s.rules
    ]
