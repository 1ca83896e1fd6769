"""robots.txt allow/deny, evaluated vectorized over a robots(host, rules) table.

The reference carries a ``respect_robots_txt`` config flag (default true,
internal/config/crawler/config.go:42-43,101) but its collectors pass
``colly.IgnoreRobotsTxt()`` (internal/crawler/crawler.go:201,
internal/crawler/constructor.go:83), so robots is effectively OFF at
runtime. We implement the configured behavior behind the same flag —
``CrawlConfig.respect_robots`` — defaulting to off for reference
equivalence (SURVEY.md §7.3.7).

Matching follows RFC 9309 (what colly's robotstxt dependency implements):

- groups keyed by ``User-agent``; a crawler picks the group whose agent
  token is the longest prefix of its UA product token, else the ``*``
  group; multiple UA lines may share one rule block;
- ``Allow``/``Disallow`` values are path patterns with ``*`` (any chars)
  and ``$`` (end anchor); empty Disallow ⇒ allow everything;
- the rule with the longest pattern (octets) wins; on a tie Allow wins;
- no applicable group or no matching rule ⇒ allowed.

Evaluation is a pandas UDF over ``(url, rules)`` pairs produced by a
broadcast join of candidates against the small robots table — hosts
without a robots row are allowed (fetch-404 semantics). Parsed rule
lists are memoized per distinct rules text within the Python worker, so
the per-batch cost is one parse per host, not per URL.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

DEFAULT_UA = "gocrawl"

# ------------------------------------------------------------------ parse


def _clean_line(line: str) -> str:
    # comments start at '#'; values are whitespace-trimmed (RFC 9309 §2.2)
    return line.split("#", 1)[0].strip()


def parse_robots(text: str, ua: str = DEFAULT_UA) -> list[tuple[bool, str]]:
    """robots.txt → ordered [(allow, pattern)] for the best-matching
    user-agent.

    Group selection: longest ``User-agent`` token that is a
    case-insensitive prefix of *ua* wins; ``*`` matches any UA with
    specificity 0. Rules from ALL groups at the winning specificity
    are COMBINED (RFC 9309 §2.2.1 — real robots.txt files often carry
    several separate ``User-agent: *`` groups, and each one's rules
    apply). Returns [] when no group applies.
    """
    ua_l = ua.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    in_rules = False
    for raw in (text or "").splitlines():
        line = _clean_line(raw)
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:
                groups.append((agents, rules))
                agents, rules, in_rules = [], [], False
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_rules = True
            # empty Disallow = allow all (no-op rule kept out of the list);
            # empty Allow is meaningless — both drop here
            if val:
                rules.append((key == "allow", val))
        # sitemap/crawl-delay etc. ignored (reference ignores them too)
    if agents or rules:
        groups.append((agents, rules))

    def group_spec(agents: list[str]) -> int:
        spec = -1
        for a in agents:
            if a == "*":
                spec = max(spec, 0)
            elif ua_l.startswith(a):
                spec = max(spec, len(a))
        return spec

    specs = [group_spec(agents) for agents, _rules in groups]
    best_spec = max(specs, default=-1)
    if best_spec < 0:
        return []
    merged: list[tuple[bool, str]] = []
    for spec, (_agents, rules) in zip(specs, groups):
        if spec == best_spec:
            merged.extend(rules)
    return merged


@lru_cache(maxsize=4096)
def _pattern_re(pattern: str) -> re.Pattern:
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(part) for part in body.split("*"))
    return re.compile("^" + rx + ("$" if anchored else ""))


def rule_matches(pattern: str, path: str) -> bool:
    return _pattern_re(pattern).match(path) is not None


def robots_allowed(path: str, rules: list[tuple[bool, str]]) -> bool:
    """Longest-pattern match wins; Allow wins ties; no match ⇒ allowed."""
    best_len = -1
    best_allow = True
    for allow, pattern in rules:
        if rule_matches(pattern, path):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and allow and not best_allow):
                best_len, best_allow = plen, allow
    return best_allow


# ------------------------------------------------------------ vectorized


@lru_cache(maxsize=1024)
def _parsed(rules_text: str, ua: str) -> tuple[tuple[bool, str], ...]:
    return tuple(parse_robots(rules_text, ua))


def _path_query(url: str) -> str:
    # robots patterns match path + optional query (RFC 9309 §2.2.2)
    m = re.match(r"^[a-z][a-z0-9+.-]*://[^/]*", url or "")
    rest = url[m.end() :] if m else url or ""
    return rest or "/"


def allowed_udf(ua: str = DEFAULT_UA):
    """pandas UDF (url, rules) → bool; null rules ⇒ allowed."""

    @F.pandas_udf(BooleanType())
    def _allowed(url: pd.Series, rules: pd.Series) -> pd.Series:
        out = []
        for u, r in zip(url, rules):
            if r is None or not r:
                out.append(True)
            else:
                out.append(robots_allowed(_path_query(u), list(_parsed(r, ua))))
        return pd.Series(out)

    return _allowed


def gate(
    candidates: DataFrame,
    robots: DataFrame,
    ua: str = DEFAULT_UA,
    broadcast: bool | None = None,
) -> DataFrame:
    """Drop candidate URLs a robots(host, rules) table disallows.

    Candidates must carry a ``host`` column (they do — F5's
    allowed-domains filter needs it too). ``broadcast=None`` (default)
    lets Catalyst/AQE pick the join strategy from size estimates: a
    site-scoped robots table (one row per host) broadcasts, while an
    open-web table — millions of hosts × KBs of rules, the same
    whole-state-broadcast trap as an unsharded Bloom filter — falls
    back to a host-keyed shuffle join so no executor ever holds the
    full rules corpus. Pass True/False to force either shape.
    """
    robots_small = robots.select(
        F.col("host").alias("_robots_host"), F.col("rules").alias("_robots_rules")
    )
    if broadcast:
        right = F.broadcast(robots_small)
    elif broadcast is False:
        right = robots_small.hint("shuffle_hash")  # forced open-web shape
    else:
        right = robots_small  # Catalyst/AQE decides from size estimates
    joined = candidates.join(
        right, candidates["host"] == robots_small["_robots_host"], "left"
    )
    kept = joined.filter(allowed_udf(ua)(F.col("url"), F.col("_robots_rules")))
    return kept.drop("_robots_host", "_robots_rules")


def drift_audit(
    fetched: DataFrame,
    robots: DataFrame,
    ua: str = DEFAULT_UA,
    host_col: str = "host",
    url_col: str = "url",
    broadcast: bool | None = None,
) -> DataFrame:
    """Retro-compliance audit: which ALREADY-FETCHED URLs does the
    CURRENT robots table disallow? robots.txt files change between
    crawls; RFC 9309 operators are expected to honor the new rules
    for stored content too (purge / noindex on new Disallow), and
    search engines run exactly this re-check. The reference
    re-fetches robots per crawl but never re-audits what it already
    indexed (internal/crawler applies robots at fetch time only);
    this is the batch re-check that feeds a purge list.

    Per host: (host, n_fetched, n_disallowed, disallowed_share) with
    the share rounded to 6 dp (integer ratio); hosts with no robots
    row audit as fully allowed (RFC 9309 §2.3.1: no file = no
    restrictions). The verdict is the SAME parser + longest-match
    evaluator the fetch-time gate uses (`allowed_udf`), so gate and
    audit can never disagree on a rule.

    Scale shape (10^10 fetched rows): identical join shape to `gate`
    — the robots side broadcasts when site-scoped, falls back to a
    host-keyed shuffle join for open-web rule corpora (AQE decides
    unless forced) — then ONE host-keyed map-side-combined rollup to
    ≈#hosts rows. The fetch log is scanned once.
    """
    robots_small = robots.select(
        F.col("host").alias("_robots_host"), F.col("rules").alias("_robots_rules")
    )
    if broadcast:
        right = F.broadcast(robots_small)
    elif broadcast is False:
        right = robots_small.hint("shuffle_hash")
    else:
        right = robots_small
    joined = fetched.select(
        F.col(host_col).alias("host"), F.col(url_col).alias("url")
    ).join(right, F.col("host") == F.col("_robots_host"), "left")
    ok = allowed_udf(ua)(F.col("url"), F.col("_robots_rules"))
    agg = joined.groupBy("host").agg(
        F.count("*").alias("n_fetched"),
        F.sum(F.when(ok, 0).otherwise(1)).cast("long").alias("n_disallowed"),
    )
    return agg.select(
        "host",
        "n_fetched",
        "n_disallowed",
        F.round(
            F.col("n_disallowed") / F.col("n_fetched").cast("double"), 6
        ).alias("disallowed_share"),
    )


# ----------------------------------------------------------- crawl-delay


def parse_crawl_delay(text: str, ua: str = DEFAULT_UA) -> float | None:
    """Crawl-delay seconds from the best-matching UA group, or None.

    The de-facto directive (Bing/Yandex honor it; RFC 9309 leaves it
    out, and the reference — like colly — ignores it, which is why the
    engine's use of it is OPT-IN via crawl_delay_policy). Same
    group-selection semantics as parse_robots: longest UA prefix wins,
    ``*`` at specificity 0; last directive inside the group wins."""
    ua_l = ua.lower()
    groups: list[tuple[list[str], float | None]] = []
    agents: list[str] = []
    delay: float | None = None
    in_rules = False
    for raw in (text or "").splitlines():
        line = _clean_line(raw)
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:
                groups.append((agents, delay))
                agents, delay, in_rules = [], None, False
            agents.append(val.lower())
        elif key in ("allow", "disallow", "crawl-delay"):
            in_rules = True
            if key == "crawl-delay":
                try:
                    delay = float(val)
                except ValueError:
                    pass
    if agents or in_rules:
        groups.append((agents, delay))

    # same combine-matching-groups rule as parse_robots: among groups
    # at the winning specificity, the LAST declared delay wins (the
    # directive's own last-wins convention inside a group)
    best: float | None = None
    best_spec = -1
    for agents, delay in groups:
        spec = -1
        for a in agents:
            if a == "*":
                spec = max(spec, 0)
            elif ua_l.startswith(a):
                spec = max(spec, len(a))
        if spec < 0:
            continue
        if spec > best_spec:
            best_spec, best = spec, delay
        elif spec == best_spec and delay is not None:
            best = delay
    return best


def crawl_delay_policy(
    robots: DataFrame, ua: str = DEFAULT_UA, parallelism: int = 1
) -> DataFrame:
    """robots(host, rules) → host_policy(domain, delay_ms, parallelism)
    rows for every host that declares a Crawl-delay — the S3 → P1
    bridge: feed to CrawlRun(host_policy=...) (or let
    CrawlConfig.robots_crawl_delay merge it) and robots-declared
    delays get the same pop-budget + live-pacing treatment as
    per-source rate limits. One narrow map over the robots table."""

    @F.pandas_udf("double")
    def _delay(rules: pd.Series) -> pd.Series:
        return pd.Series(
            [parse_crawl_delay(r, ua) if r else None for r in rules],
            dtype="float64",
        )

    return (
        robots.select("host", _delay(F.col("rules")).alias("_s"))
        .filter(F.col("_s").isNotNull())
        .select(
            F.col("host").alias("domain"),
            (F.col("_s") * 1000).cast("long").alias("delay_ms"),
            F.lit(parallelism).cast("int").alias("parallelism"),
        )
    )


# ------------------------------------------------------------- synthetic


def synth_robots(spark, hosts: list[str] | None = None) -> DataFrame:
    """Deterministic robots table over the synthetic corpus hosts.

    Literal-prefix rules only (no wildcards) so the DuckDB oracle for the
    ``robots_gate_s3`` query can reproduce the longest-match semantics in
    pure SQL; wildcard/$ handling is covered by unit tests instead.
    """
    from gocrawl_spark import synth

    hosts = hosts or [f"site{i:02d}.example.com" for i in range(synth.N_HOSTS)]
    rows = []
    for i, h in enumerate(hosts):
        lines = ["User-agent: *", "Disallow: /category/"]
        if i % 3 == 0:
            lines += ["Disallow: /page/", "Allow: /page/1"]
        if i % 5 == 2:
            lines += ["Disallow: /"]
        rows.append((h, "\n".join(lines) + "\n"))
    return spark.createDataFrame(rows, "host string, rules string")


# ------------------------------------------------------- page-level robots
# robots.txt governs FETCHING; <meta name="robots"> and rel="nofollow"
# govern INDEXING and LINK DISCOVERY per page (the Google/Bing contract
# the reference's colly stack leaves to the caller). Exposed as a
# page-audit operator: feed the flags to publish filters (noindex) and
# frontier expansion (nofollow) without touching the extraction kernel.


def meta_directives(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, noindex, nofollow, n_links, n_nofollow_links) per page.

    - ``noindex``/``nofollow``: tokens of the <meta name="robots">
      content attribute (comma-separated, case-insensitive, whitespace
      trimmed); ``none`` implies BOTH, per the Google robots-meta
      spec. No tag ⇒ both false (index,follow is the default).
    - ``n_nofollow_links``: a[href] anchors whose rel attribute
      contains the ``nofollow`` token (space-separated rel list —
      ``rel="ugc nofollow"`` counts); n_links counts all a[href].

    One Arrow-batched htmlmini parse per page inside the scanning
    task (the WAT/anchor_pairs pattern) — payload bytes never
    shuffle, output is 5 scalar columns per page."""
    from collections.abc import Iterator as _It

    from gocrawl_spark.htmlmini.css import find
    from gocrawl_spark.htmlmini.dom import parse

    def gen(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            noidx, nofol, nl, nnl = [], [], [], []
            for raw in pdf[html_col]:
                html = (
                    bytes(raw).decode("utf-8", "replace")
                    if isinstance(raw, (bytes, bytearray, memoryview))
                    else (raw or "")
                )
                root = parse(html)
                toks: set[str] = set()
                for m in find(root, "meta[name='robots']"):
                    content = m.attrs.get("content", "")
                    toks |= {t.strip().lower() for t in content.split(",")}
                ni = "noindex" in toks or "none" in toks
                nf = "nofollow" in toks or "none" in toks
                links = [a for a in find(root, "a[href]") if a.attrs.get("href")]
                nnl_count = sum(
                    1
                    for a in links
                    if "nofollow" in (a.attrs.get("rel", "").lower().split())
                )
                noidx.append(ni)
                nofol.append(nf)
                nl.append(len(links))
                nnl.append(nnl_count)
            yield pd.DataFrame(
                {
                    "url": pdf[url_col].astype("object"),
                    "noindex": pd.Series(noidx, dtype="bool"),
                    "nofollow": pd.Series(nofol, dtype="bool"),
                    "n_links": pd.Series(nl, dtype="int64"),
                    "n_nofollow_links": pd.Series(nnl, dtype="int64"),
                }
            )

    return pages.select(url_col, html_col).mapInPandas(
        gen,
        schema="url string, noindex boolean, nofollow boolean, "
        "n_links long, n_nofollow_links long",
    )


def rules_table(
    robots: DataFrame,
    ua: str = DEFAULT_UA,
    host_col: str = "host",
    rules_col: str = "rules",
) -> DataFrame:
    """Exploded parsed-rule table: (host, rule_idx, allow, pattern, rx)
    for the best-matching UA group of every host's robots.txt —
    rule_idx preserves file order, rx is the compiled wildcard/$
    pattern as an anchored regex string (the same conversion
    rule_matches uses). Arrow-batched mapInPandas over the robots
    rows: the robots table is host-dimension metadata, tiny next to
    any URL side, so parsing cost is negligible and the output stays
    a distributed table (no driver collect)."""

    def gen(batches):
        for pdf in batches:
            out = {"host": [], "rule_idx": [], "allow": [],
                   "pattern": [], "rx": []}
            for h, txt in zip(pdf[host_col], pdf[rules_col]):
                for i, (al, pat) in enumerate(parse_robots(txt or "", ua)):
                    out["host"].append(h)
                    out["rule_idx"].append(i)
                    out["allow"].append(bool(al))
                    out["pattern"].append(pat)
                    out["rx"].append(_pattern_re(pat).pattern)
            yield pd.DataFrame(out)

    return robots.mapInPandas(
        gen, "host string, rule_idx int, allow boolean, pattern string, rx string"
    )


def rule_attribution(
    urls: DataFrame,
    robots: DataFrame,
    ua: str = DEFAULT_UA,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Per-rule hit attribution — WHICH robots.txt line is doing the
    work: for every URL the winning rule under RFC 9309 longest-match
    (Allow wins length ties; no match ⇒ allowed, attributed to a NULL
    pattern), aggregated to one row per (host, pattern, allow):
    (host, pattern, allow, verdict_allowed, n_urls). The coverage-cost
    audit ("this one Disallow blocks 40 % of the host's URLs") that
    robots gating alone never surfaces.

    Plan: host-keyed equi-join of the URL side against the exploded
    rule table (rules are metadata-small — Catalyst broadcasts),
    per-row regexp match of the precompiled rx, then ONE window per
    INPUT ROW electing the winner by (pattern length DESC, allow
    DESC, rule_idx ASC) and a (host, rule) rollup. The winner window
    partitions on a per-row id (not the URL string), so crawl-log
    input with repeated URLs counts every row — n_urls is a row
    count, not a distinct-URL count. The URL side never shuffles on
    anything but its own aggregate key.
    """
    path = F.regexp_replace(
        F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/]*", ""
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    u = urls.select(
        F.col(host_col).alias("_h"), F.col(url_col).alias("_u"),
        path.alias("_p"),
    ).withColumn("_rid", F.monotonically_increasing_id())
    r = rules_table(robots, ua)
    cand = u.join(
        r, (F.col("_h") == F.col("host"))
        & F.expr("regexp_like(_p, rx)"),
        "left",
    )
    w = Window.partitionBy("_rid").orderBy(
        F.desc(F.length("pattern")),
        F.desc("allow"),
        F.asc("rule_idx"),
    )
    winner = (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "_h",
            "pattern",
            # verdict carries the allow bit; unmatched URLs (NULL
            # pattern) are allowed — no nullable boolean in the output
            F.coalesce(F.col("allow"), F.lit(True)).alias("verdict_allowed"),
        )
    )
    return (
        winner.groupBy(
            F.col("_h").alias("host"), "pattern", "verdict_allowed"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_urls"))
    )
