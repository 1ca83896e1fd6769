"""URL canonicalization, absolutization, and hashing (F2–F4, E11).

Reference semantics:
- junk-link filter: /root/reference/internal/crawler/link_handler.go:33-40
  (``#``, ``javascript:``, ``mailto:``, ``tel:`` prefixes dropped)
- absolutization: colly ``Request.AbsoluteURL`` — RFC 3986 reference
  resolution against the request URL; a link starting with ``#`` yields
  "" (link_handler.go:43-48). Python ``urllib.parse.urljoin`` implements
  the same RFC 3986 algorithm as Go ``net/url ResolveReference``.
- url id/hash: hex(sha256(url)) — articles/extractor.go:172-178; in Spark
  this is the built-in ``sha2(url, 256)``, bit-identical.

``registrable_domain`` (politeness sharding per the north rule) uses a
compact multi-label-suffix heuristic instead of the full public-suffix
list (not shipped in this container); the reference itself shards by raw
hostname only (crawler.go:223-228 uses DomainGlob="*").
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit

JUNK_PREFIXES = ("#", "javascript:", "mailto:", "tel:")

# minimal two-label public suffixes for the heuristic eTLD+1
_TWO_LABEL_SUFFIXES = {
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "co.nz", "com.br", "com.cn", "com.mx",
    "co.in", "co.za", "com.sg", "com.tr", "com.ar",
}


def is_junk_link(href: str) -> bool:
    """link_handler.go:33-40."""
    return any(href.startswith(p) for p in JUNK_PREFIXES)


def absolutize(base_url: str, href: str) -> str:
    """colly Request.AbsoluteURL: '' for fragment-only links, else
    RFC 3986 resolution; '' when the result has no scheme."""
    if not href or href.startswith("#"):
        return ""
    try:
        abs_url = urljoin(base_url, href)
    except ValueError:
        return ""
    if not abs_url.startswith(("http://", "https://")):
        return ""
    # strip fragment (net/url keeps it out of request URLs via Visit)
    frag = abs_url.find("#")
    if frag >= 0:
        abs_url = abs_url[:frag]
    return abs_url


def is_valid_url(url: str) -> bool:
    """link_handler.go:51-58 (ValidateURLs default true)."""
    try:
        p = urlsplit(url)
    except ValueError:
        return False
    return bool(p.scheme and p.netloc)


def host_of(url: str) -> str:
    try:
        h = urlsplit(url).hostname
    except ValueError:
        return ""
    return h or ""


def registrable_domain(host: str) -> str:
    """Heuristic eTLD+1 for politeness sharding (north-rule concept;
    the reference rate-limits on a single '*' glob)."""
    if not host:
        return ""
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    if ".".join(labels[-2:]) in _TWO_LABEL_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


# ---------------------------------------------------------------------------
# URL normalization for frontier/corpus dedup (opt-in — the reference
# parity path keeps raw URLs: the byte-identity contract hashes the URL
# exactly as discovered)
# ---------------------------------------------------------------------------

# dropped query parameters: the ubiquitous click/campaign trackers that
# make one page enumerable under unbounded URL aliases
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|igshid|ref)="


def normalize_url_expr(col):
    """RFC 3986 §6 normalization as ONE codegen'd expression — the
    Heritrix-style canonicalization a frontier applies to collapse URL
    aliases before the seen filter (opt-in; never on the parity path):

    - scheme and host lowercased
    - default ports stripped (http:80, https:443)
    - fragment removed
    - empty path → "/"
    - query parameters SORTED, empty params and tracking params
      (TRACKING_PARAM_RE) dropped; "?" dropped when nothing survives

    Non-http(s) inputs pass through unchanged. Pure
    `parse_url`/regexp/array built-ins — JVM-side, no UDF, evaluated in
    the scan, so at 10^10 URLs it costs a projection, not a shuffle.
    Percent-encoding case and dot-segment removal are NOT normalized
    (the absolutization path already resolves dot-segments)."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.parse_url(c, F.lit("AUTHORITY"))
    host = F.lower(F.regexp_extract(auth, r"^([^:]*)", 1))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path = F.coalesce(F.parse_url(c, F.lit("PATH")), F.lit(""))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.coalesce(F.parse_url(c, F.lit("QUERY")), F.lit(""))
    params = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    query = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    normalized = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        query,
    )
    return F.when(scheme.isin("http", "https"), normalized).otherwise(c)


def surt_key_expr(col):
    """SURT key (Sort-friendly URI Reordering Transform) as ONE
    codegen'd expression — the canonical key of web-archive CDX
    indexes (Heritrix/pywb/Common Crawl ``cdx-index``):

    - scheme dropped (http ≡ https under one key)
    - host lowercased, userinfo stripped, leading ``www`` label
      (``www.``, ``www2.`` …) stripped, labels REVERSED and joined
      with "," — so one host's captures sort contiguously and a
      domain is a key-range prefix scan
    - default ports dropped (http:80, https:443), other ports kept
      as ``:port`` before the ")" delimiter
    - path lowercased, empty path → "/"
    - query lowercased, params sorted, empty params dropped, "?"
      dropped when nothing survives; fragment dropped

    ``https://WWW.Example.com/News?b=2&a=1`` →
    ``com,example)/news?a=1&b=2``. Non-http(s) inputs degrade to
    ``lower(url)``. Pure regexp/array built-ins — JVM-side, no UDF,
    costs a projection at 10^10 URLs. The reference has no archive
    index; this extends its URL identity (articles/extractor.go:
    172-178 sha256 ids) with the range-scannable archive key."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.lower(
        F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    auth = F.regexp_replace(auth, r"^[^@]*@", "")
    host = F.regexp_replace(
        F.regexp_extract(auth, r"^([^:]*)", 1), r"^www\d*\.", ""
    )
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.lower(
        F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qraw = F.lower(F.regexp_extract(c, r"\?([^#]*)", 1))
    params = F.array_sort(F.filter(F.split(qraw, "&"), lambda p: p != ""))
    query = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    surt = F.concat(
        rev_host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.lit(")"),
        path,
        query,
    )
    return F.when(scheme.isin("http", "https"), surt).otherwise(F.lower(c))


# ---------------------------------------------------------------------------
# Crawl-trap detection (Heritrix-style URL hygiene)
# ---------------------------------------------------------------------------

# session-token query params: a crawler that follows these enumerates
# one page under unbounded aliases (Heritrix's classic trap class)
SESSION_PARAM_RE = r"(?i)(^|&)(phpsessid|jsessionid|sessionid|sid|cfid|cftoken)="


def trap_signals(col) -> dict:
    """Per-URL crawl-trap signals as pure codegen'd expressions — the
    hygiene gates an open-web frontier applies before admitting a
    candidate (Heritrix PathologicalPathDecideRule / TooManyPathSegments
    / session-id canonicalization, applied here as filters):

    - ``n_segments``: path depth (non-empty / -separated segments)
    - ``n_repeats``: path-segment repetitions (segments − distinct
      segments; a calendar or symlink loop repeats one segment)
    - ``n_params``: query-parameter count (faceted-search explosions)
    - ``has_session``: a session-token parameter is present

    All regex is RE2-safe so the DuckDB oracle evaluates the identical
    patterns. Scale shape: evaluated in the candidate scan, no shuffle,
    no UDF."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    path = F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(c, r"\?([^#]*)", 1)
    segs = F.filter(F.split(path, "/"), lambda x: x != F.lit(""))
    params = F.filter(F.split(query, "&"), lambda x: x != F.lit(""))
    return {
        "n_segments": F.size(segs),
        "n_repeats": F.size(segs) - F.size(F.array_distinct(segs)),
        "n_params": F.size(params),
        "has_session": query.rlike(SESSION_PARAM_RE),
    }


def is_trap_expr(
    col,
    max_path_depth: int = 12,
    max_repeats: int = 1,
    max_params: int = 8,
) -> "F.Column":
    """True when the URL trips any trap gate: path deeper than
    ``max_path_depth`` segments, more than ``max_repeats`` repeated
    path segments, more than ``max_params`` query params, or a
    session-token parameter. Thresholds follow Heritrix defaults
    scaled to one expression; tune per crawl."""
    s = trap_signals(col)
    return (
        (s["n_segments"] > max_path_depth)
        | (s["n_repeats"] > max_repeats)
        | (s["n_params"] > max_params)
        | s["has_session"]
    )


def dust_rules(
    pages,
    url_col: str = "url",
    digest_col: str = "digest",
    min_support: int = 3,
):
    """DUST rule mining (Bar-Yossef, Keidar & Schonfeld, WWW 2007 "Do
    not crawl in the DUST"): learn per-host query-parameter strip rules
    from the crawl's own evidence. A rule (host, param) is supported by
    a URL when removing `param` from its query string yields ANOTHER
    crawled URL whose content digest is identical, and violated when
    the alias exists but its digest differs. Output:

      (host, param, support, violations, rule_ok)

    rule_ok = support ≥ min_support AND violations = 0 — the rules a
    frontier canonicalizer can apply to collapse session-id/tracking
    parameters BEFORE fetching, the scale lever the static
    normalize_url_expr strip-list cannot learn per site.

    Plan shape: one posexplode (×#params, bounded by query length), an
    equi-join of stripped candidates against the crawled (url, digest)
    map, and a (host, param) rollup — hosts×params result rows, no
    pairwise URL comparison anywhere. All codegen'd expressions.
    """
    from pyspark.sql import functions as F

    split_q = F.split(F.col(url_col), r"\?")
    parsed = pages.select(
        F.col(url_col).alias("url"),
        F.col(digest_col).alias("digest"),
        F.regexp_extract(url_col, r"^https?://([^/?#]+)", 1).alias("host"),
        split_q.getItem(0).alias("base"),
        F.split(F.get(split_q, 1), "&").alias("params"),
    ).filter(F.col("params").isNotNull() & (F.size("params") > 0))
    ex = parsed.select(
        "digest", "host", "base", "params",
        F.posexplode("params").alias("pos", "param"),
    )
    stripped = F.when(F.size("params") == 1, F.col("base")).otherwise(
        F.concat(
            F.col("base"),
            F.lit("?"),
            F.array_join(
                F.filter("params", lambda x, i: i != F.col("pos")), "&"
            ),
        )
    )
    cand = ex.select(
        "digest",
        "host",
        F.split("param", "=").getItem(0).alias("param"),
        stripped.alias("stripped"),
    )
    digests = pages.select(
        F.col(url_col).alias("_alias_url"), F.col(digest_col).alias("_alias_digest")
    )
    hits = cand.join(digests, cand["stripped"] == digests["_alias_url"])
    agreed = F.when(F.col("digest") == F.col("_alias_digest"), 1).otherwise(0)
    rules = (
        hits.groupBy("host", "param")
        .agg(
            F.sum(agreed).cast("long").alias("support"),
            F.sum(1 - agreed).cast("long").alias("violations"),
        )
    )
    return rules.select(
        "host", "param", "support", "violations",
        ((F.col("support") >= min_support) & (F.col("violations") == 0)).alias("rule_ok"),
    )


def apply_dust_rules(
    df,
    rules,
    url_col: str = "url",
    out_col: str = "canonical_url",
):
    """Apply validated :func:`dust_rules` to a URL column: strip every
    query parameter whose ``(host, param)`` rule has ``rule_ok`` —
    collapsing session-id/tracking aliases BEFORE they enter the
    frontier (the fetch-avoidance payoff of DUST mining; the static
    twin is ``normalize_url_expr``'s fixed strip-list).

    Adds ``out_col``: the URL with stripped params removed in original
    order; ``?`` dropped when nothing survives; URLs without a query or
    on hosts without rules pass through unchanged.

    Plan shape: the rules table aggregates to one strip-set row per
    host (hosts×params is metadata-sized even at 10^10 URLs) and
    broadcast-joins on host — the URL table never shuffles, and the
    rewrite is one codegen'd expression pass.
    """
    from pyspark.sql import functions as F

    strip_sets = (
        rules.filter(F.col("rule_ok"))
        .groupBy("host")
        .agg(F.collect_set("param").alias("_strip_params"))
    )
    split_q = F.split(F.col(url_col), r"\?")
    with_host = df.withColumn(
        "_dust_host", F.regexp_extract(url_col, r"^https?://([^/?#]+)", 1)
    )
    joined = with_host.join(
        F.broadcast(strip_sets),
        with_host["_dust_host"] == strip_sets["host"],
        "left",
    ).drop("host")
    base = split_q.getItem(0)
    query = F.get(split_q, 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: ~F.array_contains(
            F.col("_strip_params"), F.split(p, "=").getItem(0)
        ),
    )
    rewritten = F.when(
        query.isNull() | F.col("_strip_params").isNull(), F.col(url_col)
    ).otherwise(
        F.when(F.size(kept) == 0, base).otherwise(
            F.concat(base, F.lit("?"), F.array_join(kept, "&"))
        )
    )
    return joined.withColumn(out_col, rewritten).drop(
        "_dust_host", "_strip_params"
    )


def url_templates(
    pages,
    url_col: str = "url",
    min_count: int = 2,
):
    """URL pattern mining: mask digit runs in the path to ``N`` and
    roll up to (host, template, n_urls, example_url) — the census of a
    site's enumerable URL spaces (``/p/N``, ``/cal/N/N/N``) that drives
    crawl-budget decisions: a template with millions of members and low
    content yield is a listing/calendar space to throttle, the
    complement of the per-URL :func:`is_trap_expr` gate.

    `example_url` is the lexicographic min member (deterministic).
    Templates under `min_count` members are dropped. One codegen'd
    projection + one (host, template) rollup — hosts×templates output
    rows, no joins, at 10^10 URLs a single shuffle.
    """
    from pyspark.sql import functions as F

    host, template = _url_template_cols(url_col)
    return (
        pages.select(
            host.alias("host"), template.alias("template"),
            F.col(url_col).alias("url"),
        )
        .groupBy("host", "template")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.min("url").alias("example_url"),
        )
        .filter(F.col("n_urls") >= min_count)
    )


def _url_template_cols(url_col: str):
    """(host, template) expressions shared by :func:`url_templates`,
    :func:`trap_rules`, and :func:`apply_trap_rules` — host from the
    authority, path with digit runs masked to ``N``."""
    from pyspark.sql import functions as F

    c = F.col(url_col)
    host = F.regexp_extract(c, r"^https?://([^/?#]+)", 1)
    path = F.regexp_extract(c, r"^https?://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return host, F.regexp_replace(path, r"[0-9]+", "N")


def trap_rules(
    pages,
    url_col: str = "url",
    digest_col: str = "digest",
    min_urls: int = 8,
    max_yield_bp: int = 3000,
):
    """Learned crawl-trap rules from the crawl's own content yield —
    the template-level complement of the static :func:`is_trap_expr`
    gate and the path-space analogue of :func:`dust_rules`: an
    enumerable URL space (calendar pager, faceted listing, session
    spiral) betrays itself by minting many URLs that hash to few
    distinct bodies. Per digit-masked (host, template):

      (host, template, n_urls, n_digests, yield_bp, trap)

    yield_bp = n_digests·10⁴ DIV n_urls (exact integer basis points);
    trap = n_urls ≥ ``min_urls`` AND yield_bp ≤ ``max_yield_bp``.
    Heritrix-style crawls apply the trapped templates as frontier
    deny-rules next round (:func:`apply_trap_rules`), so the budget
    stops feeding spaces that provably return duplicate content.

    Plan shape: one codegen'd projection + one (host, template)
    rollup with map-side-combining count / count_distinct —
    hosts×templates output rows, no joins, a single shuffle at 10^10
    URLs."""
    from pyspark.sql import functions as F

    host, template = _url_template_cols(url_col)
    return (
        pages.select(
            host.alias("host"),
            template.alias("template"),
            F.col(digest_col).alias("digest"),
        )
        .groupBy("host", "template")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.count_distinct("digest").cast("long").alias("n_digests"),
        )
        .select(
            "host",
            "template",
            "n_urls",
            "n_digests",
            F.expr("n_digests * 10000 DIV n_urls").alias("yield_bp"),
        )
        .withColumn(
            "trap",
            (F.col("n_urls") >= min_urls)
            & (F.col("yield_bp") <= max_yield_bp),
        )
    )


def apply_trap_rules(
    df,
    rules,
    url_col: str = "url",
    out_col: str = "is_trap",
):
    """Flag frontier URLs that fall in a learned trap space: adds
    boolean ``out_col`` = the URL's (host, digit-masked template) has
    ``trap`` in a :func:`trap_rules` table. Filter on ``~is_trap``
    before fetch — the yield-learned twin of the static
    ``is_trap_expr`` frontier gate (rounds.py:305).

    Plan shape: the trapped templates (hosts×templates — metadata-
    sized at any corpus scale) broadcast-join onto the frontier's
    derived (host, template); the frontier itself never shuffles."""
    from pyspark.sql import functions as F

    host, template = _url_template_cols(url_col)
    trapped = (
        rules.filter(F.col("trap"))
        .select(
            F.col("host").alias("_t_host"),
            F.col("template").alias("_t_tpl"),
            F.lit(True).alias("_t_hit"),
        )
        .distinct()
    )
    out = (
        df.withColumn("_t_host", host)
        .withColumn("_t_tpl", template)
        .join(F.broadcast(trapped), ["_t_host", "_t_tpl"], "left")
        .withColumn(out_col, F.coalesce(F.col("_t_hit"), F.lit(False)))
        .drop("_t_host", "_t_tpl", "_t_hit")
    )
    return out
