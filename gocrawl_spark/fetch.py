"""S2 real-fetch mode: live HTTP fetching as a distributed map stage.

The corpus-join fetch (rounds.py J2) is the benchmark/test contract;
this module is the S2 variant the reference actually performs — a real
HTTP GET per popped URL (colly collector fetch,
reference internal/crawler/crawler.go:197-247) — expressed Spark-first:

- the politeness POP already bounds how many URLs per host enter the
  round (P1/P2), so the fetch stage is a pure narrow map over the
  batch: ``repartition(domain)`` co-locates each host's URLs in one
  partition, and a per-host pacer inside the partition enforces the
  configured delay between same-host requests — politeness holds
  per-executor without any coordination;
- responses join the batch rows positionally (mapInPandas appends
  ``html``/``status`` columns), so the downstream fused extraction is
  identical to corpus mode;
- error classes mirror the reference's retry split
  (crawler.go:300-317 / link_handler.go:60-107): HTTP 5xx and network
  errors are TRANSIENT (status recorded, re-enqueued by the round loop
  with attempt+1), 4xx are permanent misses (dropped like a corpus
  join miss);
- F10 redirect policy: redirects are followed (colly's default —
  net/http follows up to 10 hops) and the landing URL is RECORDED in a
  ``final_url`` column, so a downstream canonicalization pass can
  alias-map redirected URLs — the piece the reference loses (it keeps
  only the request URL).

``proxy_base`` rewrites ``https://host/path`` →
``{proxy_base}/host/path`` so an in-process loopback server can stand
in for the whole synthetic web (the reference's test helper server,
tests/helpers/server.go) — same mechanism a production deployment uses
for a forward-proxy fleet.
"""

from __future__ import annotations

import time
from collections.abc import Iterator
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import BinaryType, IntegerType, StringType, StructField, StructType


def fetch_http(
    batch: DataFrame,
    user_agent: str = "gocrawl",
    timeout_s: float = 10.0,
    delay_ms: int = 0,
    proxy_base: str | None = None,
    delay_col: str | None = None,
) -> DataFrame:
    """batch(url, …) → batch + (html binary, status int, final_url
    string), one real HTTP GET per row. Partitioned by domain so the
    per-host pacer is local; status 0 = network/timeout error
    (transient), else the HTTP code; final_url is the post-redirect
    landing URL (== url when no redirect happened).

    ``delay_col`` names an optional per-row effective-delay column
    (milliseconds): when set, the pacer waits that row's delay since
    the host's previous request instead of the scalar ``delay_ms`` —
    this is how per-source LimitRule overrides (host_policy) are
    enforced against live servers, not just in the pop budget.

    Conditional GET (RFC 9110 §13): when the batch carries a
    ``_etag`` column, each non-null value is sent as If-None-Match;
    a 304 Not Modified comes back as status 304 with an empty body —
    the caller reuses its prior extraction (CrawlRun's validator
    cache). The response ETag (if any) is always captured into an
    ``etag`` output column so the next generation can revalidate.
    """
    out_schema = StructType(
        list(batch.schema.fields)
        + [
            StructField("html", BinaryType()),
            StructField("status", IntegerType()),
            StructField("final_url", StringType()),
            StructField("etag", StringType()),
        ]
    )

    def run(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import urllib.error
        import urllib.request

        if proxy_base is not None:
            _pb = urlsplit(proxy_base)
            _origin = f"{_pb.scheme}://{_pb.netloc}/"
            _prefix = _pb.path.strip("/")

        def unproxy(u: str, like: str) -> str:
            """Map a proxied landing URL back to crawl-space for the
            final_url column (inverse of the target rewrite). Redirects
            may land anywhere under the proxy origin, with or without
            the proxy's own path prefix. The crawl-space scheme is
            inherited from the ORIGINAL request URL (`like`) — the
            proxy path carries host+path only, so an http:// crawl URL
            must not come back rewritten as https:// (ports cannot be
            recovered either; the rewrite drops them, documented)."""
            if proxy_base is None or not u.startswith(_origin):
                return u
            rest = u[len(_origin):]
            if _prefix and rest.startswith(_prefix + "/"):
                rest = rest[len(_prefix) + 1 :]
            host, _, path = rest.partition("/")
            scheme = urlsplit(like).scheme or "https"
            return f"{scheme}://{host}/{path}" if path else f"{scheme}://{host}"

        last_hit: dict[str, float] = {}
        for pdf in parts:
            htmls: list[bytes | None] = []
            statuses: list[int] = []
            finals: list[str] = []
            etags: list[str | None] = []
            delays = (
                pdf[delay_col]
                if delay_col is not None and delay_col in pdf.columns
                else [delay_ms] * len(pdf)
            )
            req_etags = (
                pdf["_etag"] if "_etag" in pdf.columns else [None] * len(pdf)
            )
            for url, row_delay_ms, req_etag in zip(pdf["url"], delays, req_etags):
                host = urlsplit(url).hostname or ""
                if row_delay_ms and row_delay_ms > 0:
                    prev = last_hit.get(host)
                    if prev is not None:
                        wait = prev + float(row_delay_ms) / 1000.0 - time.monotonic()
                        if wait > 0:
                            time.sleep(wait)
                target = url
                if proxy_base is not None:
                    parts_ = urlsplit(url)
                    target = f"{proxy_base.rstrip('/')}/{parts_.hostname}{parts_.path}"
                    if parts_.query:
                        target += f"?{parts_.query}"
                body, status, final, resp_etag = b"", 0, url, None
                try:
                    headers = {"User-Agent": user_agent}
                    if req_etag is not None and not pd.isna(req_etag):
                        headers["If-None-Match"] = str(req_etag)
                    req = urllib.request.Request(target, headers=headers)
                    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                        body = resp.read()
                        status = int(resp.status)
                        resp_etag = resp.headers.get("ETag")
                        landed = resp.geturl()
                        if landed and landed != target:
                            final = unproxy(landed, url)
                except urllib.error.HTTPError as e:
                    status = int(e.code)
                    # urllib raises on 304; it IS the success path of a
                    # conditional GET — capture any ETag the server sent
                    if status == 304:
                        resp_etag = e.headers.get("ETag") if e.headers else None
                except Exception:
                    status = 0  # DNS/conn/timeout: transient
                last_hit[host] = time.monotonic()
                htmls.append(body)
                statuses.append(status)
                finals.append(final)
                etags.append(resp_etag)
            yield pdf.assign(
                html=htmls, status=statuses, final_url=finals, etag=etags
            )

    return batch.repartition("domain").mapInPandas(run, schema=out_schema)


# RFC 9309 §2.3.1.4: an UNREACHABLE robots.txt means complete disallow
UNREACHABLE_RULES = "User-agent: *\nDisallow: /"


def fetch_robots(
    hosts: DataFrame,
    user_agent: str = "gocrawl",
    timeout_s: float = 10.0,
    proxy_base: str | None = None,
) -> DataFrame:
    """hosts(host) → robots(host, rules, ok): one GET /robots.txt per
    DISTINCT host, the live analogue of the static robots table
    (colly's per-domain robots fetch, reference crawler.go collector
    setup). RFC 9309 §2.3.1: a 4xx (UNAVAILABLE) robots file means
    crawling is unrestricted → empty rules, ok=True; 5xx/network
    (UNREACHABLE) MUST be treated as complete disallow → synthesized
    "Disallow: /" rules with ok=False, which the round loop applies
    for THIS round but does not persist, so the host is re-fetched
    next round instead of being unrestricted forever. The output plugs
    straight into robots.gate / CrawlRun(robots=...)."""
    from pyspark.sql.types import BooleanType, StringType, StructField as SF, StructType as ST

    out_schema = ST([
        SF("host", StringType()), SF("rules", StringType()), SF("ok", BooleanType())
    ])

    def run(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import urllib.error
        import urllib.request

        for pdf in parts:
            rules: list[str] = []
            oks: list[bool] = []
            for host in pdf["host"]:
                target = (
                    f"{proxy_base.rstrip('/')}/{host}/robots.txt"
                    if proxy_base is not None
                    else f"https://{host}/robots.txt"
                )
                text, ok = "", True
                try:
                    req = urllib.request.Request(
                        target, headers={"User-Agent": user_agent}
                    )
                    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                        if int(resp.status) == 200:
                            text = resp.read().decode("utf-8", errors="replace")
                except urllib.error.HTTPError as e:
                    if not 400 <= int(e.code) < 500:
                        text, ok = UNREACHABLE_RULES, False  # 5xx: unreachable
                    # 4xx: unavailable → unrestricted (text="", ok=True)
                except Exception:
                    text, ok = UNREACHABLE_RULES, False  # DNS/conn/timeout
                rules.append(text)
                oks.append(ok)
            yield pd.DataFrame(
                {"host": list(pdf["host"]), "rules": rules, "ok": oks}
            )

    return hosts.select("host").distinct().mapInPandas(run, schema=out_schema)


# --- soft-404 detection ------------------------------------------------------
#
# Servers that answer missing pages with HTTP 200 ("soft 404s",
# Bar-Yossef et al. WWW'04) poison a crawl twice: the junk page enters
# the index, and its (dead) out-links keep the frontier busy. gocrawl
# trusts the status code alone (colly OnResponse, crawler.go:300-317);
# at corpus scale the standard complement is a content-side classifier
# over the fetched batch. Pure codegen'd expressions — no UDF, no
# shuffle; runs in the fetch round's scan projection.

_SOFT404_TITLE_RE = r"\b(404|page not found|not found|error)\b"
_SOFT404_PHRASE_RE = (
    r"(page (you requested )?((was|could) )?not (be )?found"
    r"|no longer (exists|available)|does not exist"
    r"|has been (removed|deleted))"
)
_SOFT404_TINY_RE = r"\b(error|not found|oops|sorry)\b"


def soft404_signals(title_col, text_col, min_words: int = 20) -> dict:
    """The three content signals as named Columns: a 404-ish title, a
    not-found phrase in the body, and a tiny body that still carries an
    error marker. Regexes are RE2∩Java so the DuckDB oracle runs the
    identical patterns on lowercased input."""
    from pyspark.sql import functions as F

    title = F.lower(F.col(title_col) if isinstance(title_col, str) else title_col)
    text = F.lower(F.col(text_col) if isinstance(text_col, str) else text_col)
    wc = F.size(
        F.filter(F.split(F.trim(text), r"[\t\n\f\r ]+"), lambda x: x != F.lit(""))
    )
    return {
        "title_hit": title.rlike(_SOFT404_TITLE_RE),
        "phrase_hit": text.rlike(_SOFT404_PHRASE_RE),
        "tiny_hit": (wc < min_words) & text.rlike(_SOFT404_TINY_RE),
    }


def soft404_expr(status_col, title_col, text_col, min_words: int = 20):
    """True iff the response claims success (status 200) but the content
    says "not found" by any of the soft404_signals."""
    from pyspark.sql import functions as F

    s = soft404_signals(title_col, text_col, min_words)
    status = F.col(status_col) if isinstance(status_col, str) else status_col
    return (status == 200) & (s["title_hit"] | s["phrase_hit"] | s["tiny_hit"])


__all__ = [
    "fetch_http", "fetch_robots", "UNREACHABLE_RULES",
    "soft404_signals", "soft404_expr",
]
