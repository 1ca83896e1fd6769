"""Deterministic synthetic web corpus (SURVEY.md §7.1 step 1).

Builds the ``pages_corpus(url, warc_ts, html, text, lang)`` table mandated
by BASELINE.json:input_hint from the driver-provided ``documents`` parquet
table — fully distributed (``mapInPandas``, no driver collect) and a pure
function of ``doc_id``, so the same corpus comes out at any parallelism.

The HTML shapes follow the reference's test fixtures
(tests/helpers/fixtures.go:187-219): article pages are
``article > h1 + p.lead + time[datetime] + div`` with ``og:type=article``;
plain pages are ``main > h1 + .content`` plus exclude-bait
(script/nav/.sidebar) so the exclude selectors do real work.

Link graph (pure function of doc_id, modulo N):
- fanout 3–5: targets ``(id*31 + 7j + 1) % N``
- the first link is emitted host-relative when the target shares the
  page's host (exercises RFC-3986 absolutization, F3)
- junk links (mailto:/javascript:/#/tel:) on every page (F2)
- every ``id % 6 == 2`` page links to an off-domain host (F5)
- every ``id % 17 == 3`` page lives under ``/category/…`` (trips V1)
- every ``id % 23 == 5`` article gets an unpadded short body (trips V4/V6)

Host assignment is deliberately skewed: ``id % 4 == 0`` → ``site00`` (the
hot domain holds ~25 % of URLs), the rest spread over 15 hosts — this is
the skew the politeness pop's salting has to absorb (SURVEY.md §7.3.4).
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from gocrawl_spark.schema import PAGES_CORPUS

N_HOSTS = 16
_EPOCH = datetime(2023, 1, 1, 0, 0, 0)

_PAD_SENTENCE = (
    "The quick brown fox jumps over the lazy dog while fifty-five "
    "editors review the canonical copy of this synthetic article. "
)


def host_index(doc_id: int) -> int:
    return 0 if doc_id % 4 == 0 else 1 + (doc_id % (N_HOSTS - 1))


def host_of_id(doc_id: int) -> str:
    return f"site{host_index(doc_id):02d}.example.com"


def is_article_id(doc_id: int) -> bool:
    return doc_id % 3 != 0


def is_category_id(doc_id: int) -> bool:
    return doc_id % 17 == 3


def is_short_id(doc_id: int) -> bool:
    return doc_id % 23 == 5


def url_of(doc_id: int) -> str:
    host = host_of_id(doc_id)
    if is_category_id(doc_id):
        return f"https://{host}/category/{doc_id}"
    kind = "article" if is_article_id(doc_id) else "page"
    return f"https://{host}/{kind}/{doc_id}"


def path_of(doc_id: int) -> str:
    url = url_of(doc_id)
    return url[url.index("/", 8) :]


def link_targets(doc_id: int, n: int) -> list[int]:
    fanout = 3 + (doc_id % 3)
    return [(doc_id * 31 + 7 * (j + 1) + 1) % n for j in range(fanout)]


def out_links(doc_id: int, n: int) -> list[str]:
    """hrefs in document order, junk first (as laid out in the HTML)."""
    links = ["#top", "javascript:void(0)", "mailto:ed@example.com", "tel:+155500"]
    for j, tgt in enumerate(link_targets(doc_id, n)):
        if j == 0 and host_index(tgt) == host_index(doc_id):
            links.append(path_of(tgt))  # host-relative → absolutize (F3)
        else:
            links.append(url_of(tgt))
    if doc_id % 6 == 2:
        links.append(f"https://external-{doc_id % 5}.other.com/x/{doc_id}")
    return links


def pub_date(doc_id: int) -> datetime:
    return _EPOCH + timedelta(days=doc_id % 365, hours=doc_id % 24, minutes=doc_id % 60)


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def title_of(doc_id: int, text: str) -> str:
    head = " ".join(text.split()[:6])
    return f"Synthetic document {doc_id}: {head}" if head else f"Synthetic document {doc_id}"


def body_text_of(doc_id: int, text: str) -> str:
    body = " ".join(text.split())
    if is_short_id(doc_id):
        return body[:60] if body else "too short"
    # pad so validation gates (V4: ≥100 chars, V6: ≥50 words) pass
    while len(body) < 400 or len(body.split()) < 55:
        body = (body + " " + _PAD_SENTENCE).strip()
    return body[:50_000]


def _anchor_html(doc_id: int, n: int) -> str:
    parts = []
    for href in out_links(doc_id, n):
        parts.append(f'<a href="{_esc(href)}">link</a>')
    return "\n".join(parts)


def build_html(doc_id: int, text: str, lang: str, n: int) -> str:
    url = url_of(doc_id)
    title = _esc(title_of(doc_id, text))
    body = _esc(body_text_of(doc_id, text))
    date = pub_date(doc_id).strftime("%Y-%m-%dT%H:%M:%SZ")
    anchors = _anchor_html(doc_id, n)
    kws = f"synthetic, corpus, lang-{lang}, shard-{doc_id % 7}"
    if is_article_id(doc_id):
        return f"""<!DOCTYPE html>
<html lang="{lang}"><head>
<title>{title}</title>
<meta property="og:type" content="article">
<meta property="og:title" content="{title}">
<meta property="og:description" content="Summary of document {doc_id}">
<meta property="og:image" content="https://{host_of_id(doc_id)}/img/{doc_id}.jpg">
<meta name="keywords" content="{kws}">
<meta name="description" content="Description of document {doc_id}">
<link rel="canonical" href="{url}">
</head><body>
<nav><a href="#nav">nav</a></nav>
<article>
<h1>{title}</h1>
<p class="lead">Intro paragraph for document {doc_id}.</p>
<span class="byline-name">Reporter {doc_id % 11}</span>
<span class="section">section-{doc_id % 5}</span>
<time datetime="{date}">published</time>
<div>{body}</div>
</article>
<script>var tracked = {doc_id};</script>
{anchors}
</body></html>"""
    return f"""<!DOCTYPE html>
<html lang="{lang}"><head>
<title>{title}</title>
<meta name="description" content="Description of page {doc_id}">
<meta name="keywords" content="{kws}">
<link rel="canonical" href="{url}">
</head><body>
<nav class="header"><a href="#nav">nav</a></nav>
<main>
<h1>{title}</h1>
<div class="content">{body}</div>
<div class="sidebar">SIDEBAR NOISE</div>
</main>
<script>var tracked = {doc_id};</script>
{anchors}
</body></html>"""


def corpus_from_documents(
    spark: SparkSession, sf_dir: str, n_total: int | None = None
) -> DataFrame:
    """documents.parquet → pages_corpus DataFrame, distributed.

    One ``mapInPandas`` pass; every output cell is a pure function of
    (doc_id, text, lang, N) so any partitioning yields the same corpus.
    At 100 TB this is a single embarrassingly-parallel map over the
    Iceberg scan — no shuffle at all.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = n_total if n_total is not None else docs.count()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            texts = pdf["text"].fillna("")
            langs = pdf["lang"].fillna("und")
            rows = {
                "url": [url_of(int(i)) for i in ids],
                "warc_ts": [pub_date(int(i)) for i in ids],
                "html": [
                    build_html(int(i), t, la, n).encode("utf-8")
                    for i, t, la in zip(ids, texts, langs)
                ],
                "text": list(texts),
                "lang": list(langs),
            }
            yield pd.DataFrame(rows)

    return docs.select("doc_id", "text", "lang").mapInPandas(gen, schema=PAGES_CORPUS)


def seed_urls(n_docs: int, k: int = 32) -> list[str]:
    """Deterministic seed list: the first k doc ids (covers every host)."""
    return [url_of(i) for i in range(min(k, n_docs))]


def with_transient_faults(corpus: DataFrame, every: int = 7, attempts: int = 2) -> DataFrame:
    """Deterministic fault injection for the F9 retry path: every
    ``every``-th URL (by xxhash64) fails its first ``attempts`` fetch
    attempts, then succeeds — the batch analogue of a transient HTTP
    error healing on retry (link_handler.go:60-107)."""
    from pyspark.sql import functions as F

    return corpus.withColumn(
        "fail_attempts",
        F.when(F.pmod(F.xxhash64("url"), F.lit(every)) == 0, F.lit(attempts)).otherwise(
            F.lit(0)
        ),
    )


def expected_article_body(doc_id: int, text: str) -> str:
    """Byte-identical oracle for the article `body` field, reconstructed
    from the template by pure string logic — no DOM, no selector engine.
    Mirrors the reference semantics: body falls back to the container
    (`article`) text with excludes removed, goquery `.Text()` = raw
    text-node concatenation (the template's literal newlines), TrimSpace
    at the ends only (articles/extractor.go:244-267, 20-46)."""
    title = title_of(doc_id, text)
    body = body_text_of(doc_id, text)
    return (
        f"{title}\nIntro paragraph for document {doc_id}.\n"
        f"Reporter {doc_id % 11}\nsection-{doc_id % 5}\npublished\n{body}"
    ).strip()  # the kernel TrimSpaces the container text (short bodies end in ' ')


def expected_page_content(doc_id: int, text: str) -> str:
    """Byte-identical oracle for the page `content` field: `main`
    container, default excludes drop the sidebar, then cleanText
    collapses all whitespace runs to single spaces
    (page/extractor.go:84-120, 37-57)."""
    return f"{title_of(doc_id, text)} {body_text_of(doc_id, text)}".strip()
