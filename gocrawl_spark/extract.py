"""Extraction kernel: selector-driven article/page/link extraction.

Pure-Python reimplementation of the reference crawler's extraction
semantics (jonesrussell/gocrawl), audited function-by-function so the
extracted ``text`` per URL is byte-identical:

- article text path:   /root/reference/internal/content/articles/extractor.go
- page text path:      /root/reference/internal/content/page/extractor.go
- content-type router: /root/reference/internal/crawler/html_processor.go:115-169
- link discovery:      /root/reference/internal/crawler/crawler.go:346-348,
                       /root/reference/internal/crawler/link_handler.go:26-58

These functions are deliberately Spark-free: they are wrapped by the
Arrow-batched UDFs in :mod:`gocrawl_spark.udfs` and unit-tested against
golden outputs. One parse per document; destructive exclude-removal is
shared across stages exactly as in the reference (colly registers the
extraction handler before the link handler — crawler.go:291 vs :346 —
so link discovery observes the mutated DOM).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

from .htmlmini import Element, find, parse
from .htmlmini.dom import TextNode  # noqa: F401  (re-export for tests)

# ---------------------------------------------------------------------------
# Selector configuration (internal/config/types/selectors.go)
# ---------------------------------------------------------------------------


@dataclass
class ArticleSelectors:
    """selectors.go:33-90; defaults :107-132."""

    container: str = ""
    title: str = ""
    body: str = ""
    intro: str = ""
    byline: str = ""
    published_time: str = ""
    time_ago: str = ""
    json_ld: str = ""
    description: str = ""
    section: str = ""
    keywords: str = ""
    og_title: str = ""
    og_description: str = ""
    og_image: str = ""
    og_url: str = ""
    canonical: str = ""
    word_count: str = ""
    publish_date: str = ""
    category: str = ""
    tags: str = ""
    author: str = ""
    byline_name: str = ""
    article_id: str = ""
    exclude: list[str] = field(default_factory=list)

    @classmethod
    def default(cls) -> "ArticleSelectors":
        return cls(
            container="article",
            title="h1",
            body="article > div",
            intro="p.lead",
            byline=".byline",
            published_time="time[datetime]",
            time_ago="time.ago",
            json_ld="script[type='application/ld+json']",
            description="meta[name='description']",
            section=".section",
            keywords="meta[name='keywords']",
            og_title="meta[property='og:title']",
            og_description="meta[property='og:description']",
            og_image="meta[property='og:image']",
            og_url="meta[property='og:url']",
            canonical="link[rel='canonical']",
            word_count=".word-count",
            publish_date="time[pubdate]",
            category=".category",
            tags=".tags",
            author=".author",
            byline_name=".byline-name",
        )


@dataclass
class PageSelectors:
    """selectors.go:135-158; defaults :161-182."""

    container: str = ""
    title: str = ""
    content: str = ""
    description: str = ""
    keywords: str = ""
    og_title: str = ""
    og_description: str = ""
    og_image: str = ""
    og_url: str = ""
    canonical: str = ""
    exclude: list[str] = field(default_factory=list)

    @classmethod
    def default(cls) -> "PageSelectors":
        return cls(
            container="main, article, body",
            title="h1, title",
            content="main, article, .content",
            description="meta[name='description']",
            keywords="meta[name='keywords']",
            og_title="meta[property='og:title']",
            og_description="meta[property='og:description']",
            og_image="meta[property='og:image']",
            og_url="meta[property='og:url']",
            canonical="link[rel='canonical']",
            exclude=[
                "script, style, noscript",
                ".ad, .advertisement, [class*='ad']",
                ".header, .footer, nav",
                "button, form",
                ".sidebar, .comments",
            ],
        )


# ---------------------------------------------------------------------------
# goquery-shaped primitives
# ---------------------------------------------------------------------------


def _sel_text(nodes: list[Element]) -> str:
    """goquery Selection.Text(): subtree text of every node, no separator."""
    return "".join(n.text() for n in nodes)


def child_text(root: Element, selector: str) -> str:
    """colly HTMLElement.ChildText: TrimSpace(Find(sel).Text())."""
    return _sel_text(find(root, selector)).strip()


def child_attr(root: Element, selector: str, attr: str) -> str:
    """colly HTMLElement.ChildAttr: first match's attr, TrimSpace'd."""
    nodes = find(root, selector)
    if not nodes:
        return ""
    v = nodes[0].attrs.get(attr)
    return v.strip() if v is not None else ""


# ---------------------------------------------------------------------------
# cleanText (page/extractor.go:16-57)
# ---------------------------------------------------------------------------

# Go RE2 `\s` is ASCII-only [\t\n\f\r ]; Python's `\s` is Unicode-wide, so
# the Go class is spelled out to stay byte-identical.
_GO_WS = r"[\t\n\f\r ]"
_JS_PATTERNS = [
    # RE2 '.' does not match newline; Python default matches Go here.
    re.compile(r"(?i)<script[^>]*>.*?</script>"),
    re.compile(r"(?i)document\.addEventListener[^)]*\)"),
    re.compile(r"(?i)function" + _GO_WS + r"*\([^)]*\)" + _GO_WS + r"*\{[^}]*\}"),
    re.compile(r"(?i)\.replaceWith\([^)]*\)"),
    re.compile(r"(?i)\.cloneNode\([^)]*\)"),
    re.compile(r"(?i)template\.content"),
    re.compile(r"(?i)\.dataset\.[a-zA-Z]+"),
    re.compile(r"(?i)\.parentElement"),
    re.compile(r"(?i)getElementById\([^)]*\)"),
    re.compile(r"(?i)querySelector\([^)]*\)"),
]
_WS_RE = re.compile(_GO_WS + "+")
_NL_RE = re.compile(r"\n{3,}")  # dead after _WS_RE; replicated verbatim


def clean_text(text: str) -> str:
    """page/extractor.go:37-57, pattern-for-pattern (incl. the dead
    newline rule — the reference collapses all whitespace first)."""
    if text == "":
        return ""
    for pat in _JS_PATTERNS:
        text = pat.sub("", text)
    text = _WS_RE.sub(" ", text)
    text = _NL_RE.sub("\n\n", text)
    return text.strip()


# ---------------------------------------------------------------------------
# extractText / extractTextFromContainer / extractAttr / extractMeta
# ---------------------------------------------------------------------------


def extract_text_article(root: Element, selector: str) -> str:
    """articles/extractor.go:20-46 — comma-split selectors, first
    non-empty wins; ChildText then Find().First().Text()."""
    if not selector:
        return ""
    for sel in selector.split(","):
        sel = sel.strip()
        if not sel:
            continue
        text = child_text(root, sel)
        if text:
            return text.strip()
        nodes = find(root, sel)
        if nodes:
            text = nodes[0].text()
            if text:
                return text.strip()
    return ""


def extract_text_page(root: Element, selector: str) -> str:
    """page/extractor.go:61-81 — like the article variant but piping
    through cleanText, and no Find().First() second chance."""
    if not selector:
        return ""
    for sel in selector.split(","):
        sel = sel.strip()
        if not sel:
            continue
        text = child_text(root, sel)
        if text:
            cleaned = clean_text(text)
            if cleaned:
                return cleaned
    return ""


def _remove_all(nodes: list[Element]) -> None:
    for n in nodes:
        n.remove()


def extract_text_from_container(
    root: Element,
    container_selector: str,
    excludes: list[str],
    *,
    clean: bool,
) -> str:
    """articles/extractor.go:49-85 (clean=False) and
    page/extractor.go:84-120 (clean=True). DESTRUCTIVE: excludes are
    Remove()d from the shared tree before serialization."""
    if not container_selector:
        return ""
    for sel in container_selector.split(","):
        sel = sel.strip()
        if not sel:
            continue
        containers = find(root, sel)
        if not containers:
            continue
        container = containers[0]
        for ex in excludes or []:
            if ex:
                _remove_all(find(container, ex))
        text = container.text()
        if text:
            out = clean_text(text) if clean else text.strip()
            if out:
                return out
    return ""


def extract_attr(root: Element, selector: str, attr: str) -> str:
    """articles/extractor.go:89-106 == page/extractor.go:123-140."""
    if not selector or not attr:
        return ""
    for sel in selector.split(","):
        sel = sel.strip()
        if not sel:
            continue
        v = child_attr(root, sel, attr)
        if v:
            return v.strip()
    return ""


def extract_meta(root: Element, prop: str) -> str:
    """meta[property='X'] content (articles/extractor.go:109-115)."""
    if not prop:
        return ""
    return child_attr(root, f"meta[property='{prop}']", "content")


def extract_meta_name(root: Element, name: str) -> str:
    """meta[name='X'] content (articles/extractor.go:118-124)."""
    if not name:
        return ""
    return child_attr(root, f"meta[name='{name}']", "content")


def apply_excludes(root: Element, excludes: list[str]) -> None:
    """articles/extractor.go:181-187 — destructive tree mutation."""
    for ex in excludes or []:
        if ex:
            _remove_all(find(root, ex))


# ---------------------------------------------------------------------------
# parseDate (articles/extractor.go:127-169) — Go layout cascade
# ---------------------------------------------------------------------------

_UTC = timezone.utc


def _go_layout_to_regex(layout: str) -> tuple[re.Pattern, list[str]]:
    """Translate a Go reference-time layout into a regex with named
    groups. Supports the tokens appearing in the reference's list."""
    tokens = [
        ("2006", r"(?P<Y>\d{4})"),
        (".999999999", r"(?:\.(?P<f>\d{1,9}))?"),
        ("January", r"(?P<bmon>[A-Za-z]+)"),
        ("Monday", r"[A-Za-z]+"),
        ("Jan", r"(?P<bmon>[A-Za-z]{3})"),
        ("Mon", r"[A-Za-z]{3}"),
        ("01", r"(?P<m>\d{2})"),
        ("02", r"(?P<d>\d{2})"),
        ("_2", r"(?:\s(?P<d1>\d)|(?P<d2>\d{2}))"),
        ("15", r"(?P<H>\d{2})"),
        ("04", r"(?P<M>\d{2})"),
        ("05", r"(?P<S>\d{2})"),
        ("06", r"(?P<y>\d{2})"),
        ("Z07:00", r"(?P<tzz>Z|[+-]\d{2}:\d{2})"),
        ("-07:00", r"(?P<tzc>[+-]\d{2}:\d{2})"),
        ("-0700", r"(?P<tzn>[+-]\d{4})"),
        ("MST", r"(?P<tza>[A-Z]{3,5})"),
    ]
    out: list[str] = []
    i = 0
    groups: list[str] = []
    while i < len(layout):
        for tok, rx in tokens:
            if layout.startswith(tok, i):
                out.append(rx)
                groups.append(tok)
                i += len(tok)
                break
        else:
            out.append(re.escape(layout[i]))
            i += 1
    return re.compile("^" + "".join(out) + "$"), groups


_MONTHS = {
    m: i + 1
    for i, m in enumerate(
        ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
         "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
    )
}

# Ordered exactly as articles/extractor.go:133-154 (incl. the RFC850
# duplicates and the unreachable trailing RFC3339 retry at :164-166).
_GO_LAYOUTS = [
    "2006-01-02T15:04:05Z07:00",            # RFC3339
    "2006-01-02T15:04:05.999999999Z07:00",  # RFC3339Nano
    "2006-01-02T15:04:05Z07:00",
    "2006-01-02T15:04:05",
    "2006-01-02 15:04:05",
    "2006-01-02",
    "Mon, 02 Jan 2006 15:04:05 MST",        # RFC1123
    "Mon, 02 Jan 2006 15:04:05 -0700",      # RFC1123Z
    "Mon Jan _2 15:04:05 2006",             # ANSIC
    "Mon Jan _2 15:04:05 MST 2006",         # UnixDate
    "Mon Jan 02 15:04:05 -0700 2006",       # RubyDate
    "02 Jan 06 15:04 MST",                  # RFC822
    "02 Jan 06 15:04 -0700",                # RFC822Z
    "Monday, 02-Jan-06 15:04:05 MST",       # RFC850 (×3 in reference)
    "Monday, 02-Jan-06 15:04:05 MST",
    "Monday, 02-Jan-06 15:04:05 MST",
    "Mon, 02 Jan 2006 15:04:05 MST",
    "02 Jan 2006 15:04:05 MST",
    "2006-01-02T15:04:05-07:00",
    "2006-01-02T15:04:05+07:00",  # '+07:00' is a literal in Go layouts
]
_COMPILED_LAYOUTS = [_go_layout_to_regex(la) for la in _GO_LAYOUTS]


def _parse_with_layout(pat: re.Pattern, s: str) -> datetime | None:
    m = pat.match(s)
    if m is None:
        return None
    g = m.groupdict()
    year = int(g["Y"]) if g.get("Y") else 2000 + int(g.get("y") or 0)
    if g.get("y") and int(g["y"]) >= 69:  # Go 2-digit year pivot
        year = 1900 + int(g["y"])
    if g.get("m"):
        month = int(g["m"])
    elif g.get("bmon"):
        month = _MONTHS.get(g["bmon"][:3].title(), 0)
        if month == 0:
            return None
    else:
        month = 1
    day = int(g.get("d") or g.get("d1") or g.get("d2") or 1)
    hour = int(g.get("H") or 0)
    minute = int(g.get("M") or 0)
    sec = int(g.get("S") or 0)
    micro = 0
    if g.get("f"):
        micro = int(g["f"].ljust(9, "0")[:6])
    tz = _UTC  # Go: no zone info in layout → UTC; MST name → offset 0
    off = g.get("tzz") or g.get("tzc")
    if off and off != "Z":
        sign = 1 if off[0] == "+" else -1
        tz = timezone(sign * timedelta(hours=int(off[1:3]), minutes=int(off[4:6])))
    num = g.get("tzn")
    if num:
        sign = 1 if num[0] == "+" else -1
        tz = timezone(sign * timedelta(hours=int(num[1:3]), minutes=int(num[3:5])))
    try:
        return datetime(year, month, day, hour, minute, sec, micro, tzinfo=tz)
    except ValueError:
        return None


def parse_date(date_str: str) -> datetime | None:
    """articles/extractor.go:127-169 — ordered layout cascade, first
    match wins; returns None for the Go zero time. Result normalized
    to UTC (Go keeps the offset; the instant is identical)."""
    if not date_str:
        return None
    date_str = date_str.strip()
    for pat, _ in _COMPILED_LAYOUTS:
        dt = _parse_with_layout(pat, date_str)
        if dt is not None:
            return dt.astimezone(_UTC)
    return None


# ---------------------------------------------------------------------------
# generateID (articles/extractor.go:172-178)
# ---------------------------------------------------------------------------

import hashlib  # noqa: E402


def generate_id(url: str) -> str:
    if not url:
        return ""
    return hashlib.sha256(url.encode("utf-8")).hexdigest()


# ---------------------------------------------------------------------------
# published-date strategies (articles/extractor.go:399-670)
# ---------------------------------------------------------------------------

_ARTICLE_JSONLD_TYPES = {"NewsArticle", "Article", "BlogPosting", "ScholarlyArticle", "Report"}
_SCHEMA_ARTICLE_TYPES = [
    "http://schema.org/NewsArticle",
    "http://schema.org/Article",
    "https://schema.org/NewsArticle",
    "https://schema.org/Article",
]


def _date_from_jsonld_obj(obj: dict) -> datetime | None:
    for key in ("datePublished", "publishedDate", "date"):
        v = obj.get(key)
        if isinstance(v, str):
            dt = parse_date(v)
            if dt is not None:
                return dt
    return None


def _date_from_jsonld_text(text: str) -> datetime | None:
    try:
        data = json.loads(text)
    except (ValueError, TypeError):
        return None
    items = data if isinstance(data, list) else [data] if isinstance(data, dict) else []
    for item in items:
        if not isinstance(item, dict):
            continue
        # @graph walk only when @type absent (extractor.go:560-582)
        if not isinstance(item.get("@type"), str):
            graph = item.get("@graph")
            if isinstance(graph, list):
                for gi in graph:
                    if isinstance(gi, dict):
                        dt = _date_from_jsonld_obj(gi)
                        if dt is not None:
                            return dt
        tv = item.get("@type")
        if isinstance(tv, str) and tv in _ARTICLE_JSONLD_TYPES:
            dt = _date_from_jsonld_obj(item)
            if dt is not None:
                return dt
    return None


def extract_published_date(root: Element, sel: ArticleSelectors) -> datetime | None:
    # Strategy 1: JSON-LD
    if sel.json_ld:
        for script in find(root, sel.json_ld):
            txt = script.text()
            if txt:
                dt = _date_from_jsonld_text(txt)
                if dt is not None:
                    return dt
    # Strategy 2: schema.org microdata
    for at in _SCHEMA_ARTICLE_TYPES:
        arts = find(root, f"[itemtype='{at}']")
        if not arts:
            continue
        dp = find(arts[0], "[itemprop='datePublished']")
        if dp:
            node = dp[0]
            ds = node.attrs.get("content") or node.attrs.get("datetime") or node.text()
            if ds:
                dt = parse_date(ds)
                if dt is not None:
                    return dt
    # Strategy 3: published_time selector (datetime attr, then text)
    s = extract_attr(root, sel.published_time, "datetime")
    if s:
        dt = parse_date(s)
        if dt is not None:
            return dt
    s = extract_text_article(root, sel.published_time)
    if s:
        dt = parse_date(s)
        if dt is not None:
            return dt
    # Strategy 4: og article:published_time
    s = extract_meta(root, "article:published_time")
    if s:
        dt = parse_date(s)
        if dt is not None:
            return dt
    # Strategy 5: meta name=date/publishdate/pubdate
    for name in ("date", "publishdate", "pubdate"):
        s = extract_meta_name(root, name)
        if s:
            dt = parse_date(s)
            if dt is not None:
                return dt
    # Strategy 6: time[datetime]
    s = extract_attr(root, "time", "datetime")
    if s:
        dt = parse_date(s)
        if dt is not None:
            return dt
    return None


# ---------------------------------------------------------------------------
# extractArticle (articles/extractor.go:190-397) — one mutable DOM pass
# ---------------------------------------------------------------------------


def _parse_comma_list(s: str) -> list[str]:
    return [p.strip() for p in s.split(",") if p.strip()]


def extract_article(root: Element, sel: ArticleSelectors, source_url: str) -> dict:
    """Field assembly in the reference's exact order (mutations from
    exclude-removal are observed by later stages, as in Go)."""
    data: dict = {"source": source_url}

    # extractBasicFields (:222-241)
    extracted_title = extract_text_article(root, sel.title)
    og_title = extract_meta(root, "og:title")
    data["title"] = og_title if og_title else extracted_title
    intro = extract_text_article(root, sel.intro)
    if not intro:
        intro = extract_meta(root, "og:description")
    data["intro"] = intro

    # extractBodyContent (:244-267)
    body = ""
    if sel.container:
        body = extract_text_from_container(root, sel.container, sel.exclude, clean=False)
        if not body:
            apply_excludes(root, sel.exclude)
            body = extract_text_article(root, sel.body)
    else:
        apply_excludes(root, sel.exclude)
        body = extract_text_article(root, sel.body)
    if not body:
        body = extract_text_from_container(
            root, "article, main, .article-content, .article-body", sel.exclude, clean=False
        )
    data["body"] = body

    # extractMetadata (:270-283)
    author = extract_text_article(root, sel.author)
    if not author:
        author = extract_meta(root, "article:author")
    data["author"] = author
    byline_name = extract_text_article(root, sel.byline_name)
    if not byline_name:
        byline_name = extract_text_article(root, sel.byline)
    data["byline_name"] = byline_name
    data["published_date"] = extract_published_date(root, sel)

    # extractTags (:286-327)
    tags: list[str] = []
    keywords: list[str] = []
    kw_str = extract_text_article(root, sel.keywords)
    if not kw_str:
        kw_str = extract_meta_name(root, "keywords")
    if kw_str:
        kws = _parse_comma_list(kw_str)
        keywords.extend(kws)
        tags.extend(kws)
    tags_str = extract_text_article(root, sel.tags)
    if tags_str:
        kwset = set(keywords)
        tagset = set(tags)
        for t in _parse_comma_list(tags_str):
            if t and t not in kwset and t not in tagset:
                tags.append(t)
                tagset.add(t)
    data["tags"] = tags
    data["keywords"] = keywords

    # extractOpenGraphMetadata (:352-367)
    og_t = extract_meta(root, "og:title")
    data["og_title"] = og_t if og_t else data["title"]
    og_d = extract_meta(root, "og:description")
    data["og_description"] = og_d if og_d else data["intro"]
    data["og_image"] = extract_meta(root, "og:image")
    data["og_url"] = extract_meta(root, "og:url")
    data["og_type"] = extract_meta(root, "og:type")
    data["og_site_name"] = extract_meta(root, "og:site_name")

    # extractOtherMetadata (:370-397)
    desc = extract_meta_name(root, "description")
    data["description"] = desc if desc else data["intro"]
    section = extract_text_article(root, sel.section)
    if not section:
        section = extract_meta(root, "article:section")
    data["section"] = section
    category = extract_text_article(root, sel.category)
    if not category:
        category = extract_meta(root, "article:section")
    data["category"] = category
    canonical = extract_attr(root, sel.canonical, "href")
    data["canonical_url"] = canonical if canonical else source_url

    # extractArticleID (:673-688)
    aid = extract_attr(root, sel.article_id, "data-article-id")
    if not aid:
        aid = extract_attr(root, sel.article_id, "data-post-id")
    if not aid:
        aid = extract_attr(root, sel.article_id, "id")
    if not aid:
        aid = generate_id(source_url)
    data["id"] = aid
    return data


# ---------------------------------------------------------------------------
# extractPage (page/extractor.go:197-336)
# ---------------------------------------------------------------------------


def extract_page(root: Element, sel: PageSelectors, source_url: str) -> dict:
    data: dict = {"url": source_url, "id": generate_id(source_url)}

    # extractPageTitle (:226-236)
    title = extract_text_page(root, sel.title)
    if not title:
        title = extract_meta(root, "og:title")
    if not title:
        title = clean_text(child_text(root, "title"))
    data["title"] = title

    # extractPageContent (:239-267)
    content = ""
    if sel.container:
        content = extract_text_from_container(root, sel.container, sel.exclude, clean=True)
    if not content:
        apply_excludes(root, sel.exclude)
        content = extract_text_page(root, sel.content)
    if not content:
        content = extract_text_from_container(root, "main", sel.exclude, clean=True)
    if not content:
        content = extract_text_from_container(root, "article", sel.exclude, clean=True)
    if not content:
        apply_excludes(root, sel.exclude)
        content = clean_text(child_text(root, "body"))
    data["content"] = content

    # extractPageDescriptionKeywords (:270-291)
    desc = extract_text_page(root, sel.description)
    if not desc:
        desc = extract_meta_name(root, "description")
    if not desc:
        desc = extract_meta(root, "og:description")
    data["description"] = desc
    kw_str = extract_text_page(root, sel.keywords)
    if not kw_str:
        kw_str = extract_meta_name(root, "keywords")
    data["keywords"] = [k.strip() for k in kw_str.split(",")] if kw_str else []

    # extractPageOpenGraphMetadata (:294-320)
    og_t = extract_text_page(root, sel.og_title)
    if not og_t:
        og_t = extract_meta(root, "og:title")
    if not og_t:
        og_t = data["title"]
    data["og_title"] = og_t
    og_d = extract_text_page(root, sel.og_description)
    if not og_d:
        og_d = extract_meta(root, "og:description")
    if not og_d:
        og_d = data["description"]
    data["og_description"] = og_d
    og_i = extract_text_page(root, sel.og_image)
    if not og_i:
        og_i = extract_meta(root, "og:image")
    data["og_image"] = og_i
    og_u = extract_text_page(root, sel.og_url)
    if not og_u:
        og_u = extract_meta(root, "og:url")
    data["og_url"] = og_u

    # extractPageCanonicalURL (:323-336)
    canon = extract_attr(root, sel.canonical, "href")
    if not canon:
        canon = extract_attr(root, "link[rel='canonical']", "href")
    if not canon:
        canon = source_url
    data["canonical_url"] = canon
    return data


# ---------------------------------------------------------------------------
# DetectContentType (html_processor.go:115-169)
# ---------------------------------------------------------------------------

MIN_ARTICLE_BODY_LENGTH = 200  # internal/constants/constants.go:249


def detect_content_type(root: Element, sel: ArticleSelectors | None) -> str:
    og = find(root, "meta[property='og:type']")
    og_type = og[0].attrs.get("content", "") if og else ""
    if og_type == "article":
        return "article"
    if sel is None or not sel.body:
        return "page"
    body_nodes = find(root, sel.body)
    if not body_nodes:
        return "page"
    body_text = _sel_text(body_nodes).strip()
    # Go len() is bytes
    if len(body_text.encode("utf-8")) < MIN_ARTICLE_BODY_LENGTH:
        return "page"
    if sel.title:
        titles = find(root, sel.title)
        if not titles:
            return "page"
        if not _sel_text(titles).strip():
            return "page"
    return "article"


# ---------------------------------------------------------------------------
# Link discovery (crawler.go:346-348 → link_handler.go:26-58)
# ---------------------------------------------------------------------------


def extract_links(root: Element) -> list[str]:
    """All a[href] href attributes in document order. Run AFTER
    extraction on the same tree: colly registers OnHTML("html") before
    OnHTML("a[href]") (crawler.go:291 vs :346), so anchors removed by
    exclude-selectors are never discovered."""
    out = []
    for a in find(root, "a[href]"):
        href = a.attrs.get("href")
        if href:
            out.append(href)
    return out


def extract_anchor_texts(root: Element) -> list[tuple[str, str]]:
    """(href, anchor-text) for every a[href] in document order — the
    inbound-anchor evidence stream (what goquery's
    ``Selection.Text()`` would give per anchor). Anchor text is the
    element's subtree text, whitespace-squeezed and trimmed. Separate
    from :func:`extract_links` so the crawl kernel's output schema is
    untouched; used by graphrank.anchor_pairs."""
    out = []
    for a in find(root, "a[href]"):
        href = a.attrs.get("href")
        if href:
            out.append((href, re.sub(r"\s+", " ", a.text()).strip()))
    return out


# ---------------------------------------------------------------------------
# Fused single-parse pass (the UDF kernel)
# ---------------------------------------------------------------------------


def process_html(
    html: str,
    source_url: str,
    article_sel: ArticleSelectors,
    page_sel: PageSelectors,
    want_links: bool = True,
    meta_robots: bool = False,
) -> dict:
    """One parse per document, mirroring ProcessHTML (crawler.go:900-951):
    detect type → run the matching extractor (mutating the tree) → then
    discover links from the mutated tree. Returns
    ``{"content_type", "article"|None, "page"|None, "links", "noindex"}``.
    want_links=False skips link discovery — rounds at the crawl's depth
    bound can admit no children, so their (typically largest) tier
    neither computes nor ships the hrefs.

    ``meta_robots=True`` honors the page-level robots contract
    (robots.meta_directives is the standalone audit twin): the
    <meta name="robots"> tokens are read BEFORE the extractors mutate
    the tree (``none`` implies noindex+nofollow), a page-level
    nofollow discovers NO links, and rel="nofollow" anchors are
    skipped at discovery. Off (the default) the reference-parity
    behavior is byte-identical."""
    root = parse(html)
    noindex = nofollow_page = False
    if meta_robots:
        toks: set[str] = set()
        for m in find(root, "meta[name='robots']"):
            toks |= {
                t.strip().lower()
                for t in m.attrs.get("content", "").split(",")
            }
        noindex = "noindex" in toks or "none" in toks
        nofollow_page = "nofollow" in toks or "none" in toks
    ctype = detect_content_type(root, article_sel)
    article = page = None
    if ctype == "article":
        article = extract_article(root, article_sel, source_url)
    else:
        page = extract_page(root, page_sel, source_url)
    if not want_links or (meta_robots and nofollow_page):
        links = []
    elif meta_robots:
        links = [
            a.attrs.get("href")
            for a in find(root, "a[href]")
            if a.attrs.get("href")
            and "nofollow" not in a.attrs.get("rel", "").lower().split()
        ]
    else:
        links = extract_links(root)
    return {
        "content_type": ctype,
        "article": article,
        "page": page,
        "links": links,
        "noindex": noindex,
    }
