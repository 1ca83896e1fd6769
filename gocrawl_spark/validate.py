"""Article validation gates V1–V9.

Pure-Python port of the reference validator
(/root/reference/internal/content/articles/validator.go) plus the
pre-index normalization (/root/reference/internal/domain/article.go:110-188).
Check order and first-failure-wins semantics match ValidateArticle
(validator.go:86-149). Length checks are byte lengths (Go ``len``).
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone
from urllib.parse import urlsplit

# validator.go:58-69 — note "/page/" appears twice in the reference list.
SKIP_PATTERNS = [
    "/category/", "/tag/", "/page/", "/author/", "/archive/",
    "/feed/", "/rss/", "/search/", "?page=", "/page/",
]

# validator.go:72-83
GENERIC_TITLES = [
    "latest headlines", "latest news", "news archive", "headlines",
    "news", "articles", "all articles", "category", "tag", "archive",
]

MIN_BODY_LENGTH_FOR_CONCATENATION = 200  # validator.go:222
MIN_SEPARATOR_COUNT = 3
MIN_HEADLINE_LIKE_COUNT = 5
MIN_CONTENT_LENGTH = 100
MAX_CONTENT_LENGTH = 100000
MIN_WORD_COUNT = 50

_SEPARATORS = ["read more", "continue reading", "full story", "view article"]

_HTML_TAG_RE = re.compile(r"<[^>]*>")
_GO_WS_RE = re.compile(r"[\t\n\f\r ]+")


def _blen(s: str) -> int:
    return len(s.encode("utf-8"))


def calculate_word_count(text: str) -> int:
    """validator.go:386-402 — strip tags, collapse whitespace, Fields."""
    if not text:
        return 0
    cleaned = _HTML_TAG_RE.sub(" ", text)
    cleaned = _GO_WS_RE.sub(" ", cleaned).strip()
    return len(cleaned.split())


def has_concatenated_content(body: str) -> bool:
    """validator.go:231-282."""
    if _blen(body) < MIN_BODY_LENGTH_FOR_CONCATENATION:
        return False
    body_lower = body.lower()
    sep_count = sum(body_lower.count(s) for s in _SEPARATORS)
    if sep_count >= MIN_SEPARATOR_COUNT:
        return True
    headline_like = 0
    for line in body.split("\n"):
        line = line.strip()
        n = _blen(line)
        if 20 <= n <= 100 and line[-1:] in ".?!":
            nf = len(line.split())
            if 3 <= nf <= 15:
                headline_like += 1
    return headline_like >= MIN_HEADLINE_LIKE_COUNT


def is_category_page(article: dict) -> tuple[bool, str]:
    """validator.go:152-219. Returns (is_category, reason)."""
    source_url = article.get("source") or article.get("canonical_url") or ""
    try:
        parsed = urlsplit(source_url)
        path = parsed.path.lower()
        query = parsed.query.lower()
        for pattern in SKIP_PATTERNS:
            if pattern in path or pattern in query:
                return True, f"URL matches skip pattern: {pattern}"
        if path != "/" and path.endswith("/"):
            return True, "URL ends with trailing slash (likely category page)"
    except ValueError:
        pass
    title_lower = (article.get("title") or "").strip().lower()
    for generic in GENERIC_TITLES:
        if (
            title_lower == generic
            or title_lower.startswith(generic + " |")
            or title_lower.endswith("| " + generic)
        ):
            return True, f"Generic title detected: {article.get('title')}"
    if has_concatenated_content(article.get("body") or ""):
        return True, "Content appears to be concatenated snippets from multiple articles (body)"
    intro = article.get("intro") or ""
    if intro and has_concatenated_content(intro):
        return True, "Content appears to be concatenated snippets from multiple articles (intro)"
    desc = article.get("description") or ""
    if desc and has_concatenated_content(desc):
        return True, "Content appears to be concatenated snippets from multiple articles (description)"
    return False, ""


_MIN_DATE = datetime(2000, 1, 1, tzinfo=timezone.utc)


def validate_article(article: dict, now: datetime | None = None) -> tuple[bool, str]:
    """ValidateArticle (validator.go:86-149): category-page → date →
    content → title → word count; first failure wins.

    ``now`` is injectable so Spark runs are deterministic (evaluated
    once on the driver, broadcast to executors)."""
    if article is None:
        return False, "article is nil"
    cat, reason = is_category_page(article)
    if cat:
        return False, reason
    # V3 date sanity (validator.go:285-314)
    pd = article.get("published_date")
    if pd is None:
        return False, "Published date is zero-value (0001-01-01T00:00:00Z)"
    if now is None:
        now = datetime.now(timezone.utc)
    if pd.tzinfo is None:
        pd = pd.replace(tzinfo=timezone.utc)
    if pd < _MIN_DATE:
        return False, "Published date is before 2000"
    if pd > now + timedelta(days=1):
        return False, "Published date is too far in future"
    # V4 content length (validator.go:317-337)
    body = (article.get("body") or "").strip()
    n = _blen(body)
    if n < MIN_CONTENT_LENGTH:
        return False, f"Content too short: {n} characters (minimum {MIN_CONTENT_LENGTH})"
    if n > MAX_CONTENT_LENGTH:
        return False, f"Content too long: {n} characters (maximum {MAX_CONTENT_LENGTH})"
    # V5 title quality (validator.go:340-362)
    title = (article.get("title") or "").strip()
    if not title:
        return False, "Title is empty"
    if title.lower() in GENERIC_TITLES:
        return False, f"Generic title: {title}"
    # V6 word count (validator.go:365-383)
    wc = article.get("word_count") or 0
    if wc == 0:
        wc = calculate_word_count(article.get("body") or "")
    if wc < MIN_WORD_COUNT:
        return False, f"Word count too low: {wc} words (minimum {MIN_WORD_COUNT})"
    return True, ""


def clean_category(category: str) -> list[str]:
    """validator.go:405-450."""
    if not category:
        return []
    category = _GO_WS_RE.sub(" ", category).strip()
    categories = [category]
    for sep in [",", "|", "/", "\\", "•", "·"]:
        new_categories: list[str] = []
        for cat in categories:
            for part in cat.split(sep):
                part = part.strip()
                if part:
                    new_categories.append(part)
        categories = new_categories
    seen: set[str] = set()
    result: list[str] = []
    for cat in categories:
        low = cat.strip().lower()
        if low and low not in seen:
            seen.add(low)
            result.append(cat.strip())
    if len(result) == 1 and category.count(result[0]) > 3:
        return []
    return result


def _clean_string(s: str | None) -> str:
    s = s or ""
    return "" if not s.strip() else s


def _norm_array(arr: list[str] | None) -> list[str] | None:
    """article.go:169-188 — trim, drop empties, dedupe keeping first,
    nil when empty."""
    if not arr:
        return None
    seen: set[str] = set()
    out: list[str] = []
    for item in arr:
        item = item.strip()
        if item and item not in seen:
            seen.add(item)
            out.append(item)
    return out or None


def prepare_for_indexing(a: dict) -> dict:
    """PrepareForIndexing (article.go:111-166) over an article dict."""
    a = dict(a)
    for f in ("author", "byline_name", "intro", "description", "og_image", "canonical_url"):
        a[f] = _clean_string(a.get(f))
    strip = lambda k: (a.get(k) or "").strip()  # noqa: E731
    if strip("og_title") == strip("title"):
        a["og_title"] = ""
    if strip("og_description") in (strip("description"), strip("intro")):
        a["og_description"] = ""
    if strip("og_url") in (strip("canonical_url"), strip("source")):
        a["og_url"] = ""
    for f in ("og_title", "og_description", "og_url", "category", "section"):
        a[f] = _clean_string(a.get(f))
    a["tags"] = _norm_array(a.get("tags"))
    a["keywords"] = _norm_array(a.get("keywords"))
    return a
