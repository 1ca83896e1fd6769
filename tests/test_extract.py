"""Extraction kernel golden tests.

Expected values are hand-derived by applying the reference's extraction
rules (goquery Text/ChildText semantics, TrimSpace-only for articles,
cleanText for pages) to the fixture templates from
/root/reference/tests/helpers/fixtures.go:187-219.
"""

from datetime import datetime, timezone

from gocrawl_spark.extract import (
    ArticleSelectors,
    PageSelectors,
    clean_text,
    detect_content_type,
    extract_article,
    extract_links,
    extract_page,
    generate_id,
    parse_date,
    process_html,
)
from gocrawl_spark.htmlmini import parse


def page_html(title: str, body: str) -> str:
    # fixtures.go:187-201 (TestHTMLPage), byte-for-byte template
    return (
        "<!DOCTYPE html>\n<html>\n<head>\n\t<title>" + title + "</title>\n"
        '\t<meta name="description" content="Test page description">\n'
        "</head>\n<body>\n\t<main>\n\t\t<h1>" + title + "</h1>\n"
        '\t\t<div class="content">' + body + "</div>\n\t</main>\n</body>\n</html>"
    )


def article_html(title: str, body: str) -> str:
    # fixtures.go:203-219 (TestArticleHTML)
    return (
        "<!DOCTYPE html>\n<html>\n<head>\n\t<title>" + title + "</title>\n"
        '\t<meta name="description" content="Test article description">\n'
        "</head>\n<body>\n\t<article>\n\t\t<h1>" + title + "</h1>\n"
        '\t\t<div class="intro">Article introduction</div>\n'
        '\t\t<time datetime="2024-01-01">January 1, 2024</time>\n'
        '\t\t<div class="content">' + body + "</div>\n\t</article>\n</body>\n</html>"
    )


LONG_BODY = "This is the article body. " * 10  # 260 chars > 200


# ---------------------------------------------------------------- cleanText


def test_clean_text_collapse_and_trim():
    assert clean_text("  a \t b\n\nc  ") == "a b c"


def test_clean_text_js_patterns():
    s = "before <script src='x'>var a=1;</script> after document.addEventListener('c', f) end"
    assert clean_text(s) == "before after end"


def test_clean_text_go_ws_class_only():
    # Go RE2 \s is [\t\n\f\r ]; \xa0 must survive collapse
    assert clean_text("a\xa0b") == "a\xa0b"


def test_clean_text_newline_rule_is_dead():
    # whitespace collapse runs first, so \n{3,} never fires — verbatim port
    assert clean_text("a\n\n\n\nb") == "a b"


def test_clean_text_empty():
    assert clean_text("") == ""


# ---------------------------------------------------------------- parseDate


def test_parse_date_rfc3339():
    assert parse_date("2024-03-05T10:20:30Z") == datetime(2024, 3, 5, 10, 20, 30, tzinfo=timezone.utc)


def test_parse_date_rfc3339_offset_normalized_to_utc():
    dt = parse_date("2024-03-05T10:20:30+02:00")
    assert dt == datetime(2024, 3, 5, 8, 20, 30, tzinfo=timezone.utc)


def test_parse_date_date_only():
    assert parse_date("2024-01-01") == datetime(2024, 1, 1, tzinfo=timezone.utc)


def test_parse_date_space_format():
    assert parse_date("2024-01-02 03:04:05") == datetime(2024, 1, 2, 3, 4, 5, tzinfo=timezone.utc)


def test_parse_date_rfc1123():
    dt = parse_date("Mon, 02 Jan 2006 15:04:05 MST")
    assert dt == datetime(2006, 1, 2, 15, 4, 5, tzinfo=timezone.utc)


def test_parse_date_ruby():
    dt = parse_date("Mon Jan 02 15:04:05 -0700 2006")
    assert dt == datetime(2006, 1, 2, 22, 4, 5, tzinfo=timezone.utc)


def test_parse_date_garbage():
    assert parse_date("not a date") is None
    assert parse_date("") is None


def test_parse_date_nano():
    dt = parse_date("2024-03-05T10:20:30.123456789Z")
    assert dt == datetime(2024, 3, 5, 10, 20, 30, 123456, tzinfo=timezone.utc)


# ---------------------------------------------------------------- generateID


def test_generate_id_sha256_hex():
    import hashlib

    url = "https://example.com/a"
    assert generate_id(url) == hashlib.sha256(url.encode()).hexdigest()
    assert generate_id("") == ""


# ------------------------------------------------------- DetectContentType


def test_detect_og_type_article():
    html = (
        "<html><head><meta property='og:type' content='article'></head>"
        "<body><p>x</p></body></html>"
    )
    assert detect_content_type(parse(html), ArticleSelectors.default()) == "article"


def test_detect_page_when_no_article_body():
    root = parse(page_html("My Page", "Hello world content"))
    assert detect_content_type(root, ArticleSelectors.default()) == "page"


def test_detect_article_via_selectors():
    root = parse(article_html("T", LONG_BODY))
    assert detect_content_type(root, ArticleSelectors.default()) == "article"


def test_detect_200_byte_boundary():
    # html_processor.go:143: len(bodyText) < 200 → page; == 200 → article.
    # body selector 'article > div' matches .intro and .content; their
    # concatenated trimmed text must hit exactly 200 bytes.
    intro = "Article introduction"  # 20 chars; leading \n\t\t between divs
    # concatenation = intro + "\n\t\t" (time removed? no, time isn't a div —
    # text is .intro subtree + .content subtree only, no separator)
    body199 = "x" * (199 - len(intro))
    body200 = "x" * (200 - len(intro))
    assert (
        detect_content_type(parse(article_html("T", body199)), ArticleSelectors.default())
        == "page"
    )
    assert (
        detect_content_type(parse(article_html("T", body200)), ArticleSelectors.default())
        == "article"
    )


def test_detect_article_needs_title():
    html = (
        "<html><body><article><div class='c'>" + "x" * 300 + "</div></article></body></html>"
    )
    sel = ArticleSelectors.default()
    sel.body = "article > div"
    sel.title = "h1"
    assert detect_content_type(parse(html), sel) == "page"  # no h1


def test_detect_no_selectors_page():
    assert detect_content_type(parse("<html><body></body></html>"), None) == "page"


# ------------------------------------------------------------- extractPage


def test_extract_page_golden():
    url = "https://example.com/p1"
    data = extract_page(parse(page_html("My Page", "Hello world content")), PageSelectors.default(), url)
    assert data["title"] == "My Page"
    assert data["content"] == "My Page Hello world content"
    assert data["description"] == "Test page description"
    assert data["keywords"] == []
    assert data["og_title"] == "My Page"
    assert data["og_description"] == "Test page description"
    assert data["og_image"] == ""
    assert data["canonical_url"] == url
    assert data["id"] == generate_id(url)


def test_extract_page_excludes_are_destructive():
    html = (
        "<html><head><title>T</title></head><body><main><h1>T</h1>"
        "<div class='content'>keep</div>"
        "<script>junk()</script><nav><a href='/n'>nav</a></nav>"
        "<div class='ad'>AD</div></main></body></html>"
    )
    root = parse(html)
    data = extract_page(root, PageSelectors.default(), "https://e.com/")
    assert "junk" not in data["content"]
    assert "AD" not in data["content"]
    assert "nav" not in data["content"]
    # no whitespace between <h1> and <div> in the source → goquery
    # Text() concatenates with no separator
    assert data["content"] == "Tkeep"
    # the nav anchor was removed from the shared tree → not discoverable
    assert extract_links(root) == []


# ---------------------------------------------------------- extractArticle


def test_extract_article_golden():
    url = "https://example.com/article/1"
    root = parse(article_html("Title X", LONG_BODY))
    data = extract_article(root, ArticleSelectors.default(), url)
    assert data["title"] == "Title X"
    # container path: article.text() trimmed only (article path, no cleanText)
    assert data["body"] == (
        "Title X\n\t\tArticle introduction\n\t\tJanuary 1, 2024\n\t\t" + LONG_BODY.rstrip()
    )
    assert data["intro"] == ""  # p.lead absent, no og:description
    assert data["published_date"] == datetime(2024, 1, 1, tzinfo=timezone.utc)
    assert data["description"] == "Test article description"
    assert data["og_title"] == "Title X"  # falls back to title
    assert data["canonical_url"] == url
    assert data["id"] == generate_id(url)
    assert data["tags"] == [] and data["keywords"] == []


def test_extract_article_og_title_preferred():
    html = (
        "<html><head><meta property='og:title' content='OG Wins'></head>"
        "<body><article><h1>Selector Title</h1><div>" + LONG_BODY + "</div></article></body></html>"
    )
    data = extract_article(parse(html), ArticleSelectors.default(), "https://e.com/a")
    assert data["title"] == "OG Wins"


def test_extract_article_keywords_tags_dedup():
    html = (
        "<html><head><meta name='keywords' content='k1, k2 ,k1'></head>"
        "<body><article><h1>T</h1><div>" + LONG_BODY + "</div>"
        "<span class='tags'>k2, t1, t2, t1</span></article></body></html>"
    )
    data = extract_article(parse(html), ArticleSelectors.default(), "https://e.com/a")
    # keywords: comma-split trimmed, empties dropped, NO dedup in extractKeywords
    assert data["keywords"] == ["k1", "k2", "k1"]
    # tags: keywords first, then selector tags not already present (dedup'd)
    assert data["tags"] == ["k1", "k2", "k1", "t1", "t2"]


def test_extract_article_jsonld_date_priority():
    html = (
        "<html><head><script type='application/ld+json'>"
        '{"@type": "NewsArticle", "datePublished": "2023-06-15T08:00:00Z"}'
        "</script></head><body><article><h1>T</h1>"
        "<time datetime='2024-01-01'>x</time><div>" + LONG_BODY + "</div></article></body></html>"
    )
    data = extract_article(parse(html), ArticleSelectors.default(), "https://e.com/a")
    assert data["published_date"] == datetime(2023, 6, 15, 8, 0, 0, tzinfo=timezone.utc)


def test_extract_article_jsonld_graph_walk():
    html = (
        "<html><head><script type='application/ld+json'>"
        '{"@graph": [{"@type": "WebSite"}, {"datePublished": "2022-02-02"}]}'
        "</script></head><body><article><h1>T</h1><div>" + LONG_BODY + "</div></article></body></html>"
    )
    data = extract_article(parse(html), ArticleSelectors.default(), "https://e.com/a")
    assert data["published_date"] == datetime(2022, 2, 2, tzinfo=timezone.utc)


def test_extract_article_microdata_date():
    html = (
        "<html><body><article itemtype='http://schema.org/NewsArticle'>"
        "<h1>T</h1><span itemprop='datePublished' content='2021-05-04'>May 4</span>"
        "<div>" + LONG_BODY + "</div></article></body></html>"
    )
    data = extract_article(parse(html), ArticleSelectors.default(), "https://e.com/a")
    assert data["published_date"] == datetime(2021, 5, 4, tzinfo=timezone.utc)


def test_extract_article_id_from_data_attr():
    html = (
        "<html><body><article data-article-id='abc-1'><h1>T</h1>"
        "<div>" + LONG_BODY + "</div></article></body></html>"
    )
    sel = ArticleSelectors.default()
    sel.article_id = "article"
    data = extract_article(parse(html), sel, "https://e.com/a")
    assert data["id"] == "abc-1"


def test_extract_article_container_fallback_chain():
    # no <article>: container miss → excludes applied → body selector miss →
    # common-container fallback finds <main>
    html = "<html><body><main>" + LONG_BODY + "</main></body></html>"
    data = extract_article(parse(html), ArticleSelectors.default(), "https://e.com/a")
    assert data["body"] == LONG_BODY.rstrip()


# -------------------------------------------------------------- link pass


def test_process_html_single_pass_links_after_mutation():
    html = (
        "<html><head><title>T</title></head><body><main><h1>T</h1>"
        "<div class='content'><a href='/keep'>k</a>text here</div>"
        "<nav><a href='/lost'>l</a></nav></main>"
        "<a href='#frag'>f</a><a href='javascript:void(0)'>j</a>"
        "</body></html>"
    )
    res = process_html(html, "https://e.com/", ArticleSelectors.default(), PageSelectors.default())
    assert res["content_type"] == "page"
    # nav removed by page excludes before link pass; junk hrefs still
    # emitted here (filtered later by the frontier junk filter F2)
    assert res["links"] == ["/keep", "#frag", "javascript:void(0)"]


def test_process_html_article_keeps_nav_links():
    # default article excludes are empty → nav links survive for articles
    html = article_html("T", LONG_BODY + "<a href='/next'>next</a>")
    res = process_html(html, "https://e.com/a", ArticleSelectors.default(), PageSelectors.default())
    assert res["content_type"] == "article"
    assert res["links"] == ["/next"]


def test_process_html_meta_robots_tokens_and_rel():
    from gocrawl_spark.extract import (ArticleSelectors, PageSelectors,
                                       process_html)

    a_sel, p_sel = ArticleSelectors.default(), PageSelectors.default()
    html = (
        '<html><head><meta name="robots" content=" NOINDEX , nofollow ">'
        "</head><body>"
        '<a href="https://x.com/a" rel="nofollow">a</a>'
        '<a href="https://x.com/b">b</a></body></html>'
    )
    res = process_html(html, "https://x.com/", a_sel, p_sel, meta_robots=True)
    assert res["noindex"] is True and res["links"] == []  # page nofollow

    html2 = html.replace(' content=" NOINDEX , nofollow "', ' content="noindex"')
    res2 = process_html(html2, "https://x.com/", a_sel, p_sel, meta_robots=True)
    assert res2["noindex"] is True
    # rel="nofollow" anchor dropped, plain anchor kept
    assert res2["links"] == ["https://x.com/b"]

    # none implies both
    html3 = html.replace(' content=" NOINDEX , nofollow "', ' content="none"')
    res3 = process_html(html3, "https://x.com/", a_sel, p_sel, meta_robots=True)
    assert res3["noindex"] is True and res3["links"] == []

    # flag OFF: reference parity — directives ignored, all links kept
    res4 = process_html(html, "https://x.com/", a_sel, p_sel)
    assert res4["noindex"] is False
    assert res4["links"] == ["https://x.com/a", "https://x.com/b"]
