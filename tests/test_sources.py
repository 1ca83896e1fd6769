"""Source configs (S4), URL→source matching (J1), per-source selectors.

Reference: internal/config/types/source.go, selectors.go, rules.go;
matching internal/content/articles/service.go:194-232.
"""

from __future__ import annotations

import textwrap

import pytest

from gocrawl_spark import sources as src
from gocrawl_spark.extract import ArticleSelectors

YAML = textwrap.dedent(
    """
    sources:
      - name: News Site
        url: https://news.example.com
        rate_limit: 5s
        max_depth: 2
        selectors:
          article:
            title: h1.headline
            body: div.story-body
          page:
            title: h1.headline
            content: main.page
      - name: Blog
        url: https://blog.example.org
        allowed_domains: ["*.example.org"]
        rate_limit: 500ms
        parallelism: 4
        rules:
          - pattern: "/draft/"
            action: disallow
            priority: 8
    """
)


@pytest.fixture()
def sources_file(tmp_path):
    p = tmp_path / "sources.yml"
    p.write_text(YAML)
    return str(p)


def test_load_and_defaults(sources_file):
    ss = src.load_sources(sources_file)
    assert [s.name for s in ss] == ["News Site", "Blog"]
    news, blog = ss
    assert news.rate_limit_ms == 5000
    assert news.max_depth == 2
    # allowed_domains defaults to the source URL host (sources.go:360-369)
    assert news.allowed_domains == ["news.example.com"]
    # configured selector fields override; unconfigured keep defaults
    assert news.article_selectors.title == "h1.headline"
    assert news.article_selectors.container == ArticleSelectors.default().container
    assert blog.rate_limit_ms == 500 and blog.parallelism == 4
    assert blog.rules[0].action == "disallow"


def test_duration_parse():
    assert src.parse_duration_ms("2s") == 2000
    assert src.parse_duration_ms("1m30s") == 90000
    assert src.parse_duration_ms("250ms") == 250
    assert src.parse_duration_ms(None) == 2000
    with pytest.raises(ValueError):
        src.parse_duration_ms("fast")


def test_match_source(sources_file):
    ss = src.load_sources(sources_file)
    assert src.match_source(ss, "news.example.com").name == "News Site"
    assert src.match_source(ss, "NEWS.example.com").name == "News Site"
    # *.example.org wildcard
    assert src.match_source(ss, "sub.example.org").name == "Blog"
    assert src.match_source(ss, "nowhere.net") is None


def test_rule_validation():
    with pytest.raises(ValueError):
        src.Rule(pattern="", action="allow").validate()
    with pytest.raises(ValueError):
        src.Rule(pattern="/x/", action="maybe").validate()


def test_selector_map_drives_extraction(spark, sources_file):
    """A host-specific title selector changes the extracted title."""
    from gocrawl_spark import udfs

    ss = src.load_sources(sources_file)
    smap = src.selector_map(ss)
    html = (
        b"<html><head><title>T</title></head><body>"
        b"<h1 class='headline'>Custom Headline</h1><h1>Generic H1</h1>"
        b"<main class='page'>body text here</main></body></html>"
    )
    corpus = spark.createDataFrame(
        [
            ("https://news.example.com/page/1", html),
            ("https://other.example.net/page/1", html),
        ],
        "url string, html binary",
    )
    rows = {r.url: r for r in udfs.extract_pages(corpus, sel_map=smap).collect()}
    assert rows["https://news.example.com/page/1"].page.title == "Custom Headline"
    # unmatched host uses the default page selectors ("h1, title" —
    # ChildText concatenates every match, goquery semantics)
    assert rows["https://other.example.net/page/1"].page.title == "Custom HeadlineGeneric H1"
    assert rows["https://news.example.com/page/1"].page.content == "body text here"


def test_host_policy_df(spark, sources_file):
    ss = src.load_sources(sources_file)
    pol = {r.domain: r for r in src.host_policy_df(spark, ss).collect()}
    assert pol["news.example.com"].delay_ms == 5000
    assert pol["example.org"].parallelism == 4


def test_load_sources_from_rest_api(tmp_path):
    """S4 REST loader (the reference's primary path, apiclient
    client.go:68-80): an http endpoint serving the ListSourcesResponse
    shape must yield the same sources as the equivalent YAML file, and
    must drive selector/policy derivation identically."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    payload = {
        "sources": [
            {
                "name": "Example News",
                "url": "https://news.example.com",
                "rate_limit": "500ms",
                "max_depth": 2,
                "selectors": {"article": {"title": "h1.headline"}},
            },
            {"name": "Other", "url": "https://other.example.com"},
        ],
        "count": 2,
    }

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def do_GET(self):
            body = _json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        via_api = src.load_sources(
            f"http://127.0.0.1:{srv.server_address[1]}/api/v1/sources"
        )
        yml = tmp_path / "sources.json"
        yml.write_text(_json.dumps(payload))
        via_file = src.load_sources(str(yml))
        assert via_api == via_file
        assert [s.name for s in via_api] == ["Example News", "Other"]
        assert via_api[0].rate_limit_ms == 500
        assert via_api[0].article_selectors.title == "h1.headline"
        assert via_api[0].allowed_domains == ["news.example.com"]
        sel = src.selector_map(via_api)
        assert sel["news.example.com"][0].title == "h1.headline"
    finally:
        srv.shutdown()


def test_generator_name_index_escape_helpers():
    """yaml.go:120-175 naming + escaping parity."""
    from gocrawl_spark import generator as g

    assert g.generate_source_name("www.example.com") == "Example"
    assert g.generate_source_name("news.example.org") == "Example"
    assert g.generate_source_name("example.ca") == "Example CA"
    assert g.generate_source_name("localhost") == "Localhost"
    assert g.generate_index_name("www.mid-north.example.com", "articles") \
        == "mid_north_example_com_articles"
    assert g.escape_yaml_string('a "b"\nc\\d') == 'a \\"b\\"\\nc\\\\d'


def test_generator_extract_value_modes():
    """validate.go:203-283: meta content, whitelisted attrs, comma
    chain first-non-empty text."""
    from gocrawl_spark import generator as g
    from gocrawl_spark.htmlmini import Selection, parse

    doc = Selection.root(parse(
        "<html><head><meta property='og:title' content=' T '></head>"
        "<body><time datetime='2024-01-02'>x</time>"
        "<p class='a'></p><p class='b'> hello </p>"
        "<img src='/i.jpg' onerror='x'></body></html>"
    ))
    assert g.extract_value(doc, "meta[property='og:title']") == "T"
    assert g.extract_value(doc, "time[datetime]") == "2024-01-02"
    assert g.extract_value(doc, "img[src]") == "/i.jpg"
    # non-whitelisted attribute never extracts
    assert g.extract_value(doc, "img[onerror]") == ""
    assert g.extract_value(doc, ".a, .b") == "hello"
    assert g.extract_value(doc, ".missing") == ""
    assert g.extract_value(doc, "") == ""
