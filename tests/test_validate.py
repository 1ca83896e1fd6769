"""Validation gates V1–V9 (validator.go) + PrepareForIndexing tests."""

from datetime import datetime, timezone

from gocrawl_spark.validate import (
    calculate_word_count,
    clean_category,
    has_concatenated_content,
    prepare_for_indexing,
    validate_article,
)

NOW = datetime(2026, 8, 16, tzinfo=timezone.utc)
GOOD_DATE = datetime(2024, 1, 1, tzinfo=timezone.utc)
GOOD_BODY = "word " * 60  # 60 words, 300 chars


def good_article(**over):
    a = {
        "source": "https://e.com/article/1",
        "title": "A Real Title",
        "body": GOOD_BODY,
        "intro": "",
        "description": "",
        "published_date": GOOD_DATE,
        "word_count": 0,
        "canonical_url": "",
    }
    a.update(over)
    return a


def test_valid_article_passes():
    ok, reason = validate_article(good_article(), NOW)
    assert ok, reason


def test_v1_skip_patterns_path_and_query():
    for url in [
        "https://e.com/category/news",
        "https://e.com/tag/x",
        "https://e.com/a/page/2",
        "https://e.com/author/bob",
        "https://e.com/archive/2024",
        "https://e.com/feed/x",
        "https://e.com/rss/x",
        "https://e.com/search/q",
    ]:
        ok, reason = validate_article(good_article(source=url), NOW)
        assert not ok and "skip pattern" in reason, url


def test_v1_question_page_pattern_is_nearly_dead():
    # Reference quirk (validator.go:166): the "?page=" pattern is matched
    # against path and RawQuery — but RawQuery never contains the leading
    # "?", so a normal pagination URL passes. Replicated verbatim.
    ok, _ = validate_article(good_article(source="https://e.com/list?page=2"), NOW)
    assert ok
    # it can only fire on a literal "?page=" inside the query string
    ok, reason = validate_article(good_article(source="https://e.com/list?a=1?page=2"), NOW)
    assert not ok and "?page=" in reason


def test_v1_trailing_slash_not_root():
    ok, reason = validate_article(good_article(source="https://e.com/section/"), NOW)
    assert not ok and "trailing slash" in reason
    ok, _ = validate_article(good_article(source="https://e.com/"), NOW)
    assert ok  # root path exempt


def test_v1_generic_titles():
    for t in ["News", "latest headlines", "Archive"]:
        ok, reason = validate_article(good_article(title=t), NOW)
        assert not ok, t
    # prefix/suffix pipe forms
    ok, _ = validate_article(good_article(title="news | Site"), NOW)
    assert not ok
    ok, _ = validate_article(good_article(title="Site | news"), NOW)
    assert not ok
    # generic word merely contained is fine
    ok, _ = validate_article(good_article(title="News about turtles"), NOW)
    assert ok


def test_v2_concatenated_separators():
    body = ("some text read more " * 3) + "x" * 200
    assert has_concatenated_content(body)
    ok, reason = validate_article(good_article(body=body + " word" * 50), NOW)
    assert not ok and "concatenated" in reason


def test_v2_headline_like_lines():
    headline = "This Is A Headline Of Decent Size."
    assert 20 <= len(headline) <= 100
    body = "\n".join([headline] * 5) + "\n" + "x" * 100
    assert has_concatenated_content(body)


def test_v2_short_body_exempt():
    assert not has_concatenated_content("read more read more read more")


def test_v3_dates():
    ok, reason = validate_article(good_article(published_date=None), NOW)
    assert not ok and "zero-value" in reason
    ok, reason = validate_article(
        good_article(published_date=datetime(1999, 12, 31, tzinfo=timezone.utc)), NOW
    )
    assert not ok and "before 2000" in reason
    ok, reason = validate_article(
        good_article(published_date=datetime(2026, 8, 18, tzinfo=timezone.utc)), NOW
    )
    assert not ok and "future" in reason
    # +1 day tolerance
    ok, _ = validate_article(
        good_article(published_date=datetime(2026, 8, 16, 12, tzinfo=timezone.utc)), NOW
    )
    assert ok


def test_v4_content_length():
    ok, reason = validate_article(good_article(body="short body here"), NOW)
    assert not ok and "too short" in reason
    ok, reason = validate_article(good_article(body="x" * 100001), NOW)
    assert not ok and "too long" in reason


def test_v5_title():
    ok, reason = validate_article(good_article(title="   "), NOW)
    assert not ok and "empty" in reason


def test_v6_word_count():
    body = ("x" * 150) + " only few words here"
    ok, reason = validate_article(good_article(body=body), NOW)
    assert not ok and "Word count too low" in reason


def test_word_count_strips_tags():
    assert calculate_word_count("<p>one two</p><div>three</div>") == 3
    assert calculate_word_count("") == 0


def test_clean_category():
    assert clean_category("News, Sports | Local/World") == ["News", "Sports", "Local", "World"]
    assert clean_category("A, a, A") == ["A"]
    # repeated-value rule fires only when separators split the input
    # (validator.go:444: Count(category, result[0]) > 3)
    assert clean_category("Canada, Canada, Canada, Canada") == []
    # space-separated repeats survive: result[0] is the whole string,
    # Count(s, s) == 1 — replicated verbatim
    assert clean_category("Canada Canada Canada Canada") == ["Canada Canada Canada Canada"]
    assert clean_category("") == []


def test_prepare_for_indexing():
    a = {
        "source": "https://e.com/a",
        "title": "T",
        "og_title": "T",
        "intro": "  ",
        "description": "D",
        "og_description": "D",
        "og_url": "https://e.com/a",
        "canonical_url": "",
        "og_image": "",
        "author": " ",
        "byline_name": "B",
        "category": "",
        "section": "S",
        "tags": [" a ", "a", "", "b"],
        "keywords": [],
    }
    p = prepare_for_indexing(a)
    assert p["og_title"] == ""  # dup of title
    assert p["og_description"] == ""  # dup of description
    assert p["og_url"] == ""  # dup of source
    assert p["intro"] == "" and p["author"] == ""
    assert p["tags"] == ["a", "b"]
    assert p["keywords"] is None
    assert p["byline_name"] == "B" and p["section"] == "S"


# --- soft-404 detection (fetch.soft404_expr) --------------------------------


def test_soft404_branches(spark):
    from gocrawl_spark import fetch

    rows = [
        (1, 404, "404 Not Found", "not found"),                     # hard 404
        (2, 200, "Error 404", "long healthy body " * 10),           # title hit
        (3, 200, "Widgets", "The page you requested was not found."),  # phrase
        (4, 200, "Oops", "sorry, an error occurred"),               # tiny+marker
        (5, 200, "Contact", "call our office for widget pricing"),  # tiny, benign
        (6, 200, "Article", "perfectly fine content " * 20),        # healthy
        (7, 200, "News", "this page has been removed by the editor"),  # phrase
    ]
    df = spark.createDataFrame(rows, "id int, status int, title string, body string")
    out = {
        r["id"]: r["soft404"]
        for r in df.select(
            "id", fetch.soft404_expr("status", "title", "body").alias("soft404")
        ).collect()
    }
    assert out == {1: False, 2: True, 3: True, 4: True, 5: False, 6: False, 7: True}
