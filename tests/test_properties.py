"""Property-based tests (hypothesis) for the pure kernels.

The reference has no property tests (SURVEY.md §5); these guard the
invariants the distributed engine leans on: total functions over
arbitrary inputs (a crawler meets adversarial URLs/HTML), idempotence
where the pipeline may apply an op twice, and structural invariants of
the robots matcher.
"""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import given, settings

from gocrawl_spark import robots as rb
from gocrawl_spark.canonicalize import absolutize, host_of, is_junk_link, is_valid_url
from gocrawl_spark.extract import clean_text, generate_id, parse_date
from gocrawl_spark.htmlmini import parse
from gocrawl_spark.validate import calculate_word_count, clean_category

text_s = st.text(max_size=300)
url_s = st.one_of(
    st.text(max_size=100),
    st.builds(
        lambda h, p: f"https://{h}.example.com/{p}",
        st.text(alphabet="abc0", min_size=1, max_size=8),
        st.text(alphabet="abc/%?=&.", max_size=30),
    ),
)


@settings(max_examples=200, deadline=None)
@given(base=url_s, href=st.text(max_size=120))
def test_absolutize_total_and_scheme_bound(base, href):
    out = absolutize(base, href)
    assert isinstance(out, str)
    if out:
        assert out.startswith(("http://", "https://"))
        assert "#" not in out  # fragments never reach the frontier
    if href.startswith("#") or is_junk_link(href):
        # junk is filtered before absolutize in the pipeline, but the
        # fragment rule is absolutize's own contract
        if href.startswith("#"):
            assert out == ""


@settings(max_examples=200, deadline=None)
@given(u=url_s)
def test_url_predicates_total(u):
    assert isinstance(is_valid_url(u), bool)
    assert isinstance(host_of(u), str)
    assert generate_id(u) == generate_id(u)
    # reference: empty url → empty id, else sha256 hex (extractor.go:172-178)
    assert len(generate_id(u)) == (64 if u else 0)


@settings(max_examples=200, deadline=None)
@given(t=text_s)
def test_clean_text_idempotent_and_collapsed(t):
    once = clean_text(t)
    assert clean_text(once) == once  # idempotent
    assert "  " not in once and "\t" not in once
    assert once == once.strip()


@settings(max_examples=150, deadline=None)
@given(t=text_s)
def test_word_count_and_category_total(t):
    assert calculate_word_count(t) >= 0
    cats = clean_category(t)
    assert isinstance(cats, list)
    # dedupe is case-insensitive keeping first
    lowered = [c.lower() for c in cats]
    assert len(lowered) == len(set(lowered))


@settings(max_examples=150, deadline=None)
@given(s=text_s)
def test_parse_date_total(s):
    d = parse_date(s)
    assert d is None or d.year >= 1


@settings(max_examples=100, deadline=None)
@given(html=st.text(max_size=500))
def test_html_parse_total(html):
    # adversarial HTML must never raise — the fetch path sees anything
    root = parse(html)
    assert root.tag


@settings(max_examples=150, deadline=None)
@given(
    rules_txt=st.text(alphabet="Uuser-agnt:AlowDisalow */$.\n#", max_size=200),
    path=st.text(alphabet="/abc*$.", max_size=40),
)
def test_robots_total_and_default_allow(rules_txt, path):
    rules = rb.parse_robots(rules_txt)
    verdict = rb.robots_allowed(path or "/", rules)
    assert isinstance(verdict, bool)
    # no rules ⇒ always allowed
    assert rb.robots_allowed(path or "/", []) is True


@settings(max_examples=150, deadline=None)
@given(path=st.text(alphabet="/abcd.", min_size=1, max_size=40))
def test_robots_longer_allow_wins(path):
    """For any path disallowed by a prefix, adding an Allow rule for
    the full path flips the verdict (longest-match-wins)."""
    prefix = path[: max(1, len(path) // 2)]
    rules = [(False, prefix), (True, path)]
    assert rb.robots_allowed(path, rules) is True
    assert rb.robots_allowed(prefix + "zzz", [(False, prefix)]) is False


# --------------------------------------------------------------- warc/sitemap

from datetime import datetime, timezone

from gocrawl_spark import sitemap as sm
from gocrawl_spark import warc as wa


@settings(max_examples=150, deadline=None)
@given(
    # header values are whitespace-trimmed per the header grammar, so
    # the property holds for URLs without control/space characters
    # (real URLs — RFC 3986 forbids them unencoded)
    url=st.text(min_size=1, max_size=80).filter(
        lambda s: not any(
            c.isspace() or ord(c) <= 0x20 or ord(c) == 0x7F for c in s
        )
    ),
    body=st.binary(max_size=400),
)
def test_warc_record_roundtrip_any_payload(url, body):
    """A record built from ANY url/payload — including payloads that
    contain WARC header bytes — parses back byte-identically; the
    Content-Length walk cannot desynchronize."""
    ts = datetime(2026, 3, 4, 5, 6, 7, tzinfo=timezone.utc)
    blob = wa._record_bytes(url, ts, body) + wa._record_bytes(url + "x", ts, b"tail")
    recs = list(wa._iter_records(blob))
    assert len(recs) == 2
    headers, payload = recs[0]
    assert headers["warc-target-uri"] == url
    status, got = wa._parse_http(payload)
    assert status == 200 and got == body
    # second record intact even after an adversarial first payload
    assert wa._parse_http(recs[1][1])[1] == b"tail"


@settings(max_examples=150, deadline=None)
@given(data=st.binary(max_size=300))
def test_warc_parser_total_on_garbage(data):
    # arbitrary bytes must never raise, only yield 0+ records
    assert isinstance(list(wa._iter_records(data)), list)


@settings(max_examples=150, deadline=None)
@given(xml=st.text(alphabet="<>/locsitemaindxurl \n\tabc:-.0123456789", max_size=400))
def test_sitemap_parse_total(xml):
    out = sm.parse_sitemap(xml)
    assert isinstance(out, list)
    for loc, lastmod, is_idx, priority in out:
        assert isinstance(loc, str) and isinstance(is_idx, bool)


@settings(max_examples=100, deadline=None)
@given(
    locs=st.lists(
        st.text(alphabet="abc/:.-0123456789", min_size=1, max_size=40), max_size=8
    )
)
def test_sitemap_urlset_roundtrip(locs):
    xml = "<urlset>" + "".join(f"<url><loc>{u}</loc></url>" for u in locs) + "</urlset>"
    got = [loc for loc, _, idx, _ in sm.parse_sitemap(xml) if not idx]
    assert got == locs
