"""DOM + CSS engine semantics tests (goquery-compatibility contract)."""

from gocrawl_spark.htmlmini import Selection, find, parse

DOC = """<!DOCTYPE html>
<html>
<head>
    <title>My Title</title>
    <meta name="description" content="Desc here">
    <meta property="og:type" content="article">
    <link rel="canonical" href="https://ex.com/canon">
</head>
<body>
    <article data-article-id="a42">
        <h1>Heading</h1>
        <div class="intro">Intro text</div>
        <time datetime="2024-01-01">January 1, 2024</time>
        <div class="content">Body <b>bold</b> text<a href="/x">link</a></div>
        <script>var x = 1;</script>
        <div class="ad">BUY NOW</div>
    </article>
    <nav><a href="/nav1">n1</a><a href="/nav2">n2</a></nav>
    <p class="lead">Lead para</p>
</body>
</html>"""


def test_parse_returns_html_element():
    root = parse(DOC)
    assert root.tag == "html"


def test_find_tag_and_doc_order():
    root = parse(DOC)
    anchors = find(root, "a")
    assert [a.attrs["href"] for a in anchors] == ["/x", "/nav1", "/nav2"]


def test_find_class_and_compound():
    root = parse(DOC)
    assert len(find(root, ".content")) == 1
    assert len(find(root, "div.content")) == 1
    assert len(find(root, "p.lead")) == 1
    assert len(find(root, "span.lead")) == 0


def test_find_attr_selectors():
    root = parse(DOC)
    assert find(root, "meta[property='og:type']")[0].attrs["content"] == "article"
    assert find(root, "meta[name='description']")[0].attrs["content"] == "Desc here"
    assert len(find(root, "time[datetime]")) == 1
    assert find(root, "link[rel='canonical']")[0].attrs["href"] == "https://ex.com/canon"
    # substring match used by default page excludes: [class*='ad']
    ads = find(root, "[class*='ad']")
    # matches class="ad" and class="lead" (substring on raw attr value)
    assert {a.attrs["class"] for a in ads} == {"ad", "lead"}


def test_child_combinator():
    root = parse(DOC)
    divs = find(root, "article > div")
    assert [d.attrs.get("class") for d in divs] == ["intro", "content", "ad"]
    # descendant matches nested too
    assert len(find(root, "body div")) == 3


def test_comma_list_union_doc_order():
    root = parse(DOC)
    got = find(root, "nav, .intro")
    assert [g.tag for g in got] == ["div", "nav"]  # doc order, not list order


def test_text_concatenation_no_separator():
    root = parse(DOC)
    content = find(root, ".content")[0]
    assert content.text() == "Body bold textlink"


def test_text_includes_script_content():
    root = parse(DOC)
    art = find(root, "article")[0]
    assert "var x = 1;" in art.text()


def test_remove_is_destructive_and_shared():
    root = parse(DOC)
    Selection.root(root).find("script").remove()
    Selection.root(root).find(".ad").remove()
    art = find(root, "article")[0]
    t = art.text()
    assert "var x = 1;" not in t
    assert "BUY NOW" not in t
    # removed anchor subtrees disappear from later link queries
    Selection.root(root).find("nav").remove()
    assert [a.attrs["href"] for a in find(root, "a[href]")] == ["/x"]


def test_find_excludes_self():
    root = parse(DOC)
    art = find(root, "article")[0]
    assert find(art, "article") == []


def test_entity_decoding():
    root = parse("<html><body><p>a &amp; b &lt;c&gt;</p></body></html>")
    assert find(root, "p")[0].text() == "a & b <c>"


def test_void_elements_do_not_nest():
    root = parse("<html><body><p>x<br>y<img src='i'>z</p></body></html>")
    assert find(root, "p")[0].text() == "xyz"
    assert len(find(root, "br")) == 1


def test_duplicate_attr_first_wins():
    root = parse('<html><body><div id="a" id="b">t</div></body></html>')
    assert find(root, "div")[0].attrs["id"] == "a"


def test_unclosed_tags_recover():
    root = parse("<html><body><div><p>one<p>two</div><span>s</span></body></html>")
    assert [p.text() for p in find(root, "p")] == ["one", "two"]
    assert find(root, "span")[0].text() == "s"


def test_namespaced_tags_parse_as_elements():
    """ADVICE: real-web namespaced/underscore/dot tag names (<o:p>,
    <fb:like>) must tokenize as elements (html.parser
    tagfind_tolerant), not spill into extracted text."""
    root = parse("<div><o:p>ms office</o:p><fb:like href='x'></fb:like>tail</div>")
    div = find(root, "div")[0]
    kids = [e for e in div.children if getattr(e, "tag", None)]
    assert [e.tag for e in kids] == ["o:p", "fb:like"]
    assert kids[0].text() == "ms office"
    assert kids[1].attrs.get("href") == "x"
