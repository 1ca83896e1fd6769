"""Minimal HTML DOM with goquery-compatible semantics, pure stdlib.

This module exists because the execution container ships no lxml/bs4;
the extraction kernel (see ``gocrawl_spark.extract``) needs a DOM whose
text/attr/remove semantics match goquery (github.com/PuerkitoBio/goquery)
as used by the reference crawler:

- ``Selection.Text()`` concatenates every descendant text node in document
  order with NO separator (goquery ``Text``), including text inside
  ``<script>``/``<style>`` unless those nodes were removed.
- ``Selection.Remove()`` destructively detaches nodes from the tree; later
  queries against the same tree observe the removal (the reference relies
  on this: exclude-selectors are ``.Remove()``d before serialization —
  /root/reference/internal/content/articles/extractor.go:69-76).
- ``Find`` matches descendants only (not self), unique nodes, document
  order.

Parsing is a hand-rolled single-pass scanner (find('<') + two compiled
regexes) rather than stdlib ``html.parser``: the kernel runs on every
fetched page, and html.parser's per-tag bookkeeping (line/column
``updatepos``, multi-regex dispatch) dominated the profile at ~3× the
cost while allocating far more short-lived objects — churn the 32-way
parallel extraction pays for at the memory subsystem (see
BENCH/BASELINE.md calibration). Semantics kept from html.parser:
lowercased tag/attr names, first duplicate attribute wins, charrefs
decoded in text and attribute values, script/style content raw
(no entity decoding), void elements never pushed, implicit ``</p>``
before block elements, unmatched end tags ignored.
"""

from __future__ import annotations

import re
from html import unescape

# Elements with no closing tag (HTML5 void elements) — mirrors
# x/net/html's void element handling used by goquery's parser.
VOID_ELEMENTS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)

# Elements whose content is raw text (tokenizer switches mode).
RAW_TEXT_ELEMENTS = frozenset({"script", "style", "textarea", "title"})

# Elements that implicitly close an open <p> (subset; enough for crawl HTML).
_P_CLOSERS = frozenset(
    {
        "address", "article", "aside", "blockquote", "div", "dl",
        "fieldset", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
        "header", "hr", "main", "nav", "ol", "p", "pre", "section",
        "table", "ul",
    }
)


class Node:
    __slots__ = ("parent",)


class TextNode(Node):
    __slots__ = ("data",)

    def __init__(self, data: str) -> None:
        self.parent = None
        self.data = data

    def __repr__(self) -> str:  # pragma: no cover
        return f"TextNode({self.data!r})"


class Element(Node):
    __slots__ = ("tag", "attrs", "children", "order", "classes", "qidx", "rootref")

    def __init__(self, tag: str, attrs: dict[str, str], order: int) -> None:
        self.parent = None
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node] = []
        self.order = order
        self.qidx = None  # lazy css._TreeIndex, set on the root only
        self.rootref = None  # tree root, set by parse(); survives Remove
        cls = attrs.get("class")
        self.classes = frozenset(cls.split()) if cls else frozenset()

    def append(self, node: Node) -> None:
        node.parent = self
        self.children.append(node)

    def iter_elements(self):
        """Yield descendant elements (not self) in document order."""
        stack = [iter(self.children)]
        while stack:
            it = stack[-1]
            nxt = next(it, None)
            if nxt is None:
                stack.pop()
                continue
            if isinstance(nxt, Element):
                yield nxt
                stack.append(iter(nxt.children))

    def child_elements(self):
        return [c for c in self.children if isinstance(c, Element)]

    def text(self) -> str:
        """Subtree text: all text nodes, document order, no separator
        (goquery ``Selection.Text`` over a single node)."""
        out: list[str] = []
        stack: list[Node] = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if isinstance(n, TextNode):
                out.append(n.data)
            else:
                stack.extend(reversed(n.children))
        return "".join(out)

    def remove(self) -> None:
        """Detach from parent (goquery ``Remove``)."""
        p = self.parent
        if p is not None:
            try:
                p.children.remove(self)
            except ValueError:
                pass
            self.parent = None

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{self.tag} order={self.order}>"


# start tag: name, raw attribute blob (quote-aware so '>' inside quoted
# values is not a tag end), optional self-closing slash. Tag names allow
# ':', '_', '.' after the first letter (html.parser tagfind_tolerant) so
# real-web namespaced markup (<o:p>, <fb:like>) parses as elements
# instead of spilling into text nodes.
_STARTTAG_RE = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9._:-]*)"
    r"((?:\s+[^\s/>][^\s/>=]*(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s>]*))?)*)"
    r"\s*(/?)>"
)
_ENDTAG_RE = re.compile(r"</\s*([a-zA-Z][a-zA-Z0-9._:-]*)[^>]*>")
_ATTR_RE = re.compile(r"([^\s/>=]+)(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]*))?")
# raw-content close scanners (html.parser CDATA mode: script/style only)
_RAW_CLOSE = {t: re.compile(rf"</\s*{t}", re.I) for t in ("script", "style")}

# canonical lowercase names: tag/attr-name slices repeat constantly
# across pages; the cache hands every occurrence the SAME str object
# (no per-occurrence allocation, cheaper dict hashing downstream)
_NAME_CACHE: dict[str, str] = {}


def _canon(name: str) -> str:
    c = _NAME_CACHE.get(name)
    if c is None:
        c = name.lower()
        if len(_NAME_CACHE) < 8192:
            _NAME_CACHE[name] = c
    return c


def _parse_attrs(blob: str) -> dict[str, str]:
    d: dict[str, str] = {}
    for m in _ATTR_RE.finditer(blob):
        k = _canon(m.group(1))
        if k in d:  # first occurrence wins (x/net/html behavior)
            continue
        v = m.group(2)
        if v is None:
            d[k] = ""
            continue
        if v and v[0] in "\"'":
            v = v[1:-1]
        d[k] = unescape(v) if "&" in v else v
    return d


_EMPTY_ATTRS: dict[str, str] = {}


def parse(html: str) -> Element:
    """Parse HTML and return the root element for queries.

    Returns the ``<html>`` element when present (matching colly's
    ``OnHTML("html")`` callback where ``e.DOM`` is the html element —
    /root/reference/internal/crawler/crawler.go:291), else a synthetic
    document root wrapping everything.
    """
    if not isinstance(html, str):
        html = str(html)
    order = 0
    root = Element("#document", _EMPTY_ATTRS, 0)
    root.rootref = root
    stack: list[Element] = [root]
    top = root
    n = len(html)
    pos = 0
    html_el: Element | None = None
    find = html.find
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            data = html[pos:]
            if data:
                t = TextNode(unescape(data) if "&" in data else data)
                t.parent = top
                top.children.append(t)
            break
        if lt > pos:
            data = html[pos:lt]
            t = TextNode(unescape(data) if "&" in data else data)
            t.parent = top
            top.children.append(t)
        c = html[lt + 1 : lt + 2]
        if c == "/":
            m = _ENDTAG_RE.match(html, lt)
            if m is None:
                gt = find(">", lt)
                pos = n if gt < 0 else gt + 1
                continue
            pos = m.end()
            tag = _canon(m.group(1))
            # pop to the nearest matching open tag; ignore unmatched
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    top = stack[-1]
                    break
            continue
        if c == "!" or c == "?":
            if html.startswith("<!--", lt):
                end = find("-->", lt + 4)
                pos = n if end < 0 else end + 3
            else:
                gt = find(">", lt)
                pos = n if gt < 0 else gt + 1
            continue
        m = _STARTTAG_RE.match(html, lt)
        if m is None:
            # bare '<' in text (html.parser emits it as data)
            t = TextNode("<")
            t.parent = top
            top.children.append(t)
            pos = lt + 1
            continue
        pos = m.end()
        tag = _canon(m.group(1))
        blob = m.group(2)
        # implicit </p> before block-level elements
        if top.tag == "p" and tag in _P_CLOSERS:
            stack.pop()
            top = stack[-1]
        order += 1
        el = Element(tag, _parse_attrs(blob) if blob else {}, order)
        el.parent = top
        el.rootref = root
        top.children.append(el)
        if html_el is None and tag == "html":
            html_el = el
        if m.group(3) or tag in VOID_ELEMENTS:
            continue
        raw = _RAW_CLOSE.get(tag)
        if raw is not None:
            # CDATA content: no entity decoding, no nested tags
            mm = raw.search(html, pos)
            end = mm.start() if mm else n
            if end > pos:
                t = TextNode(html[pos:end])
                t.parent = el
                el.children.append(t)
            if mm:
                gt = find(">", mm.start())
                pos = n if gt < 0 else gt + 1
            else:
                pos = n
            continue
        stack.append(el)
        top = el
    return html_el if html_el is not None else root
