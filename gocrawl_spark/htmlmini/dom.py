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

Parsing uses ``html.parser`` (C-tokenizer-free but adequate); entities are
decoded in both text and attribute values, mirroring x/net/html.
"""

from __future__ import annotations

from html.parser import HTMLParser

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
    __slots__ = ("tag", "attrs", "children", "order", "classes", "qidx")

    def __init__(self, tag: str, attrs: dict[str, str], order: int) -> None:
        self.parent = None
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node] = []
        self.order = order
        self.qidx = None  # lazy css._TreeIndex, set on the root only
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


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._order = 0
        self.root = Element("#document", {}, self._order)
        self._stack: list[Element] = [self.root]

    def _attrs_dict(self, attrs) -> dict[str, str]:
        d: dict[str, str] = {}
        for k, v in attrs:
            if k not in d:  # first occurrence wins (x/net/html behavior)
                d[k] = v if v is not None else ""
        return d

    def handle_starttag(self, tag: str, attrs) -> None:
        # implicit </p> before block-level elements
        if tag in _P_CLOSERS and self._stack[-1].tag == "p":
            self._stack.pop()
        self._order += 1
        el = Element(tag, self._attrs_dict(attrs), self._order)
        self._stack[-1].append(el)
        if tag not in VOID_ELEMENTS:
            self._stack.append(el)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self._order += 1
        el = Element(tag, self._attrs_dict(attrs), self._order)
        self._stack[-1].append(el)

    def handle_endtag(self, tag: str) -> None:
        # pop to the nearest matching open tag; ignore unmatched
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            t = TextNode(data)
            t.parent = self._stack[-1]
            self._stack[-1].children.append(t)


def parse(html: str) -> Element:
    """Parse HTML and return the root element for queries.

    Returns the ``<html>`` element when present (matching colly's
    ``OnHTML("html")`` callback where ``e.DOM`` is the html element —
    /root/reference/internal/crawler/crawler.go:291), else a synthetic
    document root wrapping everything.
    """
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    for el in b.root.iter_elements():
        if el.tag == "html":
            return el
    return b.root
