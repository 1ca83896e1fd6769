"""Pure-stdlib HTML DOM + CSS selector engine with goquery-compatible
Find/Text/Attr/Remove semantics (the container has no lxml/bs4)."""

from __future__ import annotations

from .css import find
from .dom import Element, TextNode, parse

__all__ = ["Element", "Selection", "TextNode", "find", "parse"]


class Selection:
    """goquery-style selection wrapper: ``Find``/``First``/``Text``/
    ``Attr``/``Remove``/``Eq``/``Length`` over a shared mutable tree."""

    __slots__ = ("nodes",)

    def __init__(self, nodes: list[Element]) -> None:
        self.nodes = nodes

    @classmethod
    def root(cls, el: Element) -> "Selection":
        return cls([el])

    def find(self, selector: str) -> "Selection":
        return Selection(find(self.nodes, selector))

    def first(self) -> "Selection":
        return Selection(self.nodes[:1])

    def eq(self, i: int) -> "Selection":
        return Selection(self.nodes[i : i + 1])

    @property
    def length(self) -> int:
        return len(self.nodes)

    def text(self) -> str:
        # goquery Text(): concatenation over selection nodes, no separator
        return "".join(n.text() for n in self.nodes)

    def attr(self, name: str) -> str | None:
        if not self.nodes:
            return None
        return self.nodes[0].attrs.get(name)

    def attr_or(self, name: str, default: str) -> str:
        v = self.attr(name)
        return default if v is None else v

    def remove(self) -> None:
        for n in self.nodes:
            n.remove()
