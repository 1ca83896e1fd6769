"""CSS selector engine over :mod:`gocrawl_spark.htmlmini.dom`.

Implements the selector subset the reference crawler actually uses
(cascadia via goquery — grammar audited across
/root/reference/internal/config/types/selectors.go:107-182 and the
extraction call sites):

- type selectors (``article``), universal ``*``
- ``#id``, ``.class`` (whitespace-token match)
- attribute: ``[attr]``, ``[attr='v']``, ``[attr="v"]``, ``[attr=v]``,
  ``[attr*='v']`` (substring), ``[attr^='v']``, ``[attr$='v']``,
  ``[attr~='v']`` (word)
- compound selectors (``p.lead``, ``time[datetime]``)
- combinators: descendant (space) and child (``>``)
- selector lists (``,``) — goquery ``Find`` unions matches

Matching is scoped to descendants (never the scope element itself),
unique nodes, document order — goquery ``Find`` semantics.
"""

from __future__ import annotations

import re

from .dom import Element

_COMPOUND_RE = re.compile(
    r"""
    (?P<tag>[a-zA-Z][a-zA-Z0-9-]*|\*)
    | \#(?P<id>[\w-]+)
    | \.(?P<cls>[\w-]+)
    | \[\s*(?P<attr>[\w:-]+)\s*
        (?:(?P<op>[*^$~]?=)\s*
           (?:'(?P<v1>[^']*)'|"(?P<v2>[^"]*)"|(?P<v3>[^\]\s]+))\s*)?
      \]
    """,
    re.VERBOSE,
)


class Compound:
    __slots__ = ("tag", "sid", "classes", "attrs")

    def __init__(self) -> None:
        self.tag: str | None = None
        self.sid: str | None = None
        self.classes: list[str] = []
        # list of (name, op, value); op None => existence test
        self.attrs: list[tuple[str, str | None, str | None]] = []

    def matches(self, el: Element) -> bool:
        if self.tag is not None and el.tag != self.tag:
            return False
        if self.sid is not None and el.attrs.get("id") != self.sid:
            return False
        for c in self.classes:
            if c not in el.classes:
                return False
        for name, op, val in self.attrs:
            av = el.attrs.get(name)
            if av is None:
                return False
            if op is None:
                continue
            if op == "=":
                if av != val:
                    return False
            elif op == "*=":
                if val not in av:
                    return False
            elif op == "^=":
                if not av.startswith(val):
                    return False
            elif op == "$=":
                if not av.endswith(val):
                    return False
            elif op == "~=":
                if val not in av.split():
                    return False
        return True


def _parse_compound(s: str) -> Compound:
    c = Compound()
    pos = 0
    while pos < len(s):
        m = _COMPOUND_RE.match(s, pos)
        if m is None:
            raise ValueError(f"unsupported selector fragment: {s[pos:]!r}")
        if m.group("tag"):
            t = m.group("tag")
            c.tag = None if t == "*" else t.lower()
        elif m.group("id"):
            c.sid = m.group("id")
        elif m.group("cls"):
            c.classes.append(m.group("cls"))
        elif m.group("attr"):
            op = m.group("op")
            val = None
            if op is not None:
                for g in ("v1", "v2", "v3"):
                    v = m.group(g)
                    if v is not None:
                        val = v
                        break
            c.attrs.append((m.group("attr").lower(), op, val))
        pos = m.end()
    return c


class Complex:
    """One complex selector: compounds joined by combinators."""

    __slots__ = ("parts",)

    def __init__(self, parts: list[tuple[str, Compound]]) -> None:
        self.parts = parts  # [(combinator ' ' or '>', compound), ...]


_CACHE: dict[str, list[Complex]] = {}


def parse_selector(selector: str) -> list[Complex]:
    cached = _CACHE.get(selector)
    if cached is not None:
        return cached
    out: list[Complex] = []
    for part in selector.split(","):
        part = part.strip()
        if not part:
            continue
        # normalize '>' spacing then tokenize on whitespace
        toks = part.replace(">", " > ").split()
        parts: list[tuple[str, Compound]] = []
        comb = " "
        for tok in toks:
            if tok == ">":
                comb = ">"
                continue
            parts.append((comb, _parse_compound(tok)))
            comb = " "
        if parts:
            out.append(Complex(parts))
    if len(_CACHE) < 4096:
        _CACHE[selector] = out
    return out


def _match_level(scopes: list[Element], comb: str, comp: Compound) -> list[Element]:
    found: list[Element] = []
    seen: set[int] = set()
    for scope in scopes:
        it = scope.iter_elements() if comb == " " else iter(scope.child_elements())
        for el in it:
            if id(el) not in seen and comp.matches(el):
                seen.add(id(el))
                found.append(el)
    return found


def find(scope: Element | list[Element], selector: str) -> list[Element]:
    """All descendant elements of ``scope`` matching ``selector``,
    unique, document order (goquery ``Find``)."""
    scopes = [scope] if isinstance(scope, Element) else list(scope)
    result: list[Element] = []
    seen: set[int] = set()
    for cx in parse_selector(selector):
        cur = scopes
        for comb, comp in cx.parts:
            cur = _match_level(cur, comb, comp)
        for el in cur:
            if id(el) not in seen:
                seen.add(id(el))
                result.append(el)
    result.sort(key=lambda e: e.order)
    return result
