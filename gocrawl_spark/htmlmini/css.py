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


class _TreeIndex:
    """Per-tree candidate index: tag/class/id/attr-name → elements in
    document order. Built once per parse tree on first ``find`` (one
    traversal) so each subsequent selector touches only its candidate
    list instead of re-walking the whole tree — the single-pass DOM
    design rule (SURVEY.md §4) applied to matching. Detached elements
    (destructive excludes, ``Remove``) stay in the index; the ancestor
    walk in ``find`` rejects them because their chain no longer reaches
    the scope."""

    __slots__ = ("by_tag", "by_class", "by_id", "by_attr", "all")

    def __init__(self, root: Element) -> None:
        self.by_tag: dict[str, list[Element]] = {}
        self.by_class: dict[str, list[Element]] = {}
        self.by_id: dict[str, list[Element]] = {}
        self.by_attr: dict[str, list[Element]] = {}
        self.all: list[Element] = []
        for el in root.iter_elements():
            self.all.append(el)
            self.by_tag.setdefault(el.tag, []).append(el)
            for c in el.classes:
                self.by_class.setdefault(c, []).append(el)
            for name in el.attrs:
                self.by_attr.setdefault(name, []).append(el)
            sid = el.attrs.get("id")
            if sid:
                self.by_id.setdefault(sid, []).append(el)

    def candidates(self, comp: Compound) -> list[Element]:
        """Smallest available candidate list for a compound (id beats
        class beats attr beats tag); comp.matches still verifies."""
        if comp.sid is not None:
            return self.by_id.get(comp.sid, [])
        if comp.classes:
            return self.by_class.get(comp.classes[0], [])
        if comp.attrs:
            return self.by_attr.get(comp.attrs[0][0], [])
        if comp.tag is not None:
            return self.by_tag.get(comp.tag, [])
        return self.all


def _root_of(el: Element) -> Element:
    # parse() stamps rootref on every element (stable across Remove);
    # the ancestor walk is the fallback for hand-built trees
    r = el.rootref
    if r is not None:
        return r
    while el.parent is not None:
        el = el.parent
    return el


def _index_of(scope: Element) -> _TreeIndex:
    root = _root_of(scope)
    idx = root.qidx
    if idx is None:
        idx = _TreeIndex(root)
        root.qidx = idx
    return idx


def _chain_ok(el: Element, parts, k: int, scope_ids: set[int]) -> bool:
    """parts[k] matched at `el`; verify parts[:k] on el's ancestor
    chain (right-to-left, tiny backtracking) and scope containment."""
    comb = parts[k][0]
    if k == 0:
        if comb == ">":
            return el.parent is not None and id(el.parent) in scope_ids
        p = el.parent
        while p is not None:
            if id(p) in scope_ids:
                return True
            p = p.parent
        return False
    prev = parts[k - 1][1]
    if comb == ">":
        p = el.parent
        return p is not None and prev.matches(p) and _chain_ok(p, parts, k - 1, scope_ids)
    p = el.parent
    while p is not None:
        if prev.matches(p) and _chain_ok(p, parts, k - 1, scope_ids):
            return True
        p = p.parent
    return False


def find(scope: Element | list[Element], selector: str) -> list[Element]:
    """All descendant elements of ``scope`` matching ``selector``,
    unique, document order (goquery ``Find``)."""
    scopes = [scope] if isinstance(scope, Element) else list(scope)
    if not scopes:
        return []
    idx = _index_of(scopes[0])
    scope_ids = {id(s) for s in scopes}
    cxs = parse_selector(selector)
    if len(cxs) == 1:
        # fast path: candidate lists are unique and in document order,
        # so a single complex selector needs no dedup and no sort
        parts = cxs[0].parts
        last = parts[-1][1]
        k = len(parts) - 1
        return [
            el
            for el in idx.candidates(last)
            if last.matches(el) and _chain_ok(el, parts, k, scope_ids)
        ]
    result: list[Element] = []
    seen: set[int] = set()
    for cx in cxs:
        parts = cx.parts
        last = parts[-1][1]
        for el in idx.candidates(last):
            if id(el) in seen:
                continue
            if last.matches(el) and _chain_ok(el, parts, len(parts) - 1, scope_ids):
                seen.add(id(el))
                result.append(el)
    result.sort(key=lambda e: e.order)
    return result
