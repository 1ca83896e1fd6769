"""URL canonicalization, absolutization, and hashing (F2–F4, E11).

Reference semantics:
- junk-link filter: /root/reference/internal/crawler/link_handler.go:33-40
  (``#``, ``javascript:``, ``mailto:``, ``tel:`` prefixes dropped)
- absolutization: colly ``Request.AbsoluteURL`` — RFC 3986 reference
  resolution against the request URL; a link starting with ``#`` yields
  "" (link_handler.go:43-48). Python ``urllib.parse.urljoin`` implements
  the same RFC 3986 algorithm as Go ``net/url ResolveReference``.
- url id/hash: hex(sha256(url)) — articles/extractor.go:172-178; in Spark
  this is the built-in ``sha2(url, 256)``, bit-identical.

``registrable_domain`` (politeness sharding per the north rule) uses a
compact multi-label-suffix heuristic instead of the full public-suffix
list (not shipped in this container); the reference itself shards by raw
hostname only (crawler.go:223-228 uses DomainGlob="*").
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit

JUNK_PREFIXES = ("#", "javascript:", "mailto:", "tel:")

# minimal two-label public suffixes for the heuristic eTLD+1
_TWO_LABEL_SUFFIXES = {
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "co.nz", "com.br", "com.cn", "com.mx",
    "co.in", "co.za", "com.sg", "com.tr", "com.ar",
}


def is_junk_link(href: str) -> bool:
    """link_handler.go:33-40."""
    return any(href.startswith(p) for p in JUNK_PREFIXES)


def absolutize(base_url: str, href: str) -> str:
    """colly Request.AbsoluteURL: '' for fragment-only links, else
    RFC 3986 resolution; '' when the result has no scheme."""
    if not href or href.startswith("#"):
        return ""
    try:
        abs_url = urljoin(base_url, href)
    except ValueError:
        return ""
    if not abs_url.startswith(("http://", "https://")):
        return ""
    # strip fragment (net/url keeps it out of request URLs via Visit)
    frag = abs_url.find("#")
    if frag >= 0:
        abs_url = abs_url[:frag]
    return abs_url


def is_valid_url(url: str) -> bool:
    """link_handler.go:51-58 (ValidateURLs default true)."""
    try:
        p = urlsplit(url)
    except ValueError:
        return False
    return bool(p.scheme and p.netloc)


def host_of(url: str) -> str:
    try:
        h = urlsplit(url).hostname
    except ValueError:
        return ""
    return h or ""


def registrable_domain(host: str) -> str:
    """Heuristic eTLD+1 for politeness sharding (north-rule concept;
    the reference rate-limits on a single '*' glob)."""
    if not host:
        return ""
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    if ".".join(labels[-2:]) in _TWO_LABEL_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])
