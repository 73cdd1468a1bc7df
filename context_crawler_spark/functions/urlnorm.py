"""URL canonicalization and host parsing.

``canonicalize_url`` replicates the uniqueKey normalization the reference
inherits from its ``crawlee`` dependency (reference package.json:15; the
RequestQueue dedup behavior consumed at reference src/core.ts:203-207,341,349).
Crawlee's uniqueKey is ``normalizeUrl(url)`` with these semantics:

  * trim surrounding whitespace
  * lowercase the scheme and host (path/query stay case-sensitive)
  * drop the fragment
  * drop query parameters whose key starts with ``utm_``
  * sort remaining raw ``key=value`` query pairs lexicographically
  * strip a single trailing ``/`` from the path

Pinned by golden tests in tests/test_urlnorm.py. All functions are pure and
vectorization-friendly (called from pandas UDFs over Arrow batches).
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

# Minimal embedded public-suffix data for registered-domain extraction.
# A production deployment swaps in the full PSL snapshot (publicsuffix.org);
# the algorithm (longest matching suffix + one label) is identical.
_TWO_LEVEL_SUFFIXES = frozenset(
    {
        "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
        "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
        "co.nz", "co.za", "com.ar", "com.tr", "com.sg", "com.hk",
    }
)


def canonicalize_url(url: str, keep_fragment: bool = False) -> str | None:
    """Crawlee-uniqueKey-parity URL normalization (see module docstring).

    Returns ``None`` for unparseable inputs (no scheme or host), matching
    normalizeUrl's null return.
    """
    if not isinstance(url, str):
        return None
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return None
    if not parts.scheme or not parts.netloc:
        return None
    path = parts.path
    if path.endswith("/"):
        path = path[:-1]
    # Raw key=value pairs: filtered on utm_ prefix, sorted lexicographically
    # as raw strings (crawlee sorts the joined 'k=v' strings, not parsed keys).
    if parts.query:
        params = [p for p in parts.query.split("&") if not p.startswith("utm_")]
        params.sort()
        query = "&".join(params)
    else:
        query = ""
    out = f"{parts.scheme.lower()}://{parts.netloc.lower()}{path}"
    if query:
        out += f"?{query}"
    if keep_fragment and parts.fragment:
        out += f"#{parts.fragment}"
    return out


def url_host(url: str) -> str | None:
    """Lowercased host (netloc minus userinfo/port) of a URL."""
    try:
        netloc = urlsplit(url.strip()).netloc
    except (ValueError, AttributeError):
        return None
    if not netloc:
        return None
    host = netloc.rsplit("@", 1)[-1]
    # Strip port but not IPv6 brackets.
    if host.startswith("["):
        host = host.split("]", 1)[0] + "]"
    elif ":" in host:
        host = host.split(":", 1)[0]
    return host.lower() or None


def registered_domain(host: str) -> str | None:
    """Registered (pay-level) domain: PSL suffix + one label.

    e.g. ``docs.example.co.uk`` → ``example.co.uk``; ``a.b.example.test`` →
    ``example.test``. Unknown multi-level suffixes fall back to the last two
    labels, which is exactly what the embedded-PSL shortcut costs.
    """
    if not host:
        return None
    host = host.strip(".").lower()
    # IP literals are not DNS names: an IPv4/IPv6 host IS its own politeness
    # domain (grouping by "last two octets" would collapse unrelated hosts)
    if host.startswith("[") or re.fullmatch(r"[0-9.]+", host):
        return host
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    two = ".".join(labels[-2:])
    if two in _TWO_LEVEL_SUFFIXES and len(labels) >= 3:
        return ".".join(labels[-3:])
    return two


def resolve_href(base_url: str, href: str) -> str | None:
    """Resolve an ``<a href>`` against its page URL (browser semantics:
    the DOM's ``link.href`` property is always absolute — reference
    src/core.ts:101 reads the resolved property, so candidates are absolute
    before any filtering)."""
    from urllib.parse import urljoin

    if href is None:
        return None
    href = href.strip()
    if not href:
        return None
    try:
        return urljoin(base_url, href)
    except ValueError:
        return None
