"""Crawl-job configuration — the engine's "query language".

Mirrors the reference's zod config schema (reference src/schema.ts:46-111)
as a validated Python dataclass: ``entry`` URL, ``match``/``exclude`` globs,
CSS/XPath ``selector``, nav auto-discovery, output budgets. Validation is
eager at construction, like ``defineJob`` → ``configSchema.parse``
(reference configurations/types.ts:99-105) and re-validated at crawl entry
(reference src/core.ts:151).

New-engine additions required by the north rule (absent in the reference):
``politeness_budget`` (max fetches per registered domain per round; the
reference's only analog is ``maxConcurrency: 2``, src/core.ts:214) and
``respect_robots``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any
from urllib.parse import urlsplit

from .functions.globs import GlobMatcher, normalize_and_expand_excludes

DEFAULT_DISCOVERY_SELECTOR = "nav, aside, [role='navigation']"  # src/schema.ts:68-71
DEFAULT_MAX_ATTEMPTS = 3          # src/queue.ts:76
DEFAULT_BACKOFF_MS = 5000         # src/worker.ts:17
DEFAULT_LEASE_TIMEOUT_MIN = 30    # src/worker.ts:16
SITEMAP_RE = re.compile(r"sitemap.*\.xml$")  # src/core.ts:335,345-347


class ConfigError(ValueError):
    """Raised on invalid crawl configs (zod .parse() analog)."""


def _as_list(v: str | list[str] | None) -> list[str]:
    if v is None:
        return []
    if isinstance(v, str):
        return [v]
    return list(v)


@dataclass
class CrawlConfig:
    """One crawl job (reference src/schema.ts:46-111).

    ``match``/``exclude`` accept a single glob or a list, like the zod
    ``union([string, array(string)])`` fields (src/schema.ts:54-55).
    """

    entry: str
    match: str | list[str] = "**"
    exclude: str | list[str] | None = None
    selector: str = "body"
    name: str | None = None
    auto_discover_nav: bool = True                       # src/schema.ts:64-67
    discovery_selector: str = DEFAULT_DISCOVERY_SELECTOR
    max_pages: int | None = None                         # 'unlimited' → None
    max_tokens: int | None = None
    max_file_size_mb: int | None = None                  # src/schema.ts:88-91
    priority: int = 0                                    # src/queue.ts:100-105
    max_attempts: int = DEFAULT_MAX_ATTEMPTS
    backoff_ms: int = DEFAULT_BACKOFF_MS
    # north-rule additions
    politeness_budget: int = 2 ** 31 - 1  # per-host fetches per round
    host_crawl_delay_s: int | None = None  # min seconds between fetches per host
    respect_robots: bool = False
    max_depth: int | None = None
    # honor page-level <meta name=robots> directives (north-rule addition;
    # the reference has no analog): noindex pages fetch + expand links but
    # are NOT emitted to the dataset; nofollow pages emit but their links
    # are NOT expanded; 'none' implies both. Opt-in — default off keeps
    # byte-for-byte reference parity.
    honor_meta_robots: bool = False
    # honor <link rel=canonical> (RFC 6596) as the dedup identity
    # (north-rule addition; no reference analog): a fetched page declaring
    # a valid absolute canonical to a DIFFERENT canonical identity is a
    # self-confessed duplicate — it is NOT emitted to the dataset and the
    # preferred target is enqueued in its place (unless the page is also
    # nofollow). Opt-in — default off keeps reference parity.
    honor_canonical: bool = False
    # link-farm defense: keep only the first k outlinks per page (DOM
    # order) during expansion; None = unlimited (reference parity)
    max_links_per_page: int | None = None
    # fetch-layer-only fields (reference src/schema.ts:80-96): accepted with
    # the reference's validation and carried through to_dict/from_dict, but
    # IGNORED by the dataflow — they configure the live browser fetch stage
    # (cookies for consent banners, request blocking, selector waits), which
    # the sandbox's pages-table join stands in for.
    cookie: dict[str, str] | list[dict[str, str]] | None = None
    wait_for_selector_timeout: int | None = None
    resource_exclusions: list[str] | None = None
    extra: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        parts = urlsplit(self.entry)
        if not parts.scheme or not parts.netloc:
            raise ConfigError(f"entry must be an absolute URL, got {self.entry!r}")
        if not self.selector:
            raise ConfigError("selector must be non-empty")
        for fld in ("max_pages", "max_tokens", "max_file_size_mb", "max_depth"):
            v = getattr(self, fld)
            if v is not None and (not isinstance(v, int) or v <= 0):
                raise ConfigError(f"{fld} must be a positive int or None")
        if self.politeness_budget <= 0:
            raise ConfigError("politeness_budget must be positive")
        if self.cookie is not None:
            cookies = self.cookie if isinstance(self.cookie, list) else [self.cookie]
            for c in cookies:
                if not isinstance(c, dict) or not isinstance(c.get("name"), str) \
                        or not isinstance(c.get("value"), str):
                    raise ConfigError(
                        "cookie must be {name, value} or a list of them"
                    )
        if self.wait_for_selector_timeout is not None and (
            not isinstance(self.wait_for_selector_timeout, int)
            or self.wait_for_selector_timeout < 0
        ):
            raise ConfigError("wait_for_selector_timeout must be a non-negative int")
        if self.resource_exclusions is not None and (
            not isinstance(self.resource_exclusions, list)
            or not all(isinstance(x, str) for x in self.resource_exclusions)
        ):
            raise ConfigError("resource_exclusions must be a list of strings")
        if self.name is None:
            self.name = generate_name_from_url(self.entry)

    # -- plan-time compiled artifacts --------------------------------------

    @property
    def match_list(self) -> list[str]:
        return _as_list(self.match) or ["**"]

    @property
    def exclude_list(self) -> list[str]:
        """Exclude globs after directory-expansion (src/core.ts:58-81)."""
        return normalize_and_expand_excludes(_as_list(self.exclude) or None)

    def include_matcher(self) -> GlobMatcher:
        return GlobMatcher(self.match_list)

    def exclude_matcher(self) -> GlobMatcher:
        return GlobMatcher(self.exclude_list)

    def in_scope(self, url: str) -> bool:
        """include ∧ ¬exclude (reference src/core.ts:115-128)."""
        return self.include_matcher().matches(url) and not self.exclude_matcher().matches(url)

    def to_dict(self) -> dict[str, Any]:
        return {
            "entry": self.entry,
            "match": self.match_list,
            "exclude": _as_list(self.exclude),
            "selector": self.selector,
            "name": self.name,
            "auto_discover_nav": self.auto_discover_nav,
            "discovery_selector": self.discovery_selector,
            "max_pages": self.max_pages,
            "max_tokens": self.max_tokens,
            "max_file_size_mb": self.max_file_size_mb,
            "priority": self.priority,
            "max_attempts": self.max_attempts,
            "backoff_ms": self.backoff_ms,
            "politeness_budget": self.politeness_budget,
            "host_crawl_delay_s": self.host_crawl_delay_s,
            "respect_robots": self.respect_robots,
            "max_depth": self.max_depth,
            "honor_meta_robots": self.honor_meta_robots,
            "max_links_per_page": self.max_links_per_page,
            "cookie": self.cookie,
            "wait_for_selector_timeout": self.wait_for_selector_timeout,
            "resource_exclusions": self.resource_exclusions,
        }

    # reference camelCase field → dataclass field (src/schema.ts:46-111);
    # lets a real reference job config load unchanged
    _CAMEL_ALIASES = {
        "autoDiscoverNav": "auto_discover_nav",
        "discoverySelector": "discovery_selector",
        "maxPagesToCrawl": "max_pages",
        "maxTokens": "max_tokens",
        "maxFileSize": "max_file_size_mb",
        "waitForSelectorTimeout": "wait_for_selector_timeout",
        "resourceExclusions": "resource_exclusions",
        "maxAttempts": "max_attempts",
        "maxDepth": "max_depth",
    }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "CrawlConfig":
        mapped: dict[str, Any] = {}
        for k, v in d.items():
            k = cls._CAMEL_ALIASES.get(k, k)
            if v == "unlimited" and k in ("max_pages", "max_tokens"):
                v = None  # reference 'unlimited' sentinel (global.config.ts)
            mapped[k] = v
        known = {k: v for k, v in mapped.items() if k in cls.__dataclass_fields__}
        return cls(**known)


_NON_SLUG = re.compile(r"[^a-z0-9]+")


def generate_name_from_url(url: str) -> str:
    """Parity with ``generateNameFromUrl`` (reference src/schema.ts:122-146):
    hostname minus ``www.``, plus the first path segment, kebab-cased;
    fallback sanitization for unparseable input."""
    try:
        parts = urlsplit(url)
        host = (parts.hostname or "").lower()
        if not host:
            raise ValueError
        if host.startswith("www."):
            host = host[4:]
        segs = [s for s in parts.path.split("/") if s]
        base = host + ("-" + segs[0] if segs else "")
        slug = _NON_SLUG.sub("-", base.lower()).strip("-")
        return slug or "job"
    except ValueError:
        slug = _NON_SLUG.sub("-", url.lower()).strip("-")
        return slug[:64] or "job"


def generate_output_file_name(job_name: str) -> str:
    """Parity with ``generateOutputFileName`` (reference src/schema.ts:153-155)."""
    return f"output/jobs/{job_name}.json"


def sanitize_output_path(path: str, base_dir: str = "output/jobs") -> str:
    """Parity with the reference's output-path sanitization (reference
    src/core.ts:520-527): absolute paths pass through; relative paths are
    confined under ``base_dir`` (traversal segments stripped), so a config
    can never write outside the output tree."""
    import posixpath

    if posixpath.isabs(path):
        return posixpath.normpath(path)
    norm = posixpath.normpath(path)
    parts = [p for p in norm.split("/") if p not in ("..", ".", "")]
    if not parts:
        parts = ["output.json"]
    if parts[: len(base_dir.split("/"))] == base_dir.split("/"):
        return "/".join(parts)
    return posixpath.join(base_dir, *parts)
