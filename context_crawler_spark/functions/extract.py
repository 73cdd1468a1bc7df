"""HTML → text extraction with pinned, deterministic innerText emulation.

Replicates the reference's per-page extraction (``getPageHtml``, reference
src/core.ts:32-51):

  * selector starting with ``/`` → XPath: ``textContent`` of the FIRST match
    (raw concatenation of text nodes, no whitespace processing)
  * otherwise → CSS: ``document.querySelector(selector)`` (first match in
    document order) and its ``innerText``
  * no match → ``''``

``innerText`` is emulated over the restricted deterministic HTML subset the
fixture generator emits (FIXTURES.md §1): block elements start new lines,
``<p>`` contributes a blank-line separation (CSS margin analog), ``<pre>``
preserves whitespace verbatim, all other whitespace runs collapse to single
spaces. The fixture ``pages.text`` column is produced by THIS function, so
"byte-identical extracted text per url" is enforced end-to-end by golden
tests (tests/test_extract.py) and the engine↔oracle parity suite.

Link/nav extraction mirrors ``discoverNavigationUrls`` + ``enqueueLinks``
(reference src/core.ts:87-131, 203-207): anchors in DOM order, resolved to
absolute URLs, ``javascript:``/bare-fragment hrefs dropped
(src/core.ts:102).

Everything here is pure Python on strings — invoked ONLY from pandas UDFs
over Arrow batches (udfs.py), never per-row Spark Python UDFs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html import unescape
from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)

# Block-level elements in the supported subset: entering/leaving one forces
# a line break in innerText.
BLOCK_ELEMENTS = frozenset(
    {"html", "body", "article", "section", "div", "p", "h1", "h2", "h3",
     "h4", "h5", "h6", "ul", "ol", "li", "pre", "nav", "aside", "header",
     "footer", "main", "table", "tr", "blockquote", "figure"}
)

# Elements whose innerText gets blank-line (margin) separation, per Chrome's
# default stylesheet margins on paragraphs.
MARGIN_ELEMENTS = frozenset({"p"})

# Elements invisible to innerText.
HIDDEN_ELEMENTS = frozenset({"head", "script", "style", "template", "title"})


@dataclass
class Node:
    """Minimal DOM node."""

    tag: str  # '' for text nodes
    attrs: dict[str, str] = field(default_factory=dict)
    children: list["Node"] = field(default_factory=list)
    text: str = ""  # text nodes only
    parent: "Node | None" = None

    def iter(self):
        # Iterative pre-order traversal: adversarial pages nest thousands
        # deep, recursion is not an option in a crawler hot path.
        stack = [self]
        while stack:
            n = stack.pop()
            yield n
            stack.extend(reversed(n.children))

    def elements(self):
        for n in self.iter():
            if n.tag:
                yield n


_MAX_DOM_DEPTH = 512  # adversarial-nesting cap: deeper opens attach flat


class _DomBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node(tag="#document")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag=tag, attrs={k: (v or "") for k, v in attrs}, parent=self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS and len(self.stack) < _MAX_DOM_DEPTH:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag=tag, attrs={k: (v or "") for k, v in attrs}, parent=self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        # close up to the matching open tag (tolerant of misnesting)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(
                Node(tag="", text=data, parent=self.stack[-1])
            )


def parse_html(html: str) -> Node:
    b = _DomBuilder()
    b.feed(html)
    b.close()
    return b.root


# ---------------------------------------------------------------------------
# CSS selector engine (subset: tag, #id, .class, [attr], [attr='v'],
# compound simple selectors, comma lists, descendant combinator)
# ---------------------------------------------------------------------------

_SIMPLE_RE = re.compile(
    r"(?P<tag>[a-zA-Z][a-zA-Z0-9-]*|\*)?"
    r"(?P<rest>(?:[#.][\w-]+|\[[^\]]+\])*)"
)
_PART_RE = re.compile(r"[#.][\w-]+|\[[^\]]+\]")


def _parse_simple(sel: str):
    m = _SIMPLE_RE.fullmatch(sel.strip())
    if not m:
        raise ValueError(f"unsupported selector: {sel!r}")
    tag = (m.group("tag") or "*").lower()
    conds = []
    for part in _PART_RE.findall(m.group("rest") or ""):
        if part.startswith("#"):
            conds.append(("id", part[1:]))
        elif part.startswith("."):
            conds.append(("class", part[1:]))
        else:
            body = part[1:-1].strip()
            if "=" in body:
                k, v = body.split("=", 1)
                conds.append(("attr_eq", (k.strip(), v.strip().strip("'\""))))
            else:
                conds.append(("attr", body))
    return tag, conds


def _matches_simple(node: Node, tag: str, conds) -> bool:
    if tag != "*" and node.tag != tag:
        return False
    for kind, arg in conds:
        if kind == "id":
            if node.attrs.get("id") != arg:
                return False
        elif kind == "class":
            if arg not in node.attrs.get("class", "").split():
                return False
        elif kind == "attr":
            if arg not in node.attrs:
                return False
        else:  # attr_eq
            k, v = arg
            if node.attrs.get(k) != v:
                return False
    return True


def _matches_compound(node: Node, compound: list) -> bool:
    """Descendant-combinator chain: last simple matches node, ancestors
    match the earlier simples in order."""
    tag, conds = compound[-1]
    if not _matches_simple(node, tag, conds):
        return False
    cur = node.parent
    for tag, conds in reversed(compound[:-1]):
        while cur is not None and not _matches_simple(cur, tag, conds):
            cur = cur.parent
        if cur is None:
            return False
        cur = cur.parent
    return True


def _parse_selector(selector: str) -> list[list]:
    groups = []
    for alt in selector.split(","):
        alt = alt.strip()
        if not alt:
            continue
        compound = [_parse_simple(tok) for tok in alt.split()]
        groups.append(compound)
    return groups


def query_selector_all(root: Node, selector: str) -> list[Node]:
    groups = _parse_selector(selector)
    out = []
    for node in root.elements():
        if any(_matches_compound(node, g) for g in groups):
            out.append(node)
    return out


def query_selector(root: Node, selector: str) -> Node | None:
    groups = _parse_selector(selector)
    for node in root.elements():
        if any(_matches_compound(node, g) for g in groups):
            return node
    return None


# ---------------------------------------------------------------------------
# XPath (absolute child paths with optional positional predicates,
# e.g. /html/body/article[2]) — enough for the reference's XPath branch
# (src/core.ts:35-44); returns the first match's textContent.
# ---------------------------------------------------------------------------

_XPATH_STEP = re.compile(r"([a-zA-Z][a-zA-Z0-9-]*|\*)(?:\[(\d+)\])?$")


def xpath_first(root: Node, xpath: str) -> Node | None:
    steps = [s for s in xpath.split("/") if s]
    current = [root]
    for step in steps:
        m = _XPATH_STEP.match(step)
        if not m:
            return None
        name, pos = m.group(1).lower(), m.group(2)
        nxt: list[Node] = []
        for node in current:
            kids = [c for c in node.children if c.tag and (name == "*" or c.tag == name)]
            if pos is not None:
                idx = int(pos) - 1
                if 0 <= idx < len(kids):
                    nxt.append(kids[idx])
            else:
                nxt.extend(kids)
        current = nxt
        if not current:
            return None
    return current[0] if current else None


def text_content(node: Node) -> str:
    """DOM ``textContent``: raw concatenation of all descendant text nodes."""
    parts: list[str] = []
    for n in node.iter():
        if not n.tag:
            parts.append(n.text)
    return "".join(parts)


# ---------------------------------------------------------------------------
# innerText emulation (pinned spec — see module docstring)
# ---------------------------------------------------------------------------

_WS_RUN = re.compile(r"[ \t\r\n\f]+")


class _InnerText:
    """Line-box innerText renderer over the supported subset.

    Rules (pinned):
      * hidden elements contribute nothing
      * <br> forces a line break
      * <pre> content is verbatim (including newlines)
      * other text: whitespace runs collapse to a single space; spaces at
        line boundaries are trimmed
      * entering/leaving a block element ends the current line
      * MARGIN_ELEMENTS (<p>) are separated from surrounding content by one
        blank line (margins collapse; no leading/trailing blank lines)
    """

    def __init__(self) -> None:
        self.lines: list[str] = []
        self.cur: list[str] = []
        self.cur_verbatim = False  # line came from <pre>: keep edges intact
        self.pending_margin = False
        self.any_output = False

    def _take_line(self) -> str:
        line = "".join(self.cur)
        if not self.cur_verbatim:
            line = line.strip()
        self.cur = []
        self.cur_verbatim = False
        return line

    def _flush_line(self) -> None:
        line = self._take_line()
        if line:
            if self.pending_margin and self.any_output:
                self.lines.append("")
            self.pending_margin = False
            self.lines.append(line)
            self.any_output = True

    def _raw_line_break(self) -> None:
        # <br> / pre newline: break even if the current line is empty
        # (consecutive brs produce empty lines)
        line = self._take_line()
        if self.pending_margin and self.any_output:
            self.lines.append("")
            self.pending_margin = False
        self.lines.append(line)
        self.any_output = True

    def render(self, node: Node) -> str:
        # Explicit-stack traversal with enter/exit phases (recursion-free:
        # adversarial nesting depth must not crash extraction).
        stack: list[tuple[Node, bool, bool]] = [(node, False, False)]
        while stack:
            n, in_pre, exiting = stack.pop()
            if n.tag in HIDDEN_ELEMENTS:
                continue
            if exiting:
                self._flush_line()
                if n.tag in MARGIN_ELEMENTS:
                    self.pending_margin = True
                continue
            if not n.tag:  # text node
                self._text(n.text, in_pre)
                continue
            if n.tag == "br":
                self._raw_line_break()
                continue
            if n.tag in BLOCK_ELEMENTS:
                self._flush_line()
                if n.tag in MARGIN_ELEMENTS:
                    self.pending_margin = True
                stack.append((n, in_pre, True))  # exit action
            child_pre = in_pre or n.tag == "pre"
            for c in reversed(n.children):
                stack.append((c, child_pre, False))
        self._flush_line()
        return "\n".join(self.lines)

    def _text(self, text: str, in_pre: bool) -> None:
        if in_pre:
            for i, piece in enumerate(text.split("\n")):
                if i > 0:
                    self._raw_line_break()
                if piece:
                    self.cur.append(piece)
                    self.cur_verbatim = True
        else:
            t = _WS_RUN.sub(" ", text)
            if t:
                self.cur.append(t)


def inner_text(node: Node) -> str:
    return _InnerText().render(node)


# ---------------------------------------------------------------------------
# Top-level extraction API (parity surface)
# ---------------------------------------------------------------------------


def _text_from_root(root: Node, selector: str) -> str:
    if selector.startswith("/"):
        node = xpath_first(root, selector)
        return text_content(node) if node is not None else ""
    node = query_selector(root, selector)
    return inner_text(node) if node is not None else ""


def _title_from_root(root: Node) -> str:
    node = query_selector(root, "title")
    return _WS_RUN.sub(" ", text_content(node)).strip() if node is not None else ""


def extract_text(html: str, selector: str = "body") -> str:
    """Parity with ``getPageHtml`` (reference src/core.ts:32-51)."""
    if html is None:
        return ""
    return _text_from_root(parse_html(html), selector)


def extract_title(html: str) -> str:
    """``page.title()`` analog (reference src/core.ts:168)."""
    if html is None:
        return ""
    return _title_from_root(parse_html(html))


def extract_canonical(html: str, base_url: str = "") -> str | None:
    """``<link rel="canonical" href=...>`` from the document, resolved
    against ``base_url`` (RFC 6596; the hint Google/Common Crawl honor
    when electing the representative URL of a duplicate cluster). First
    matching link wins (browser behavior); a relative href resolves like
    any other link; missing/empty href → None. Feed the result to
    ``operators/links.canonical_dedup_key``."""
    if not html:
        return None
    from urllib.parse import urljoin

    for node in parse_html(html).elements():
        if node.tag != "link":
            continue
        rel = (node.attrs.get("rel") or "").lower().split()
        if "canonical" not in rel:
            continue
        href = (node.attrs.get("href") or "").strip()
        if not href:
            return None
        return urljoin(base_url, href) if base_url else href
    return None


def extract_meta_robots(html: str) -> str | None:
    """``<meta name="robots" content="noindex, nofollow">`` directives —
    the page-level crawler controls (Robots Exclusion Protocol's meta
    form; robots.txt gates the FETCH, this gates what happens after).
    Returns the comma-joined lowercase token list of the FIRST
    name=robots meta (browser/Googlebot behavior), None when absent.
    Feed to ``operators/links.apply_meta_robots`` for the
    noindex/nofollow split."""
    if not html:
        return None
    for node in parse_html(html).elements():
        if node.tag != "meta":
            continue
        if (node.attrs.get("name") or "").strip().lower() != "robots":
            continue
        content = (node.attrs.get("content") or "").lower()
        toks = [t.strip() for t in content.replace(";", ",").split(",")
                if t.strip()]
        return ",".join(toks) if toks else None
    return None


def extract_page(
    html: str, base_url: str, selector: str = "body"
) -> tuple[str, str, list[tuple[str, int, bool]]]:
    """Fused per-page extraction: (title, text, links) from ONE parse —
    the fetch-stage hot path (three separate calls would re-parse the DOM
    three times)."""
    if html is None:
        return "", "", []
    root = parse_html(html)
    return (
        _title_from_root(root),
        _text_from_root(root, selector),
        _links_from_root(root, base_url),
    )


def extract_links(html: str, base_url: str) -> list[tuple[str, int, bool]]:
    """All anchors in DOM order → ``(absolute_href, link_index, is_nav)``.

    ``is_nav`` marks anchors inside the default discovery selector scope
    (``nav, aside, [role='navigation']``, reference src/core.ts:298-299).
    Drops ``javascript:`` and bare-fragment hrefs (src/core.ts:102). Hrefs
    resolve to absolute like the DOM's ``.href`` property (src/core.ts:101).
    """
    if html is None:
        return []
    return _links_from_root(parse_html(html), base_url)


def _links_from_root(root: Node, base_url: str) -> list[tuple[str, int, bool]]:
    from .urlnorm import resolve_href

    nav_scope = set()
    for nav in query_selector_all(root, "nav, aside, [role='navigation']"):
        for n in nav.iter():
            nav_scope.add(id(n))
    out: list[tuple[str, int, bool]] = []
    ix = 0
    for node in root.elements():
        if node.tag != "a":
            continue
        href = node.attrs.get("href")
        if href is None:
            continue
        href = unescape(href).strip()
        if not href or href.startswith("javascript:") or href.startswith("#"):
            continue
        absolute = resolve_href(base_url, href)
        if absolute is None:
            continue
        out.append((absolute, ix, id(node) in nav_scope))
        ix += 1
    return out


def discover_nav_urls(
    html: str, base_url: str, discovery_selector: str = "nav, aside, [role='navigation']"
) -> list[str]:
    """Parity with ``discoverNavigationUrls`` (reference src/core.ts:87-131):
    anchors under the discovery-selector containers, DOM order, resolved
    absolute, ``javascript:``/bare-fragment dropped, in-page dedup via
    insertion-ordered set. Scope (match/exclude) filtering happens at the
    call site like the reference's in-page filter (src/core.ts:115-128).

    Driver-side single-page helper (the reference runs this once per job in
    a pre-crawl browser step); the bulk path uses ``extract_links`` UDFs.
    """
    from .urlnorm import resolve_href

    if not html:
        return []
    root = parse_html(html)
    seen: set[str] = set()
    out: list[str] = []
    for container in query_selector_all(root, discovery_selector):
        for n in container.iter():
            if n.tag != "a":
                continue
            href = n.attrs.get("href")
            if href is None:
                continue
            href = unescape(href).strip()
            if not href or href.startswith("javascript:") or href.startswith("#"):
                continue
            absolute = resolve_href(base_url, href)
            if absolute is None or absolute in seen:
                continue
            seen.add(absolute)
            out.append(absolute)
    return out


_SITEMAP_LOC = re.compile(r"<loc>\s*([^<\s][^<]*?)\s*</loc>", re.IGNORECASE)


def expand_sitemap_seeds(
    seeds: list[str],
    fetch=None,
    in_scope=None,
    is_sitemap=None,
    max_depth: int = 3,
    fetch_many=None,
) -> list[str]:
    """Expand seed URLs through sitemaps INCLUDING nested ``<sitemapindex>``
    files (the standard large-site layout: an index of sitemaps of pages).
    Depth-first in document order, so the flattened seed order equals the
    order a sequential reader of the sitemap tree would produce; cycle-
    guarded; ``max_depth`` bounds index-of-index chains (3 is the
    practical web ceiling). ``in_scope`` filters only URLs discovered FROM
    a sitemap — explicit non-sitemap seeds pass through unfiltered, same
    as the reference's downloadListOfUrls handling (src/core.ts:335-352,
    which is single-level; the nested hop is this engine's extension).

    Fetching is LEVEL-BATCHED (VERDICT r3 #9): the sitemap tree is walked
    breadth-first and each depth level's unseen files go to
    ``fetch_many(urls) -> {url: content}`` as ONE call — in pages-join
    mode that is one Spark join per LEVEL instead of one driver-blocking
    job per sitemap file (a nested index of hundreds of files = O(depth)
    jobs, not O(files)). The flatten then replays depth-first over the
    cached contents, so the output order is exactly the sequential
    reader's. ``fetch_many`` defaults to mapping ``fetch`` per URL."""
    if fetch_many is None:
        fetch_many = lambda urls: {u: fetch(u) for u in urls}  # noqa: E731

    # phase 1 — level-batched fetch of the whole sitemap tree
    contents: dict[str, list[str]] = {}
    fetched: set[str] = set()
    level = list(dict.fromkeys(u for u in seeds if is_sitemap(u)))
    depth = 0
    while level and depth < max_depth:
        new = [u for u in level if u not in fetched]
        fetched.update(new)
        got = fetch_many(new) if new else {}
        nxt: list[str] = []
        for u in new:
            children = parse_sitemap(got.get(u) or "")
            contents[u] = children
            nxt.extend(v for v in children
                       if is_sitemap(v) and v not in fetched)
        level = list(dict.fromkeys(nxt))
        depth += 1

    # phase 2 — depth-first flatten in document order (cached, no I/O)
    out: list[str] = []
    seen: set[str] = set()

    def expand(u: str, d: int, from_sitemap: bool) -> None:
        if is_sitemap(u) and d < max_depth:
            if u in seen:
                return
            seen.add(u)
            for v in contents.get(u, []):
                expand(v, d + 1, True)
        elif not from_sitemap or in_scope(u):
            out.append(u)

    for u in seeds:
        expand(u, 0, False)
    return out


def parse_sitemap(content: str) -> list[str]:
    """Sitemap XML → URL list in document order (reference expands sitemap
    seeds via crawlee's ``downloadListOfUrls``, src/core.ts:335-352). Falls
    back to whitespace-separated plain-text URL lists."""
    if not content:
        return []
    locs = _SITEMAP_LOC.findall(content)
    if locs:
        return [unescape(u) for u in locs]
    return [tok for tok in content.split() if tok.startswith(("http://", "https://"))]


_SITEMAP_URLBLOCK = re.compile(r"<url\b[^>]*>(.*?)</url>", re.S | re.I)
_SITEMAP_LASTMOD = re.compile(r"<lastmod[^>]*>\s*([^<\s]+)\s*</lastmod>", re.I)
_SITEMAP_CHANGEFREQ = re.compile(
    r"<changefreq[^>]*>\s*([^<\s]+)\s*</changefreq>", re.I)
_SITEMAP_PRIORITY = re.compile(
    r"<priority[^>]*>\s*([^<\s]+)\s*</priority>", re.I)


def parse_sitemap_entries(content: str) -> list[tuple[str, str | None]]:
    """Sitemap XML → ``(loc, lastmod | None)`` per ``<url>`` block, in
    document order — the freshness-aware form of ``parse_sitemap`` (the
    sitemaps.org protocol's ``<lastmod>`` drives recrawl scheduling; see
    sources/cdx.sitemap_recrawl_set). Bare ``<loc>`` lists and plain-text
    sitemaps yield None lastmods."""
    return [(u, lm) for (u, lm, _cf, _pr)
            in parse_sitemap_entries_full(content)]


def parse_sitemap_entries_full(
    content: str,
) -> list[tuple[str, str | None, str | None, float | None]]:
    """Sitemap XML → ``(loc, lastmod, changefreq, priority)`` per
    ``<url>`` block — all four sitemaps.org optional fields. changefreq
    is lowercased but otherwise passed through (the protocol says
    consumers may ignore bogus values); a non-numeric ``<priority>``
    yields None. Bare ``<loc>`` lists degrade to all-None metadata."""
    if not content:
        return []
    out: list[tuple[str, str | None, str | None, float | None]] = []
    for block in _SITEMAP_URLBLOCK.findall(content):
        locs = _SITEMAP_LOC.findall(block)
        if not locs:
            continue
        lm = _SITEMAP_LASTMOD.search(block)
        cf = _SITEMAP_CHANGEFREQ.search(block)
        pr = _SITEMAP_PRIORITY.search(block)
        prio: float | None = None
        if pr:
            try:
                prio = float(pr.group(1))
            except ValueError:
                prio = None
        out.append((
            unescape(locs[0]),
            lm.group(1) if lm else None,
            cf.group(1).lower() if cf else None,
            prio,
        ))
    if out:
        return out
    return [(u, None, None, None) for u in parse_sitemap(content)]
