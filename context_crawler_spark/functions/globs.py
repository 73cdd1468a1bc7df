"""minimatch-compatible glob → regex compiler.

The reference filters URLs with ``minimatch`` (include at src/core.ts:115-121,
exclude at src/core.ts:122-128, enqueue-side globs at src/core.ts:203-207).
We compile each glob ONCE at plan time into a Java/Python-compatible regex so
the hot-path filter is a built-in, whole-stage-codegen'd ``rlike`` on the JVM —
no Python in the per-URL path.

Supported surface (everything the reference's job configs plus fixtures use):
  * ``*``    — any run of non-``/`` chars (won't match a leading ``.`` of a
               path segment unless ``dot=True``, matching minimatch defaults)
  * ``?``    — one non-``/`` char (same dot rule)
  * ``**``   — as a full path segment: zero or more whole segments; a
               TRAILING ``/**`` also matches the bare prefix itself
               (minimatch matchOne: a pattern ending in GLOBSTAR matches when
               the remaining path is empty)
  * ``[...]`` / ``[!...]`` — character classes
  * ``{a,b}`` — brace alternation (nested) and ``{1..3}`` numeric ranges
  * ``**`` mixed with other chars in a segment degrades to ``*`` (minimatch
    treats non-bare globstars as plain stars)

``exclude`` handling replicates ``expandExcludePatterns``
(reference src/core.ts:58-72): every pattern is kept, and plain directory
paths (no ``*``, not ending in ``/``) additionally get a ``{p}/**`` variant.

``dot=True`` disables the leading-dot guard; the emitted regex is then free
of lookaheads and therefore RE2-safe (usable in DuckDB oracles as well as
Spark ``rlike`` / Python ``re``).
"""

from __future__ import annotations

import re

_GLOBSTAR = object()


def expand_braces(pattern: str) -> list[str]:
    """Brace expansion: ``a{b,c}d`` → [``abd``, ``acd``]; ``{1..3}`` → 1,2,3.

    Mirrors the minimatch/brace-expansion preprocessing step. Patterns with
    no braces come back as a one-element list.
    """
    # Find first top-level brace group.
    depth = 0
    start = -1
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if c == "{":
            if depth == 0:
                start = i
            depth += 1
        elif c == "}" and depth > 0:
            depth -= 1
            if depth == 0:
                inner = pattern[start + 1 : i]
                prefix, suffix = pattern[:start], pattern[i + 1 :]
                options = _split_brace_options(inner)
                if options is None:  # not a real alternation, keep literal
                    i += 1
                    continue
                out: list[str] = []
                for opt in options:
                    for rest in expand_braces(prefix + opt + suffix):
                        if rest not in out:
                            out.append(rest)
                return out
        i += 1
    return [pattern]


def _split_brace_options(inner: str) -> list[str] | None:
    m = re.fullmatch(r"(-?\d+)\.\.(-?\d+)", inner)
    if m:
        lo, hi = int(m.group(1)), int(m.group(2))
        step = 1 if hi >= lo else -1
        return [str(n) for n in range(lo, hi + step, step)]
    parts: list[str] = []
    depth = 0
    cur = []
    for c in inner:
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
        if c == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
    parts.append("".join(cur))
    if len(parts) == 1:
        return None  # "{x}" with no comma is literal in minimatch
    return parts


def _segment_to_regex(seg: str, dot: bool) -> str:
    """One path segment (no ``/``) → regex fragment."""
    out: list[str] = []
    i = 0
    # minimatch dot rule: a segment whose pattern STARTS with a wildcard
    # refuses to match a segment starting with '.' (unless options.dot).
    leading_guard_needed = not dot and seg[:1] in ("*", "?")
    while i < len(seg):
        c = seg[i]
        if c == "\\" and i + 1 < len(seg):
            out.append(re.escape(seg[i + 1]))
            i += 2
            continue
        if c == "*":
            # collapse runs of * within a segment to a single star
            while i + 1 < len(seg) and seg[i + 1] == "*":
                i += 1
            out.append("[^/]*")
            i += 1
            continue
        if c == "?":
            out.append("[^/]")
            i += 1
            continue
        if c == "[":
            j = i + 1
            neg = False
            if j < len(seg) and seg[j] in "!^":
                neg = True
                j += 1
            # find closing ] (a ] immediately after opener is literal)
            k = j
            if k < len(seg) and seg[k] == "]":
                k += 1
            while k < len(seg) and seg[k] != "]":
                k += 1
            if k >= len(seg):  # unterminated class → literal [
                out.append(re.escape("["))
                i += 1
                continue
            body = seg[j:k].replace("\\", "\\\\")
            out.append(("[^" if neg else "[") + body + "]")
            i = k + 1
            continue
        out.append(re.escape(c))
        i += 1
    frag = "".join(out)
    if leading_guard_needed:
        frag = r"(?!\.)" + frag
    return frag


def glob_to_regex(pattern: str, dot: bool = False) -> str:
    """Compile ONE brace-free glob to an anchored regex string.

    Globstar semantics match minimatch's ``matchOne``: a ``**`` segment
    consumes zero or more whole path segments, and a *trailing* ``**`` also
    matches the bare prefix (``a/**`` matches ``a``) because minimatch
    returns true when the pattern ends in GLOBSTAR and the path is exhausted.
    """
    segments = pattern.split("/")
    parsed: list[object] = [
        _GLOBSTAR if seg == "**" else _segment_to_regex(seg, dot) for seg in segments
    ]
    seg_guard = "" if dot else r"(?!\.)"
    any_seg = f"{seg_guard}[^/]*"
    r = ""
    join_slash = False  # whether the next literal segment needs a '/' joiner
    i = 0
    n = len(parsed)
    while i < n:
        p = parsed[i]
        if p is _GLOBSTAR:
            while i + 1 < n and parsed[i + 1] is _GLOBSTAR:
                i += 1  # collapse ** runs
            if i == n - 1:  # trailing globstar
                if not r:
                    r = f"{any_seg}(?:/{any_seg})*"
                else:
                    r += f"(?:/{any_seg})*"
                join_slash = True
            else:  # zero-or-more segments, each with its trailing '/'
                r += ("/" if r else "") + f"(?:{any_seg}/)*"
                join_slash = False  # joiner lives inside the star group
        else:
            r += ("/" if join_slash else "") + p  # type: ignore[operator]
            join_slash = True
        i += 1
    return "^" + r + "$"


class GlobMatcher:
    """A compiled set of include/exclude globs.

    ``compile`` happens once at plan time; ``regexes()`` hands the anchored
    patterns to Spark ``rlike`` so per-URL matching stays JVM-side.
    """

    def __init__(self, patterns: str | list[str] | None, dot: bool = False):
        if patterns is None:
            patterns = []
        if isinstance(patterns, str):
            patterns = [patterns]
        self.patterns = list(patterns)
        self.regexes: list[str] = []
        for p in self.patterns:
            for expanded in expand_braces(p):
                self.regexes.append(glob_to_regex(expanded, dot=dot))
        self._compiled = [re.compile(r) for r in self.regexes]

    def matches(self, s: str) -> bool:
        return any(r.match(s) for r in self._compiled)

    def combined_regex(self) -> str | None:
        """One alternation regex for a single ``rlike`` call."""
        if not self.regexes:
            return None
        return "|".join(f"(?:{r[1:-1]})" for r in self.regexes).join(["^(?:", ")$"])


def expand_exclude_patterns(patterns: list[str]) -> list[str]:
    """Parity with ``expandExcludePatterns`` (reference src/core.ts:58-72):
    keep every pattern; plain directory paths (no ``*``, no trailing ``/``)
    also get ``{p}/**``. Order: originals interleaved with their expansions,
    first-seen wins (Set insertion order)."""
    expanded: list[str] = []
    seen: set[str] = set()
    for p in patterns:
        if p not in seen:
            expanded.append(p)
            seen.add(p)
        if "*" not in p and not p.endswith("/"):
            v = f"{p}/**"
            if v not in seen:
                expanded.append(v)
                seen.add(v)
    return expanded


def normalize_and_expand_excludes(exclude: str | list[str] | None) -> list[str]:
    """Parity with ``normalizeAndExpandExcludes`` (reference src/core.ts:78-81)."""
    patterns = [exclude] if isinstance(exclude, str) else (exclude or [])
    return expand_exclude_patterns(patterns)
