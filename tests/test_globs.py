"""Table tests for the minimatch→regex compiler, mirroring the reference's
URL filtering semantics (src/core.ts:115-128) and exclude expansion
(src/core.ts:58-72)."""

import pytest

from context_crawler_spark.functions.globs import (
    GlobMatcher,
    expand_braces,
    expand_exclude_patterns,
    glob_to_regex,
    normalize_and_expand_excludes,
)

# (pattern, url, expected) — minimatch ground truth
CASES = [
    # literals
    ("https://zod.dev/basics", "https://zod.dev/basics", True),
    ("https://zod.dev/basics", "https://zod.dev/basics2", False),
    # star within a segment
    ("https://a.test/docs/*", "https://a.test/docs/page1", True),
    ("https://a.test/docs/*", "https://a.test/docs/sub/page", False),
    ("https://a.test/docs/p*1", "https://a.test/docs/page1", True),
    # globstar
    ("https://a.test/docs/**", "https://a.test/docs/a/b/c", True),
    ("https://a.test/docs/**", "https://a.test/docs", True),  # trailing ** matches bare prefix
    ("https://a.test/docs/**", "https://a.test/other", False),
    ("https://a.test/**/end", "https://a.test/end", True),  # ** matches zero segments
    ("https://a.test/**/end", "https://a.test/x/y/end", True),
    ("**", "https://anything.test/x", True),
    # ? and classes
    ("https://a.test/p?ge", "https://a.test/page", True),
    ("https://a.test/p[ao]ge", "https://a.test/page", True),
    ("https://a.test/p[!ao]ge", "https://a.test/page", False),
    # braces
    ("https://a.test/{docs,api}/**", "https://a.test/api/x", True),
    ("https://a.test/{docs,api}/**", "https://a.test/blog/x", False),
    # mixed ** in segment degrades to *
    ("https://a.test/a**b", "https://a.test/aXYb", True),
    ("https://a.test/a**b", "https://a.test/a/b", False),
    # dot rule: * at segment start won't match leading dot
    ("https://a.test/*", "https://a.test/.hidden", False),
    ("https://a.test/*", "https://a.test/visible", True),
]


@pytest.mark.parametrize("pattern,url,expected", CASES)
def test_minimatch_table(pattern, url, expected):
    assert GlobMatcher([pattern]).matches(url) is expected, glob_to_regex(pattern)


def test_expand_braces():
    assert expand_braces("a{b,c}d") == ["abd", "acd"]
    assert expand_braces("x{1..3}") == ["x1", "x2", "x3"]
    assert expand_braces("{a,{b,c}}") == ["a", "b", "c"]
    assert expand_braces("plain") == ["plain"]


def test_exclude_expansion_reference_parity():
    # reference src/core.ts:58-72: plain dirs get /** variant; wildcards kept
    assert expand_exclude_patterns(["/support"]) == ["/support", "/support/**"]
    assert expand_exclude_patterns(["/a/*"]) == ["/a/*"]
    assert expand_exclude_patterns(["/b/"]) == ["/b/"]
    assert expand_exclude_patterns(["/s", "/s"]) == ["/s", "/s/**"]


def test_normalize_and_expand_excludes():
    assert normalize_and_expand_excludes("x") == ["x", "x/**"]
    assert normalize_and_expand_excludes(None) == []


def test_exclude_expansion_blocks_subpaths():
    m = GlobMatcher(expand_exclude_patterns(["https://a.test/support"]))
    assert m.matches("https://a.test/support")
    assert m.matches("https://a.test/support/tickets/1")


def test_combined_regex_matches_same():
    m = GlobMatcher(["https://a.test/docs/**", "https://a.test/api"])
    import re

    combined = re.compile(m.combined_regex())
    for url in [
        "https://a.test/docs/x",
        "https://a.test/api",
        "https://a.test/nope",
        "https://a.test/docs",
    ]:
        assert bool(combined.match(url)) == m.matches(url)


def test_dot_true_is_re2_safe():
    r = glob_to_regex("https://a.test/docs/**", dot=True)
    assert "(?!" not in r  # lookahead-free → usable in DuckDB/RE2 oracles
