"""Golden tests for crawlee-uniqueKey-parity canonicalization
(reference crawlee dep, consumed at src/core.ts:203-207,341,349)."""

from context_crawler_spark.functions.urlnorm import (
    canonicalize_url,
    registered_domain,
    resolve_href,
    url_host,
)


def test_lowercases_scheme_and_host_only():
    assert (
        canonicalize_url("HTTPS://Example.COM/Path/Case")
        == "https://example.com/Path/Case"
    )


def test_strips_fragment():
    assert canonicalize_url("https://a.test/p#section") == "https://a.test/p"


def test_keep_fragment_option():
    assert (
        canonicalize_url("https://a.test/p#sec", keep_fragment=True)
        == "https://a.test/p#sec"
    )


def test_strips_single_trailing_slash():
    assert canonicalize_url("https://a.test/docs/") == "https://a.test/docs"
    assert canonicalize_url("https://a.test/") == "https://a.test"


def test_drops_utm_params_and_sorts_rest():
    assert (
        canonicalize_url("https://a.test/p?b=2&utm_source=x&a=1&utm_campaign=y")
        == "https://a.test/p?a=1&b=2"
    )


def test_sorts_raw_pairs_lexicographically():
    # crawlee sorts the raw "k=v" strings, not parsed keys
    assert canonicalize_url("https://a.test/p?a=2&a=10") == "https://a.test/p?a=10&a=2"


def test_trims_whitespace():
    assert canonicalize_url("  https://a.test/x  ") == "https://a.test/x"


def test_unparseable_returns_none():
    assert canonicalize_url("not a url") is None
    assert canonicalize_url("") is None
    assert canonicalize_url(None) is None


def test_idempotent():
    u = "https://A.test/Docs/?utm_x=1&z=9&a=1#frag"
    once = canonicalize_url(u)
    assert canonicalize_url(once) == once


def test_url_host():
    assert url_host("https://Sub.Example.COM:8080/x") == "sub.example.com"
    assert url_host("https://user:pw@h.test/x") == "h.test"
    assert url_host("nope") is None


def test_registered_domain():
    assert registered_domain("docs.example.co.uk") == "example.co.uk"
    assert registered_domain("a.b.example.test") == "example.test"
    assert registered_domain("example.com") == "example.com"
    assert registered_domain("localhost") == "localhost"


def test_resolve_href():
    assert resolve_href("https://a.test/docs/x", "../api") == "https://a.test/api"
    assert resolve_href("https://a.test/docs/", "y") == "https://a.test/docs/y"
    assert resolve_href("https://a.test/", "https://b.test/z") == "https://b.test/z"
