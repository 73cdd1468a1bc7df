"""Golden tests for the pinned extraction functions (parity surface with
``getPageHtml``, reference src/core.ts:32-51, and link discovery
src/core.ts:87-131)."""

from context_crawler_spark.functions.extract import (
    extract_links,
    extract_text,
    extract_title,
    inner_text,
    parse_html,
    query_selector,
    query_selector_all,
)

DOC = """<html><head><title>My Page | Site</title></head><body>
<nav><ul><li><a href="/docs/a">A</a></li><li><a href="/docs/b">B</a></li></ul></nav>
<article id="main">
<h1>Heading One</h1>
<p>First   paragraph with  <strong>bold</strong> text.</p>
<p>Second paragraph.</p>
<pre>code line 1
  indented line 2</pre>
<ul><li>item one</li><li>item two</li></ul>
<a href="https://ext.test/x">external</a>
<a href="javascript:void(0)">js</a>
<a href="#frag">frag</a>
</article>
<aside><a href="/docs/c">C</a></aside>
</body></html>"""


def test_css_selector_first_match_inner_text():
    text = extract_text(DOC, "article")
    assert text == (
        "Heading One\n"
        "\n"
        "First paragraph with bold text.\n"
        "\n"
        "Second paragraph.\n"
        "\n"
        "code line 1\n"
        "  indented line 2\n"
        "item one\n"
        "item two\n"
        "external js frag"
    )


def test_missing_selector_returns_empty():
    assert extract_text(DOC, "main") == ""
    assert extract_text(DOC, ".nope") == ""


def test_id_selector():
    assert extract_text(DOC, "#main") == extract_text(DOC, "article")


def test_xpath_returns_text_content_verbatim():
    html = "<html><body><article><p>Hello <b>world</b></p></article></body></html>"
    # textContent: raw concatenation, no whitespace processing
    assert extract_text(html, "/html/body/article") == "Hello world"


def test_xpath_positional():
    html = "<html><body><p>one</p><p>two</p></body></html>"
    assert extract_text(html, "/html/body/p[2]") == "two"


def test_xpath_no_match_empty():
    assert extract_text(DOC, "/html/body/section") == ""


def test_title():
    assert extract_title(DOC) == "My Page | Site"
    assert extract_title("<html><body>x</body></html>") == ""


def test_whitespace_collapse():
    html = "<html><body><article>a   b\n\t c</article></body></html>"
    assert extract_text(html, "article") == "a b c"


def test_br_breaks_lines():
    html = "<html><body><article>a<br>b<br><br>c</article></body></html>"
    assert extract_text(html, "article") == "a\nb\n\nc"


def test_attribute_selector():
    html = '<html><body><div role="navigation"><a href="/x">x</a></div></body></html>'
    root = parse_html(html)
    assert query_selector(root, "[role='navigation']") is not None
    assert len(query_selector_all(root, "nav, aside, [role='navigation']")) == 1


def test_extract_links_order_and_filters():
    links = extract_links(DOC, "https://site.test/page")
    hrefs = [(url, nav) for url, _, nav in links]
    assert hrefs == [
        ("https://site.test/docs/a", True),
        ("https://site.test/docs/b", True),
        ("https://ext.test/x", False),
        ("https://site.test/docs/c", True),  # aside is in nav scope
    ]
    assert [ix for _, ix, _ in links] == [0, 1, 2, 3]


def test_inner_text_p_margins_no_leading_trailing_blank():
    html = "<html><body><article><p>only</p></article></body></html>"
    assert extract_text(html, "article") == "only"


def test_descendant_selector():
    root = parse_html(DOC)
    assert query_selector(root, "article h1") is not None
    assert query_selector(root, "nav h1") is None


def test_compound_class_selector():
    html = '<html><body><div class="a b">yes</div><div class="c">no</div></body></html>'
    assert extract_text(html, "div.b") == "yes"


def test_parse_sitemap_entries_lastmod():
    """<lastmod> extraction per <url> block, order preserved; bare-loc
    and plain-text sitemaps fall back to None lastmods."""
    from context_crawler_spark.functions.extract import parse_sitemap_entries

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://a.test/p1</loc><lastmod>2024-01-05</lastmod></url>"
        "<url><loc>https://a.test/p2</loc></url>"
        "<url><lastmod>2024-01-06T10:00:00Z</lastmod>"
        "<loc>https://a.test/p3</loc></url>"
        "</urlset>"
    )
    assert parse_sitemap_entries(xml) == [
        ("https://a.test/p1", "2024-01-05"),
        ("https://a.test/p2", None),
        ("https://a.test/p3", "2024-01-06T10:00:00Z"),
    ]
    assert parse_sitemap_entries(
        "<urlset><loc>https://b.test/x</loc></urlset>"
    ) == [("https://b.test/x", None)]
    assert parse_sitemap_entries("https://c.test/1\nhttps://c.test/2") == [
        ("https://c.test/1", None), ("https://c.test/2", None)]
    assert parse_sitemap_entries("") == []


def test_extract_canonical_link():
    """rel=canonical extraction: first matching <link> wins, relative
    hrefs resolve against the base, rel token-list matching, absent or
    empty href -> None."""
    from context_crawler_spark.functions.extract import extract_canonical

    html = ('<html><head><title>t</title>'
            '<link rel="stylesheet" href="/x.css">'
            '<link rel="canonical" href="/clean/page">'
            '<link rel="canonical" href="https://late.test/ignored">'
            '</head><body>hi</body></html>')
    assert extract_canonical(html, "https://a.test/dirty?u=1") == \
        "https://a.test/clean/page"
    assert extract_canonical(html) == "/clean/page"   # no base: raw href
    assert extract_canonical(
        '<link rel="alternate canonical" href="https://b.test/c">',
        "https://a.test/") == "https://b.test/c"      # rel token list
    assert extract_canonical("<p>no links</p>", "https://a.test/") is None
    assert extract_canonical(
        '<link rel="canonical" href="">', "https://a.test/") is None
    assert extract_canonical(None, "https://a.test/") is None
    assert extract_canonical("", "https://a.test/") is None


def test_extract_meta_robots():
    from context_crawler_spark.functions.extract import extract_meta_robots

    html = ('<html><head>'
            '<meta name="viewport" content="width=device-width">'
            '<meta name="ROBOTS" content="NOINDEX, nofollow">'
            '<meta name="robots" content="all">'
            '</head><body>x</body></html>')
    assert extract_meta_robots(html) == "noindex,nofollow"  # first wins
    assert extract_meta_robots("<p>none</p>") is None
    assert extract_meta_robots('<meta name="robots" content="">') is None
    assert extract_meta_robots(
        '<meta name="robots" content="noindex; nofollow">'
    ) == "noindex,nofollow"                # ; tolerated like ,
    assert extract_meta_robots(None) is None
