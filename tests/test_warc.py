"""WARC source: parse round-trip, gzip-member handling, record filtering,
and end-to-end WARC → pages table → fused extraction."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from context_crawler_spark.sources.warc import (
    gunzip_members,
    iter_warc_records,
    read_warc,
    records_from_file,
    write_warc,
)

ROWS = [
    ("https://a.test/page1", datetime(2017, 3, 6, 4, 2, 6),
     b"<html><head><title>P1</title></head><body><article>Alpha one."
     b"</article></body></html>"),
    ("https://b.test/page2", datetime(2020, 1, 2, 3, 4, 5),
     "<html><body><article>Unicodé 世界</article></body></html>"
     .encode()),
]


def test_roundtrip_plain_and_gzipped():
    for gz in (False, True):
        raw = write_warc(ROWS, gzip_members=gz)
        got = records_from_file(raw)
        assert [(u, t) for u, t, _ in got] == [(u, t) for u, t, _ in ROWS]
        assert [h for *_x, h in got] == [h for *_y, h in ROWS]


def test_gzip_member_concatenation_not_single_stream():
    """CC gzips each record as its own member — a parser that stops after
    the first member would drop every record but the first."""
    raw = write_warc(ROWS, gzip_members=True)
    # sanity: two distinct gzip magic headers present
    assert raw.count(b"\x1f\x8b") >= 2
    plain = gunzip_members(raw)
    assert len(list(iter_warc_records(plain))) == 2


def test_non_response_and_non_html_records_skipped():
    body = b"software: test"
    warcinfo = (
        "WARC/1.1\r\nWARC-Type: warcinfo\r\n"
        "WARC-Date: 2017-03-06T04:02:06Z\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body + b"\r\n\r\n"
    png_http = (b"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\n" +
                b"\x89PNG....")
    png = (
        "WARC/1.1\r\nWARC-Type: response\r\n"
        "WARC-Target-URI: https://a.test/x.png\r\n"
        "WARC-Date: 2017-03-06T04:02:06Z\r\n"
        f"Content-Length: {len(png_http)}\r\n\r\n"
    ).encode() + png_http + b"\r\n\r\n"
    raw = warcinfo + png + write_warc(ROWS[:1])
    got = records_from_file(raw)
    assert len(got) == 1 and got[0][0] == "https://a.test/page1"


def test_resource_records_payload_typing():
    """`resource` records carry no HTTP message — the WARC Content-Type /
    WARC-Identified-Payload-Type header decides, and untyped non-HTML bytes
    (images, CSS, PDFs) must NOT default into the pages table."""
    def resource(uri, body, extra=""):
        return (
            "WARC/1.1\r\nWARC-Type: resource\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            "WARC-Date: 2017-03-06T04:02:06Z\r\n"
            f"{extra}"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body + b"\r\n\r\n"

    raw = (
        resource("https://a.test/img.png", b"\x89PNG\r\n....")  # untyped binary
        + resource("https://a.test/style.css", b"body { color: red }",
                   "Content-Type: text/css\r\n")
        + resource("https://a.test/doc.html", b"<html><body>ok</body></html>",
                   "Content-Type: text/html\r\n")
        + resource("https://a.test/sniffed.html",
                   b"<!DOCTYPE html><html><body>s</body></html>")  # untyped HTML
        + resource("https://a.test/idpt.html", b"<p>via idpt</p>",
                   "WARC-Identified-Payload-Type: text/html\r\n")
    )
    got = records_from_file(raw)
    assert [u for u, *_ in got] == [
        "https://a.test/doc.html",
        "https://a.test/sniffed.html",
        "https://a.test/idpt.html",
    ]


def test_response_without_content_type_sniffs():
    """A response lacking an HTTP Content-Type header is kept only when the
    entity sniffs as HTML."""
    def response(uri, http):
        return (
            "WARC/1.1\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            "WARC-Date: 2017-03-06T04:02:06Z\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode() + http + b"\r\n\r\n"

    html_http = b"HTTP/1.1 200 OK\r\n\r\n  <!doctype html><html>x</html>"
    bin_http = b"HTTP/1.1 200 OK\r\n\r\n\x89PNG\r\n...."
    got = records_from_file(response("https://a.test/h", html_http)
                            + response("https://a.test/b", bin_http))
    assert [u for u, *_ in got] == ["https://a.test/h"]


def test_truncated_tail_stops_cleanly():
    raw = write_warc(ROWS)
    assert len(records_from_file(raw[: len(raw) - 40])) == 1


def test_read_warc_to_pages_and_extract(spark, tmp_path):
    """End to end: .warc.gz files on disk → read_warc → the pages-table
    contract → the engine's extraction path produces the expected text."""
    from context_crawler_spark.functions.extract import extract_text

    p1 = tmp_path / "part1.warc.gz"
    p1.write_bytes(write_warc(ROWS[:1], gzip_members=True))
    p2 = tmp_path / "part2.warc"
    p2.write_bytes(write_warc(ROWS[1:]))

    pages = read_warc(spark, str(tmp_path)).orderBy("url")
    rows = pages.collect()
    assert [r["url"] for r in rows] == ["https://a.test/page1",
                                        "https://b.test/page2"]
    assert rows[0]["warc_ts"] == ROWS[0][1]
    assert bytes(rows[0]["html"]) == ROWS[0][2]  # byte-identical payload
    texts = [
        extract_text(bytes(r["html"]).decode("utf-8"), "article")
        for r in rows
    ]
    assert texts == ["Alpha one.", "Unicodé 世界"]
    # schema is the pages contract the scheduler's fetch join expects
    assert dict((f.name, f.dataType.simpleString())
                for f in pages.schema.fields) == {
        "url": "string", "warc_ts": "timestamp", "html": "binary"}


def test_crawl_scheduler_over_warc_pages(spark, tmp_path):
    """The full engine path on a WARC-backed pages table: read_warc feeds
    the scheduler's fetch join exactly like a parquet pages table — link
    discovery, politeness, extraction, visit order all unchanged."""
    from context_crawler_spark.config import CrawlConfig
    from context_crawler_spark.plans.scheduler import CrawlScheduler
    from context_crawler_spark.state import SnapshotStore

    rows = [
        ("https://w.test/", datetime(2020, 1, 1),
         b'<html><body><nav><a href="/a">A</a><a href="/b">B</a></nav>'
         b'<article>Home</article></body></html>'),
        ("https://w.test/a", datetime(2020, 1, 1),
         b"<html><body><article>Page A</article></body></html>"),
        ("https://w.test/b", datetime(2020, 1, 1),
         b"<html><body><article>Page B</article></body></html>"),
    ]
    (tmp_path / "crawl.warc.gz").write_bytes(
        write_warc(rows, gzip_members=True))
    pages = read_warc(spark, str(tmp_path))
    cfg = CrawlConfig(entry="https://w.test/", match=["https://w.test/**"],
                      selector="article")
    eng = CrawlScheduler(spark, SnapshotStore(str(tmp_path / "st")), cfg,
                         pages, n_buckets=4)
    eng.run(max_rounds=10)
    assert eng.visit_order() == [
        "https://w.test/", "https://w.test/a", "https://w.test/b"]
    texts = {r["url"]: r["text"] for r in eng.pages_out().collect()}
    assert texts["https://w.test/a"] == "Page A"


def test_warc_to_pages_full_schema(spark, tmp_path):
    """warc_to_pages emits the exact north-rule input shape:
    (url, warc_ts, html binary, text, lang)."""
    from context_crawler_spark.sources.warc import warc_to_pages

    (tmp_path / "x.warc.gz").write_bytes(write_warc(ROWS, gzip_members=True))
    pages = warc_to_pages(spark, str(tmp_path), selector="article")
    assert [(f.name, f.dataType.simpleString()) for f in pages.schema.fields] == [
        ("url", "string"), ("warc_ts", "timestamp"), ("html", "binary"),
        ("text", "string"), ("lang", "string"),
    ]
    got = {r["url"]: (r["text"], r["lang"]) for r in pages.collect()}
    assert got["https://a.test/page1"][0] == "Alpha one."
    assert got["https://b.test/page2"][0] == "Unicodé 世界"
    assert all(isinstance(v[1], str) for v in got.values())


def test_write_warc_files_distributed_roundtrip(spark, tmp_path):
    """The distributed WARC sink (r3): DataFrame → part-*.warc.gz (warcinfo
    lead record, one gzip member per record, deterministic bytes) →
    read_warc recovers EXACTLY the input rows."""
    import glob
    import os

    from context_crawler_spark.sources.warc import (
        records_from_file, write_warc_files,
    )

    n = 40
    rows = [
        (f"https://s{i % 3}.test/p{i}", datetime(2021, 5, 4, 3, 2, 1),
         f"<html><body><article>doc {i}</article></body></html>".encode())
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    out = str(tmp_path / "warc_out")
    n_files = write_warc_files(df, out, target_mb=256)
    files = sorted(glob.glob(os.path.join(out, "part-*.warc.gz")))
    assert len(files) == n_files >= 1

    # warcinfo record leads each file and is skipped by the page reader
    first = open(files[0], "rb").read()
    from context_crawler_spark.sources.warc import gunzip_members, iter_warc_records
    recs = list(iter_warc_records(gunzip_members(first)))
    assert recs[0][0]["warc-type"] == "warcinfo"
    assert b"software: context-crawler-spark" in recs[0][1]

    back = read_warc(spark, out)
    got = {(r["url"], r["warc_ts"], bytes(r["html"])) for r in back.collect()}
    assert got == set(rows)

    # determinism: a second write produces byte-identical files
    out2 = str(tmp_path / "warc_out2")
    write_warc_files(df, out2, target_mb=256)
    for f1 in files:
        f2 = os.path.join(out2, os.path.basename(f1))
        assert open(f1, "rb").read() == open(f2, "rb").read()


def test_write_warc_files_size_targeting(spark, tmp_path):
    """File count scales with total payload bytes / target size."""
    from context_crawler_spark.sources.warc import write_warc_files

    big = b"x" * (1 << 20)  # 1 MiB payload per row
    rows = [(f"https://s.test/p{i}", datetime(2021, 1, 1), big)
            for i in range(8)]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    out = str(tmp_path / "w")
    n_files = write_warc_files(df, out, target_mb=2)  # 8 MiB / 2 MiB → 4
    assert n_files == 4
    back = read_warc(spark, out)
    assert back.count() == 8


def test_sniff_accepts_bom_xml_prolog_and_leading_comment():
    """ADVICE r3: typeless records opening with a UTF-8 BOM, an XML prolog
    (XHTML), or a leading comment are HTML when an <html>/<!doctype>
    follows; RSS/SVG and other non-HTML XML stay excluded."""
    def response(uri, entity):
        http = b"HTTP/1.1 200 OK\r\n\r\n" + entity
        return (
            "WARC/1.1\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            "WARC-Date: 2017-03-06T04:02:06Z\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode() + http + b"\r\n\r\n"

    cases = {
        "https://a.test/bom": b"\xef\xbb\xbf<!doctype html><html>x</html>",
        "https://a.test/xhtml": (
            b'<?xml version="1.0" encoding="UTF-8"?>\n'
            b'<!DOCTYPE html><html xmlns="http://www.w3.org/1999/xhtml">'
            b"x</html>"),
        "https://a.test/comment": (
            b"<!-- served by cache -->\n<html><body>x</body></html>"),
        "https://a.test/rss": (
            b'<?xml version="1.0"?><rss version="2.0"><channel/></rss>'),
        "https://a.test/svg": (
            b'<?xml version="1.0"?><svg xmlns="http://www.w3.org/2000/svg"/>'),
        "https://a.test/png": b"\x89PNG\r\n....",
    }
    raw = b"".join(response(u, e) for u, e in cases.items())
    got = [u for u, *_ in records_from_file(raw)]
    assert got == ["https://a.test/bom", "https://a.test/xhtml",
                   "https://a.test/comment"]


def test_write_warc_files_returns_actual_file_count(spark, tmp_path):
    """ADVICE r3: empty range partitions write no file — the returned
    count must be files actually produced, not partitions planned."""
    import os as _os

    from context_crawler_spark.sources.warc import write_warc_files

    big = b"y" * (1 << 20)
    # every row shares one url → range partitioning puts them ALL in one
    # of the 4 planned partitions; the other 3 write nothing
    rows = [("https://one.test/only", datetime(2021, 1, 1), big)
            for _ in range(8)]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    out = str(tmp_path / "w")
    n = write_warc_files(df, out, target_mb=2)
    on_disk = [e for e in _os.listdir(out) if e.endswith(".warc.gz")]
    assert n == len(on_disk) == 1
    assert not any(e.endswith(".tmp") or ".tmp-" in e for e in _os.listdir(out))
    back = read_warc(spark, out)
    assert back.count() == 8


def test_wet_sink_roundtrip(spark, tmp_path):
    """WET sink (r4): pages' extracted text → part-*.warc.wet.gz of
    conversion records → read_wet recovers exactly the input rows; bytes
    are deterministic across re-runs; WARC-Refers-To matches the id the
    WARC sink writes for the same (url, ts)."""
    import glob
    import os

    from context_crawler_spark.sources.warc import (
        _record_id, gunzip_members, iter_warc_records, read_wet,
        write_wet_files,
    )

    rows = [
        (f"https://s{i % 3}.test/p{i}", datetime(2022, 7, 8, 9, 10, 11),
         f"doc {i} körper 世界" if i % 2 else f"plain doc {i}")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    out = str(tmp_path / "wet_out")
    n_files = write_wet_files(df, out, target_mb=150)
    files = sorted(glob.glob(os.path.join(out, "part-*.warc.wet.gz")))
    assert len(files) == n_files >= 1

    recs = list(iter_warc_records(gunzip_members(open(files[0], "rb").read())))
    assert recs[0][0]["warc-type"] == "warcinfo"
    conv = [r for r in recs if r[0]["warc-type"] == "conversion"]
    assert conv and conv[0][0]["warc-refers-to"] == _record_id(
        conv[0][0]["warc-target-uri"],
        datetime(2022, 7, 8, 9, 10, 11))
    assert conv[0][0]["warc-block-digest"].startswith("md5:")

    back = read_wet(spark, out)
    assert {(r["url"], r["warc_ts"], r["text"]) for r in back.collect()} \
        == set(rows)

    out2 = str(tmp_path / "wet_out2")
    write_wet_files(df, out2, target_mb=150)
    for f1 in files:
        f2 = os.path.join(out2, os.path.basename(f1))
        assert open(f1, "rb").read() == open(f2, "rb").read()


def test_wat_sink_roundtrip(spark, tmp_path):
    """WAT sink (r4): (url, ts, title, links) → part-*.warc.wat.gz of
    canonical-JSON metadata records → read_wat recovers the rows."""
    import glob
    import os

    from context_crawler_spark.sources.warc import read_wat, write_wat_files

    rows = [
        (f"https://s.test/p{i}", datetime(2022, 1, 2, 3, 4, 5),
         f"Title {i}", [f"https://s.test/p{i}/a", f"https://x.test/{i}"])
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, title string, links array<string>")
    out = str(tmp_path / "wat_out")
    n_files = write_wat_files(df, out)
    assert sorted(glob.glob(os.path.join(out, "part-*.warc.wat.gz"))) \
        and n_files >= 1
    back = read_wat(spark, out)
    got = {(r["url"], r["warc_ts"], r["title"], tuple(r["links"]))
           for r in back.collect()}
    assert got == {(u, t, ti, tuple(ls)) for u, t, ti, ls in rows}


def test_wet_record_overhead_matches_serializer():
    """The arithmetic the wet_export_plan oracle replays in SQL equals the
    real serializer's byte count, across url lengths, digit widths of
    Content-Length, and non-ASCII text."""
    from context_crawler_spark.sources.warc import (
        serialize_conversion_record, wet_record_overhead,
    )

    ts = datetime(2023, 11, 14, 22, 13, 20)
    for url in ("https://a.t/", "https://www.example.test/docs/p123",
                "https://x.test/" + "q" * 200):
        for text in (b"", b"x", b"y" * 9, b"z" * 10, b"w" * 12345,
                     "Unicodé 世界".encode()):
            rec = serialize_conversion_record(url, ts, text)
            assert len(rec) == wet_record_overhead(url, len(text)) + len(text)


def test_write_warc_files_deduped_revisit_records(spark, tmp_path):
    """Duplicate payloads write 0-byte revisit records pointing at the
    first capture; originals round-trip through read_warc; revisit
    headers carry the matching digest + original URI/date; re-runs are
    byte-identical."""
    import glob
    import os

    from context_crawler_spark.sources.warc import (
        gunzip_members, iter_warc_records, write_warc_files_deduped,
    )

    body_a, body_b = b"<html><body>alpha</body></html>", \
        b"<html><body>beta</body></html>"
    rows = [
        ("https://a.test/orig", datetime(2021, 1, 1, 0, 0, 0), body_a),
        ("https://a.test/copy1", datetime(2021, 1, 2, 0, 0, 0), body_a),
        ("https://b.test/copy2", datetime(2021, 1, 3, 0, 0, 0), body_a),
        ("https://b.test/uniq", datetime(2021, 1, 1, 0, 0, 0), body_b),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary")
    out = str(tmp_path / "w")
    res = write_warc_files_deduped(df, out)
    assert res == {"files": res["files"], "records": 4, "revisits": 2}

    recs = []
    for f in sorted(glob.glob(os.path.join(out, "part-*.warc.gz"))):
        recs.extend(iter_warc_records(gunzip_members(open(f, "rb").read())))
    by_type: dict[str, list] = {}
    for h, b in recs:
        by_type.setdefault(h["warc-type"], []).append((h, b))
    assert len(by_type["response"]) == 2
    assert len(by_type["revisit"]) == 2
    import hashlib
    dig_a = hashlib.md5(body_a).hexdigest()
    for h, b in by_type["revisit"]:
        assert b == b""
        assert h["warc-payload-digest"] == f"md5:{dig_a}"
        assert h["warc-refers-to-target-uri"] == "https://a.test/orig"
        assert h["warc-refers-to-date"] == "2021-01-01T00:00:00Z"
        assert h["content-length"] == "0"

    # reader yields only full captures (revisits resolve via the index)
    back = read_warc(spark, out)
    got = {(r["url"], bytes(r["html"])) for r in back.collect()}
    assert got == {("https://a.test/orig", body_a),
                   ("https://b.test/uniq", body_b)}

    out2 = str(tmp_path / "w2")
    write_warc_files_deduped(df, out2)
    for f in sorted(glob.glob(os.path.join(out, "part-*.warc.gz"))):
        f2 = os.path.join(out2, os.path.basename(f))
        assert open(f, "rb").read() == open(f2, "rb").read()
