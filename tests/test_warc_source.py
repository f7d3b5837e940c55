"""WARC source: crawl-native archive files -> the page frame, end to
end through the real extraction stage."""

from __future__ import annotations

import gzip

from ocr_hardsubx_spark.sources.warc import (
    parse_warc_records,
    read_documents_warc,
)

HTML_A = (b"<html><body><nav><a href='/'>Home</a></nav>"
          b"<div class='content'><p>Article alpha body text that "
          b"should survive extraction.</p></div></body></html>")
HTML_B = (b"<html><body><div class='content'><p>Second page beta "
          b"content.</p></div></body></html>")


def _record(wtype: bytes, uri: bytes, date: bytes, body: bytes) -> bytes:
    head = (b"WARC/1.0\r\n"
            b"WARC-Type: " + wtype + b"\r\n"
            b"WARC-Target-URI: " + uri + b"\r\n"
            b"WARC-Date: " + date + b"\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n"
            b"\r\n")
    return head + body + b"\r\n\r\n"


def _http(body: bytes) -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)


def _warc_blob() -> bytes:
    return (
        _record(b"warcinfo", b"", b"2025-01-01T00:00:00Z", b"software: x")
        + _record(b"response", b"https://a.example/1",
                  b"2025-01-02T03:04:05Z", _http(HTML_A))
        + _record(b"request", b"https://a.example/1",
                  b"2025-01-02T03:04:05Z", b"GET /1 HTTP/1.1\r\n\r\n")
        + _record(b"response", b"https://b.example/2",
                  b"2025-01-03T00:00:00Z", _http(HTML_B))
    )


def test_parse_warc_records_pure():
    got = list(parse_warc_records(_warc_blob()))
    assert [(u, t) for u, t, _ in got] == [
        ("https://a.example/1", "2025-01-02T03:04:05Z"),
        ("https://b.example/2", "2025-01-03T00:00:00Z"),
    ]
    assert got[0][2] == HTML_A and got[1][2] == HTML_B


def test_parse_skips_truncated_and_gzip_roundtrips():
    blob = _warc_blob()
    # truncate the final record's body mid-way: it must be skipped,
    # earlier records still parse
    cut = blob[: blob.rfind(b"Second page") + 3]
    got = list(parse_warc_records(cut))
    assert [u for u, _, _ in got] == ["https://a.example/1"]
    # whole-file gzip (and per-record members decompress the same way)
    assert list(parse_warc_records(gzip.compress(blob))) \
        == list(parse_warc_records(blob))
    # TRUNCATED gzip (mid-member) raises EOFError from gzip, and corrupt
    # deflate raises zlib.error — both must be swallowed, not fatal
    gz = gzip.compress(blob)
    assert list(parse_warc_records(gz[: len(gz) // 2])) == []
    assert list(parse_warc_records(gz[:10] + b"\x00garbage")) == []
    # per-record gzip members (the Common Crawl layout)
    members = b"".join(gzip.compress(r) for r in (
        _record(b"response", b"https://a.example/1",
                b"2025-01-02T03:04:05Z", _http(HTML_A)),
        _record(b"response", b"https://b.example/2",
                b"2025-01-03T00:00:00Z", _http(HTML_B)),
    ))
    assert [u for u, _, _ in parse_warc_records(members)] \
        == ["https://a.example/1", "https://b.example/2"]


def test_warc_to_extraction_end_to_end(spark, tmp_path):
    """Two WARC files (one gzip'd) -> page frame -> the REAL extraction
    stage; extracted text matches the single-node library oracle."""
    from ocr_hardsubx_spark.operators.extract import extract_documents
    from ocr_hardsubx_spark.refimpl import extract_document

    d = tmp_path / "warcs"
    d.mkdir()
    (d / "a.warc").write_bytes(_warc_blob())
    (d / "b.warc.gz").write_bytes(gzip.compress(
        _record(b"response", b"https://c.example/3",
                b"2025-01-04T00:00:00Z", _http(HTML_B))))

    pages = read_documents_warc(spark, str(d))
    rows = {r["url"]: r for r in pages.collect()}
    assert set(rows) == {"https://a.example/1", "https://b.example/2",
                         "https://c.example/3"}
    assert bytes(rows["https://a.example/1"]["html"]) == HTML_A
    assert rows["https://a.example/1"]["warc_ts"].isoformat() \
        .startswith("2025-01-02T03:04:05")

    out = {r["url"]: r["extracted_text"]
           for r in extract_documents(pages, spark).collect()}
    for url, html in [("https://a.example/1", HTML_A),
                      ("https://b.example/2", HTML_B),
                      ("https://c.example/3", HTML_B)]:
        assert out[url] == extract_document(html)["extracted_text"]


def test_parser_never_crashes_or_hangs_on_corruption():
    """Hypothesis fuzz: arbitrary corruption of a valid archive (and
    arbitrary raw bytes) must never raise or loop — damage is the
    normal state of a crawl archive."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    blob = _warc_blob()

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=400))
    def raw_bytes(junk):
        list(parse_warc_records(junk))

    @settings(max_examples=200, deadline=None)
    @given(st.integers(0, len(blob) - 1), st.binary(min_size=1,
                                                    max_size=16))
    def mutated(pos, patch):
        mutant = blob[:pos] + patch + blob[pos + len(patch):]
        for url, ts, body in parse_warc_records(mutant):
            assert isinstance(url, str) and isinstance(body, bytes)

    raw_bytes()
    mutated()


def test_cdx_index_offsets_address_records(spark, tmp_path):
    """The CDX rows must actually ADDRESS the records: slicing the
    decompressed archive at (offset, length) re-parses to exactly that
    record."""
    from ocr_hardsubx_spark.sources.warc import (
        build_cdx, parse_warc_records,
    )

    d = tmp_path / "warcs"
    d.mkdir()
    blob = _warc_blob()
    (d / "a.warc").write_bytes(blob)
    rows = {r["url"]: r for r in build_cdx(spark, str(d)).collect()}
    assert set(rows) == {"https://a.example/1", "https://b.example/2"}
    for url, r in rows.items():
        assert r["file"].endswith("a.warc")
        sliced = blob[r["offset"]: r["offset"] + r["length"]]
        got = list(parse_warc_records(sliced))
        assert len(got) == 1 and got[0][0] == url


def test_split_reader_matches_file_per_task_across_tasks(spark,
                                                         tmp_path):
    """Round-5 verdict item 8: an oversized plain archive read with a
    small split_bytes must (a) fan out across >= 2 tasks and (b)
    produce EXACTLY the file-per-task reader's rows — including a
    record that straddles a split boundary, a decoy ``WARC/`` header
    inside a record body (the anchor demands the \\r\\n\\r\\n separator
    + WARC-Date/Content-Length headers, so it must not bite), and a
    gzip sibling file that stays unsplit."""
    from pyspark.sql import functions as F

    from ocr_hardsubx_spark.sources.warc import (
        read_documents_warc,
        read_documents_warc_split,
    )

    decoy_body = _http(
        b"<html><body>archived warc snippet: \r\n\r\nWARC/1.0\r\n"
        b"WARC-Type: response\r\nWARC-Date: 2020-01-01T00:00:00Z\r\n"
        b"fake but no content-length terminator here</body></html>")
    recs = [_record(b"warcinfo", b"", b"2025-01-01T00:00:00Z",
                    b"software: x")]
    for i in range(40):
        body = _http(b"<html><body>doc %d " % i + b"x" * 700
                     + b"</body></html>")
        recs.append(_record(
            b"response", b"https://big.example/%d" % i,
            b"2025-01-02T03:04:%02dZ" % (i % 60), body))
    recs.insert(20, _record(b"response", b"https://decoy.example/d",
                            b"2025-01-02T09:00:00Z", decoy_body))
    big = b"".join(recs)
    d = tmp_path / "warc"
    d.mkdir()
    (d / "big.warc").write_bytes(big)
    (d / "side.warc.gz").write_bytes(gzip.compress(_warc_blob()))

    whole = read_documents_warc(spark, str(d))
    # split every ~4 KB -> dozens of ranges over the ~40 KB archive
    split = read_documents_warc_split(spark, str(d), split_bytes=4096)

    key = lambda r: (r["url"], r["warc_ts"], bytes(r["html"]))  # noqa: E731
    a = sorted(map(key, whole.collect()))
    b = sorted(map(key, split.collect()))
    assert a == b and len(a) == 40 + 1 + 2   # 40 + decoy + gz pair

    # the split frame genuinely fans out: rows come from >= 2 tasks
    parts = (split.withColumn("pid", F.spark_partition_id())
             .groupBy("pid").count().collect())
    assert len(parts) >= 2
