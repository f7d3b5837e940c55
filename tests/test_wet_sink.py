"""WET writer/reader contract: byte-exact conversion-record roundtrip,
framing hazards (CRLFCRLF in text, leading HTTP/), determinism."""

from __future__ import annotations

from ocr_hardsubx_spark.sources.warc import (
    build_wet_blob, parse_warc_records)


def _roundtrip(rows, **kw):
    blob = build_wet_blob(rows, **kw)
    return [(u, ts, body.decode("utf-8"))
            for u, ts, body in parse_warc_records(
                blob, rec_types=(b"conversion",))]


TS = "2025-01-01T00:00:00Z"


def test_roundtrip_basic_and_multirecord():
    rows = [("https://a.example/1", TS, "hello world"),
            ("https://a.example/2", TS, "second doc")]
    assert _roundtrip(rows) == rows
    assert _roundtrip(rows, gzip_compress=False) == rows


def test_roundtrip_hazardous_bodies():
    rows = [
        ("https://a.example/crlf", TS, "a\r\n\r\nb"),     # record framing
        ("https://a.example/http", TS, "HTTP/1.1 raw"),   # no HTTP strip
        ("https://a.example/warc", TS, "WARC/1.0 inside body"),
        ("https://a.example/empty", TS, ""),
        ("https://a.example/uni", TS, "naïve — héllo ✓"),
        ("https://a.example/none", TS, None),             # NULL -> ''
    ]
    got = _roundtrip(rows)
    assert got[:-1] == rows[:-1]
    assert got[-1] == ("https://a.example/none", TS, "")


def test_writer_deterministic_bytes():
    rows = [("https://a.example/1", TS, "hello")]
    assert build_wet_blob(rows) == build_wet_blob(rows)
    assert build_wet_blob(rows, gzip_compress=False) == \
        build_wet_blob(rows, gzip_compress=False)


def test_warcinfo_skipped_and_response_mode_sees_nothing():
    rows = [("https://a.example/1", TS, "hello")]
    blob = build_wet_blob(rows, gzip_compress=False)
    assert blob.startswith(b"WARC/1.0")
    assert b"warcinfo" in blob
    # default (response) mode must yield NO records from a WET file
    assert list(parse_warc_records(blob)) == []
    # conversion mode yields exactly the one page
    assert len(list(parse_warc_records(
        blob, rec_types=(b"conversion",)))) == 1
