"""HTTP message parsing inside WARC response records + the fetch gate."""

import gzip

from ocr_hardsubx_spark.sources.warc import (
    build_response_warc_blob, parse_http_message, parse_warc_http_records)


# --------------------------------------------------------------------------
# parse_http_message
# --------------------------------------------------------------------------

def test_status_and_headers():
    msg = (b"HTTP/1.1 200 OK\r\n"
           b"Content-Type: text/html; charset=utf-8\r\n"
           b"X-Thing: a\r\n\r\nbody bytes")
    status, headers, payload = parse_http_message(msg)
    assert status == 200
    assert headers[b"content-type"] == b"text/html; charset=utf-8"
    assert payload == b"body bytes"


def test_non_http_body_passes_through():
    status, headers, payload = parse_http_message(b"just bytes")
    assert status is None and headers == {} and payload == b"just bytes"


def test_missing_header_terminator():
    status, _, payload = parse_http_message(b"HTTP/1.1 200 OK\r\nX: y")
    assert status == 200 and payload == b""


def test_bad_status_line_is_none():
    status, _, _ = parse_http_message(b"HTTP/1.1 abc\r\n\r\nx")
    assert status is None


def test_chunked_transfer_decoded():
    msg = (b"HTTP/1.1 200 OK\r\n"
           b"Transfer-Encoding: chunked\r\n\r\n"
           b"4\r\nWiki\r\n6\r\npedia \r\nE\r\nin \r\n\r\nchunks.\r\n"
           b"0\r\n\r\n")
    status, _, payload = parse_http_message(msg)
    assert status == 200
    assert payload == b"Wikipedia in \r\n\r\nchunks."


def test_chunked_damage_keeps_raw_body():
    msg = (b"HTTP/1.1 200 OK\r\n"
           b"Transfer-Encoding: chunked\r\n\r\n"
           b"ZZ\r\nnot a chunk")
    _, _, payload = parse_http_message(msg)
    assert payload == b"ZZ\r\nnot a chunk"


def test_content_encoding_gzip_decoded():
    body = gzip.compress(b"compressed payload", mtime=0)
    msg = (b"HTTP/1.1 200 OK\r\n"
           b"Content-Encoding: gzip\r\n\r\n" + body)
    _, _, payload = parse_http_message(msg)
    assert payload == b"compressed payload"


def test_content_encoding_damage_keeps_raw_body():
    msg = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot gzip"
    _, _, payload = parse_http_message(msg)
    assert payload == b"not gzip"


# --------------------------------------------------------------------------
# writer twin + record-level roundtrip
# --------------------------------------------------------------------------

ROWS = [
    ("https://a.example/1", "2025-01-01T00:00:00Z", 200,
     b"text/html; charset=utf-8", b"<html>one</html>", {}),
    ("https://a.example/2", "2025-01-01T00:00:01Z", 404,
     b"text/html", b"not found", {}),
    ("https://a.example/3", "2025-01-01T00:00:02Z", 301,
     b"text/html", b"", {b"Location": b"https://a.example/1"}),
]


def test_response_blob_roundtrip():
    blob = build_response_warc_blob(ROWS)
    got = list(parse_warc_http_records(blob))
    assert [(u, s, ct, body) for u, _ts, s, ct, body in got] == [
        ("https://a.example/1", 200, "text/html; charset=utf-8",
         b"<html>one</html>"),
        ("https://a.example/2", 404, "text/html", b"not found"),
        ("https://a.example/3", 301, "text/html", b""),
    ]


def test_response_blob_gzip_roundtrip():
    blob = build_response_warc_blob(ROWS, gzip_compress=True)
    assert blob[:2] == b"\x1f\x8b"
    assert len(list(parse_warc_http_records(blob))) == 3


def test_existing_reader_still_strips_http():
    """The (url, ts, html) reader path must be unchanged by the
    refactor: response bodies come back HTTP-stripped."""
    from ocr_hardsubx_spark.sources.warc import parse_warc_records

    blob = build_response_warc_blob(ROWS)
    got = {u: body for u, _ts, body in parse_warc_records(blob)}
    assert got["https://a.example/1"] == b"<html>one</html>"


def test_chunked_and_gzip_inside_record():
    rows = [("https://a.example/c", "2025-01-01T00:00:00Z", 200,
             b"text/html", b"chunk me", {b"X-Chunk": b"1"})]
    blob = build_response_warc_blob(rows, chunked=True)
    (_u, _ts, status, ct, body), = parse_warc_http_records(blob)
    assert (status, ct, body) == (200, "text/html", b"chunk me")


def test_mixed_case_content_type_passes_gate():
    """RFC 9110: media-type comparison is case-insensitive."""
    rows = [("https://a.example/m", "2025-01-01T00:00:00Z", 200,
             b"Text/HTML; Charset=UTF-8", b"<html>cased</html>", {})]
    blob = build_response_warc_blob(rows)
    (_u, _ts, status, ct, body), = parse_warc_http_records(blob)
    assert status == 200 and ct.lower().startswith("text/html")
