"""WHATWG-style charset sniff + transport decode."""

from ocr_hardsubx_spark.operators.charset import (
    decode_pages, decode_payload, sniff_charset)


# --------------------------------------------------------------------------
# sniff order
# --------------------------------------------------------------------------

def test_bom_beats_header_and_meta():
    raw = b"\xff\xfe" + "x<meta charset=koi8-r>".encode("utf-16le")
    assert sniff_charset(raw, "text/html; charset=utf-8") == \
        ("utf-16le", "bom")


def test_utf8_bom():
    assert sniff_charset(b"\xef\xbb\xbfhello") == ("utf-8-sig", "bom")


def test_utf16be_bom():
    assert sniff_charset(b"\xfe\xff\x00h") == ("utf-16be", "bom")


def test_header_beats_meta():
    raw = b'<meta charset="koi8-r">'
    assert sniff_charset(raw, 'text/html; charset="windows-1251"') == \
        ("windows-1251", "header")


def test_meta_charset_attr():
    assert sniff_charset(b"<html><META CHARSET='gbk'>") == ("gbk", "meta")


def test_meta_http_equiv_form():
    raw = (b'<meta http-equiv="Content-Type" '
           b'content="text/html; charset=Shift_JIS">')
    assert sniff_charset(raw) == ("shift_jis", "meta")


def test_meta_outside_prescan_window_ignored():
    raw = b" " * 2000 + b'<meta charset="koi8-r">'
    assert sniff_charset(raw) == ("utf-8", "default")


def test_latin1_label_maps_to_cp1252():
    assert sniff_charset(b"", "text/html; charset=ISO-8859-1") == \
        ("windows-1252", "header")
    assert sniff_charset(b"", "text/html; charset=latin1") == \
        ("windows-1252", "header")


def test_unknown_label_falls_through():
    # unknown header label -> try meta -> default
    raw = b"<meta charset=utf8>"
    assert sniff_charset(raw, "text/html; charset=x-martian") == \
        ("utf-8", "meta")
    assert sniff_charset(b"plain", "text/html; charset=x-martian") == \
        ("utf-8", "default")


def test_no_signal_defaults_utf8():
    assert sniff_charset(b"hello", "text/html") == ("utf-8", "default")


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------

def test_decode_cp1252_smart_quotes():
    text, enc, src, rep = decode_payload(
        b"caf\xe9 \x93q\x94", "text/html; charset=iso-8859-1")
    assert (text, enc, src, rep) == ("café “q”", "windows-1252",
                                     "header", False)


def test_decode_utf16le_bom_consumed():
    raw = b"\xff\xfe" + "héllo".encode("utf-16le")
    text, enc, src, rep = decode_payload(raw)
    assert (text, enc, src, rep) == ("héllo", "utf-16le", "bom", False)


def test_decode_utf8_bom_consumed():
    text, enc, src, rep = decode_payload(b"\xef\xbb\xbfok")
    assert (text, enc, src, rep) == ("ok", "utf-8", "bom", False)


def test_decode_invalid_bytes_flagged_not_fatal():
    text, enc, src, rep = decode_payload(b"ok \xff\xfe\x00 end", None)
    assert rep is True
    assert "ok" in text and enc == "utf-8" and src == "default"


def test_decode_empty_and_none():
    assert decode_payload(b"") == ("", "utf-8", "default", False)
    assert decode_payload(None) == ("", "utf-8", "default", False)


# --------------------------------------------------------------------------
# Spark stage
# --------------------------------------------------------------------------

def test_decode_pages_stage(spark):
    rows = [
        ("u1", "café".encode("cp1252"), "text/html; charset=latin1"),
        ("u2", b"\xff\xfe" + "wide".encode("utf-16le"), None),
        ("u3", b"<meta charset=utf-8>plain", "text/html"),
        ("u4", None, None),
    ]
    df = spark.createDataFrame(
        rows, "url string, raw binary, content_type string")
    got = {r.url: (r.text, r.encoding, r.enc_source, r.replaced)
           for r in decode_pages(df, spark).collect()}
    assert got == {
        "u1": ("café", "windows-1252", "header", False),
        "u2": ("wide", "utf-16le", "bom", False),
        "u3": ("<meta charset=utf-8>plain", "utf-8", "meta", False),
        "u4": ("", "utf-8", "default", False),
    }


def test_decode_pages_plan_is_map_only(spark):
    df = spark.createDataFrame(
        [("u", b"x", None)], "url string, raw binary, content_type string")
    plan = decode_pages(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


# --------------------------------------------------------------------------
# mojibake repair
# --------------------------------------------------------------------------

def test_mojibake_single_pass():
    from ocr_hardsubx_spark.operators.charset import fix_mojibake

    moji = "cafÃ© nÂº"          # 'café nº' via cp1252
    assert fix_mojibake(moji) == ("café nº", True)


def test_mojibake_double_pass():
    from ocr_hardsubx_spark.operators.charset import fix_mojibake

    double = ("café".encode("utf-8").decode("cp1252")
              .encode("utf-8").decode("cp1252"))
    assert fix_mojibake(double) == ("café", True)


def test_mojibake_cp1252_hole_byte_roundtrips():
    from ocr_hardsubx_spark.operators.charset import fix_mojibake

    # '”' is utf-8 E2 80 9D; a WHATWG decoder maps 9D -> U+009D
    moji = "â€\x9d"
    assert fix_mojibake(moji) == ("”", True)


def test_mojibake_genuine_unicode_untouched():
    from ocr_hardsubx_spark.operators.charset import fix_mojibake

    for s in ("déjà — fine", "plain ascii", "日本語テキスト", ""):
        assert fix_mojibake(s) == (s, False)


def test_mojibake_lossy_replacement_untouched():
    from ocr_hardsubx_spark.operators.charset import fix_mojibake

    # a 'replace'-mode mis-decode destroyed the 9D byte: unfixable,
    # must pass through rather than half-fix
    damaged = "“quoted”".encode("utf-8") \
        .decode("cp1252", "replace")
    assert fix_mojibake(damaged) == (damaged, False)


def test_repair_mojibake_stage(spark):
    from ocr_hardsubx_spark.operators.charset import repair_mojibake

    df = spark.createDataFrame(
        [(1, "cafÃ©"), (2, "clean text"), (3, None)],
        "doc_id long, text string")
    got = {r.doc_id: (r.fixed, r.was_mojibake)
           for r in repair_mojibake(df, spark=spark).collect()}
    assert got == {1: ("café", True), 2: ("clean text", False),
                   3: ("", False)}
