"""Text-normalization byte-identity cases (SURVEY.md §5.2.2)."""

from ocr_hardsubx_spark.functions.normalize import normalize_text


def test_crlf_and_cr_become_lf():
    assert normalize_text("a\r\nb\rc") == "a\nb\nc"


def test_nbsp_is_space():
    assert normalize_text("a\xa0\xa0b") == "a b"


def test_inner_whitespace_collapses():
    assert normalize_text("a  \t  b") == "a b"


def test_lines_stripped_and_blank_lines_dropped():
    assert normalize_text("  a  \n\n\n  b  \n") == "a\nb"


def test_double_enter_collapse():
    # runs of blank lines (the <br><br> / double_enter case) collapse to one \n
    assert normalize_text("para one\n\n\n\npara two") == "para one\npara two"


def test_whitespace_only_is_empty():
    assert normalize_text(" \t\r\n \xa0 ") == ""


def test_unicode_preserved_bytewise():
    s = "café — naïve"
    assert normalize_text(s) == s


def test_idempotent():
    for s in ["a  b\r\n c", "", "  ", "x\n\n\ny", "\xa0a\xa0"]:
        once = normalize_text(s)
        assert normalize_text(once) == once
