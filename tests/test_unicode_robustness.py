"""Unicode / pathological-input robustness (byte-identity hardening)."""

import numpy as np

from ocr_hardsubx_spark.functions.levenshtein import (
    levenshtein,
    similarity_ratio,
)
from ocr_hardsubx_spark.functions.normalize import normalize_text
from ocr_hardsubx_spark.operators.parse import (
    parse_document,
    parse_document_stdlib,
)
from ocr_hardsubx_spark.refimpl import extract_document


def _eq(html: str):
    a = parse_document(html)
    b = parse_document_stdlib(html)
    assert a[1] == b[1]
    assert [(r.tag, r.start, r.end, r.area, r.link_area) for r in a[0]] == \
           [(r.tag, r.start, r.end, r.area, r.link_area) for r in b[0]]
    return a


def test_cjk_and_emoji_pages_extract():
    html = ("<body><p>中文段落内容，包含足够多的汉字使面积门限通过，继续补充"
            "更多的文字内容直到足够长。</p><p>Второй абзац на русском языке "
            "с достаточным количеством слов 🚀 and some emoji 😀 mixed in "
            "here too.</p></body>")
    _eq(html)
    t = extract_document(html)["extracted_text"]
    assert "中文段落" in t and "🚀" in t


def test_astral_chars_in_levenshtein():
    a = "𝕊𝕡𝕒𝕣𝕜" * 10   # astral-plane mathematical letters
    b = "𝕊𝕡𝕒𝕣𝕜" * 9 + "xxxxx"
    d = levenshtein(a, b)
    assert d == 5
    assert 0 < similarity_ratio(a, b) < 1


def test_bom_and_controls():
    html = "﻿<body><p>page with a BOM prefix and plenty of words to pass area gates</p><p>and a second paragraph with more words to balance things</p></body>"
    _eq(html)
    t = extract_document(html)["extracted_text"]
    assert "BOM prefix" in t


def test_nul_bytes_survive_parse():
    html = "<body><p>text with \x00 nul and plenty of padding words here</p><p>second paragraph of padding words to pass the gates</p></body>"
    _eq(html)
    extract_document(html)  # no crash


def test_megabyte_document():
    para = "<p>" + ("sentence with several plain words here. " * 50) + "</p>"
    html = "<body><div>" + para * 500 + "</div></body>"   # ~1 MB
    assert len(html) > 1_000_000
    res = extract_document(html)
    # identical consecutive paragraphs collapse to ONE via dedup
    assert res["extracted_text"].count("sentence with several") == 50


def test_normalize_does_not_touch_unicode_forms():
    # NFC/NFD must pass through untouched (byte-stability rule)
    nfd = "Café"          # e + combining acute
    nfc = "Café"
    assert normalize_text(nfd) == nfd
    assert normalize_text(nfc) == nfc
    assert normalize_text(nfd) != normalize_text(nfc)


def test_feature_matrix_finite_on_degenerate_pages():
    from ocr_hardsubx_spark.operators.cascade import feature_matrix

    for html in ("", "<body></body>", "<p></p>" * 100, "x" * 10):
        regions, _, ev = parse_document(html)
        X = feature_matrix(regions, ev)
        assert np.isfinite(X).all()
