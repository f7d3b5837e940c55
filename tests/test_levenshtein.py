"""Levenshtein ratio + dedup threshold boundary cases."""

from ocr_hardsubx_spark.functions.levenshtein import (
    at_least_as_similar,
    levenshtein,
    similarity_ratio,
)


def test_basic_distances():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("abc", "abd") == 1
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3


def test_ratio_bounds():
    assert similarity_ratio("", "") == 1.0
    assert similarity_ratio("abc", "abc") == 1.0
    assert similarity_ratio("abc", "xyz") == 0.0


def test_threshold_boundary():
    # 20-char strings, 3 edits -> ratio 0.85 exactly: >= threshold holds
    a = "x" * 20
    b = "y" * 3 + "x" * 17
    assert similarity_ratio(a, b) == 0.85
    assert at_least_as_similar(a, b, 0.85)
    # 4 edits -> 0.80 < 0.85
    c = "y" * 4 + "x" * 16
    assert not at_least_as_similar(a, c, 0.85)


def test_length_shortcircuit_consistent():
    a, b = "abc", "abcdefghij"
    assert at_least_as_similar(a, b, 0.5) == (similarity_ratio(a, b) >= 0.5)
    assert not at_least_as_similar(a, b, 0.9)
