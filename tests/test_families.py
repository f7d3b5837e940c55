"""Structural guarantees per fixture family (golden-independent).

The byte-identity tests pin exact outputs; these pin the *semantics* the
goldens are supposed to encode, so a refimpl bug cannot silently rewrite
both sides (SURVEY.md §5.1 consequences note).
"""

import re

import pytest

from ocr_hardsubx_spark.refimpl import extract_document
from ocr_hardsubx_spark.sources.fixtures import build_page

N_PAGES = 120
_CASES = [build_page(i) for i in range(N_PAGES)]


def _strip(s):
    return re.sub(r"<[^>]+>", "", s)


@pytest.mark.parametrize("case", _CASES, ids=[f"{f}-{u[-6:]}" for u, _, f in _CASES])
def test_family_invariants(case):
    url, html, family = case
    txt = extract_document(html)["extracted_text"]

    # every page extracts something (no family produces an empty page)
    assert txt, family

    # boilerplate exclusion: no top-nav/footer item text leaks
    nav_items = re.findall(r'<li><a href="[^"]*">([^<]+)</a></li>', html)
    leaked = [w for w in set(nav_items) if w in txt]
    assert not leaked, (family, leaked[:3])

    # dedup: no two consecutive identical lines survive
    lines = [ln for ln in txt.split("\n") if ln]
    assert all(a != b for a, b in zip(lines, lines[1:])), family

    # content presence: the first sentence of each content block is in
    for m in re.findall(r"<div class='wrap'>(.{60})", html):
        assert _strip(m).split(".")[0][:22] in txt, (family, "wrap")
    for m in re.findall(r'<div class="content">(.{60})', html):
        assert _strip(m).split(".")[0][:22] in txt, (family, "content")

    if family == "norm-entity":
        # entities decoded, CRLF/multi-space normalized away
        assert "&amp;" not in txt and "\r" not in txt and "  " not in txt
        assert "& — x <tag> y" in txt
    if family == "det-embed":
        assert "function f()" not in txt  # script content excluded
    if family == "dedup-brbr":
        assert "\n\n\n" not in txt        # blank-line runs collapsed
