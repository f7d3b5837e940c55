"""Adversarial-page stress fixtures (round-3 verdict item 8).

The fixture corpus is well-formed and small; a crawl is neither.  These
pin the tokenizer's worst cases: megabyte pages, 1000-deep nesting,
pathological attribute quoting (the possessive-quantifier regression
guard — the backtracking form hung for minutes on 150 bytes),
unterminated script/comment tails, and a measured parse-throughput
floor so a quadratic regression fails loudly.
"""

from __future__ import annotations

import time

from ocr_hardsubx_spark.operators.parse import (
    parse_document,
    parse_document_stdlib,
)
from ocr_hardsubx_spark.refimpl import extract_document


def test_megabyte_page_parses_fast_and_fully():
    para = ("<p>Content paragraph with a reasonable amount of running "
            "text inside it for realistic density. </p>")
    html = "<html><body>" + para * 12000 + "</body></html>"   # ~1.3 MB
    assert len(html) > 1 << 20
    t = time.time()
    regions, stream, _ = parse_document(html)
    wall = time.time() - t
    assert len(regions) == 12000 + 3  # root, html, body + every p
    assert stream.count("realistic density") == 12000
    # throughput floor: the linear tokenizer does > 5 MB/s on this box
    # (measured ~30-60 MB/s); a quadratic regression lands in minutes
    assert wall < len(html) / (5 << 20), f"{wall:.1f}s for {len(html)}B"


def test_thousand_deep_nesting_no_recursion_error():
    deep = ("<div>" * 1000
            + "<p>needle text content here inside deep nesting</p>"
            + "</div>" * 1000)
    regions, stream, _ = parse_document("<html><body>" + deep)
    assert stream.count("needle") == 1
    assert max(r.depth for r in regions) >= 1000
    # end-to-end too (the extraction stage walks the same tree)
    out = extract_document(("<html><body>" + deep).encode())
    assert out["extracted_text"].count("needle") <= 1


def test_pathological_attribute_quoting_linear_time():
    """The exact shape that exploded the backtracking regex: an
    unterminated tag stuffed with quoted segments.  Must parse (as
    text) in well under a second at 100x the size that used to hang."""
    for k in (30, 500, 3000):
        evil = "<a " + '"aa"' * k          # no closing '>'
        t = time.time()
        _, stream, _ = parse_document(evil)
        assert time.time() - t < 1.0
        # html.parser semantics: an unterminated tag's bytes vanish or
        # surface as text — either way the parse terminates and never
        # fabricates regions; pin against the stdlib driver
        _, stream_std, _ = parse_document_stdlib(evil)
        assert stream == stream_std


def test_attribute_quote_zoo_matches_stdlib():
    cases = [
        '<p title="a>b">x</p>',                  # '>' inside quotes
        "<p title='it\"s'>x</p>",                # nested other-quote
        '<p data-a = "1" data-b=\'2\' c>x</p>',  # spaced =, bare attr
        '<p a=">">x</p>',
        '<p "">x</p>',
        "<p ''''>x</p>",
    ]
    for html in cases:
        _, fast, _ = parse_document(html)
        _, std, _ = parse_document_stdlib(html)
        assert fast == std, html


def test_unclosed_quote_divergence_is_pinned():
    """Declared tokenizer divergence (pre-dates the possessive fix):
    on `<p a="unterminated>` the fast tokenizer falls back to
    char-by-char attr scanning and recovers the tag at the first `>`,
    while stdlib html.parser refuses the unclosed quote and emits the
    bytes as text.  The fast behavior is the more useful one for a
    crawl (truncated pages keep their block structure); pin both so a
    silent change in either shows up."""
    html = '<p a="unterminated>x</p>'
    _, fast, _ = parse_document(html)
    _, std, _ = parse_document_stdlib(html)
    assert fast == "x\n"
    assert std == '<p a="unterminated>x'


def test_unterminated_script_comment_and_tag_tails():
    cases = [
        "<p>before</p><script>var x = '<p>not text</p>'",  # EOF in script
        "<p>before</p><style>.x { color: red; }",
        "<p>before</p><p attr=",                           # EOF in tag
        "<p>before</p></",
    ]
    for html in cases:
        _, stream, _ = parse_document(html)
        assert "before" in stream
        assert "not text" not in stream
        _, std, _ = parse_document_stdlib(html)
        assert stream == std, html

    # unterminated comment: the fast tokenizer follows HTML5
    # eof-in-comment (everything to EOF is comment) while stdlib
    # html.parser surfaces the tail as text — declared divergence,
    # pinned on both sides
    html = "<p>before</p><!-- comment never closes <p>hidden</p>"
    _, fast, _ = parse_document(html)
    assert fast == "before\n"
    _, std, _ = parse_document_stdlib(html)
    assert "hidden" in std


def test_million_siblings_flat_page():
    """Width, not depth: 100k sibling regions parse linearly and the
    region array stays consistent."""
    html = "<html><body>" + "<b>x</b>" * 100_000 + "</body></html>"
    t = time.time()
    regions, stream, _ = parse_document(html)
    assert time.time() - t < 20
    assert stream.count("x") == 100_000
    assert len(regions) == 100_000 + 3
