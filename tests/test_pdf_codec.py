"""From-scratch PDF codec: object model, xref variants, filters, fonts,
content-stream text interpreter, reading order, furniture strip, and the
Spark mapInPandas operator (roundtrip + provenance flags)."""

import re
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_hardsubx_spark.functions import pdf_codec as P
from ocr_hardsubx_spark.functions.pdf_codec import Name, Ref, _ser


def _build(objs, streams, ver=b"%PDF-1.4\n"):
    """Minimal hand-rolled serializer for targeted object-level fixtures."""
    buf = bytearray(ver)
    offs = {}
    for n in sorted(objs):
        offs[n] = len(buf)
        buf.extend(b"%d 0 obj\n" % n)
        buf.extend(_ser(objs[n]))
        if n in streams:
            buf.extend(b"\nstream\n" + streams[n] + b"\nendstream")
        buf.extend(b"\nendobj\n")
    start = len(buf)
    size = max(objs) + 1
    buf.extend(b"xref\n0 %d\n0000000000 65535 f \n" % size)
    for n in range(1, size):
        buf.extend(b"%010d 00000 n \n" % offs.get(n, 0))
    buf.extend(b"trailer\n" + _ser({"Size": size, "Root": Ref(1, 0)})
               + b"\nstartxref\n%d\n%%%%EOF\n" % start)
    return bytes(buf)


def _skeleton(content, font=None, filt=None):
    font = font or {"Type": "Font", "Subtype": "Type1",
                    "BaseFont": "Helvetica",
                    "Encoding": "WinAnsiEncoding"}
    objs = {
        1: {"Type": "Catalog", "Pages": Ref(2, 0)},
        2: {"Type": "Pages", "Kids": [Ref(4, 0)], "Count": 1,
            "Resources": {"Font": {"F1": Ref(3, 0)}},
            "MediaBox": [0, 0, 612, 792]},
        3: font,
        4: {"Type": "Page", "Parent": Ref(2, 0), "Contents": Ref(5, 0)},
        5: {"Length": len(content)},
    }
    if filt is not None:
        objs[5]["Filter"] = filt
    return objs, {5: content}


# -- writer/reader roundtrips across every xref + string + filter shape ---

PAGES = [[(72, 700, 11, "hello world"), (72, 672, 11, "second line")],
         [(72, 700, 11, "page two")]]
WANT = "hello world\nsecond line\npage two"


@pytest.mark.parametrize("kw", [
    {}, {"compress": False}, {"hex_strings": True},
    {"xref_stream": True}, {"object_streams": True},
    {"object_streams": True, "hex_strings": True, "compress": False},
])
def test_roundtrip_variants(kw):
    text, n, real = P.extract_text(P.write_pdf(PAGES, **kw))
    assert (text, n, real) == (WANT, 2, True)


def test_winansi_beyond_ascii():
    text, _, real = P.extract_text(
        P.write_pdf([[(72, 700, 11, "dash — bullet • euro €")]]))
    assert text == "dash — bullet • euro €" and real


def test_reading_order_restored_from_layout():
    # emitted bottom-up; layout sort must restore top-down order
    data = P.write_pdf([[(72, 616, 11, "third"), (72, 700, 11, "first"),
                         (72, 658, 11, "second")]])
    assert P.extract_text(data)[0] == "first\nsecond\nthird"


def test_same_line_span_joining():
    # est. end of 'abc' at x=72 size=10 is 72 + 0.5*10*3 = 87 (abuts);
    # x=300 is a real gap -> single space
    c = (b"BT /F1 10 Tf 72 700 Td (abc) Tj ET"
         b" BT /F1 10 Tf 87 700 Td (def) Tj ET"
         b" BT /F1 10 Tf 300 700 Td (far) Tj ET")
    assert P.extract_text(P.write_pdf_raw([c]))[0] == "abcdef far"


# -- content-stream operators ----------------------------------------------

def test_tj_kerning_space_threshold():
    c = b"BT /F1 11 Tf 72 700 Td [(hel) -40 (lo) -400 (world)] TJ ET"
    assert P.extract_text(P.write_pdf_raw([c]))[0] == "hello world"


def test_tm_tstar_quote_ops():
    c = (b"BT /F1 10 Tf 14 TL 1 0 0 1 72 700 Tm (line one) Tj"
         b" T* (line two) Tj (line three) ' ET")
    assert P.extract_text(P.write_pdf_raw([c]))[0] == \
        "line one\nline two\nline three"


def test_td_sets_leading_for_tstar():
    c = b"BT /F1 10 Tf 72 700 Td (a) Tj 0 -20 TD (b) Tj T* (c) Tj ET"
    assert P.extract_text(P.write_pdf_raw([c]))[0] == "a\nb\nc"


def test_double_quote_op_shows_text():
    c = b"BT /F1 10 Tf 14 TL 72 700 Td (x) Tj 2 1 (y) \" ET"
    assert P.extract_text(P.write_pdf_raw([c]))[0] == "x\ny"


def test_cm_moves_text_space():
    c = (b"q 1 0 0 1 0 -28 cm BT /F1 10 Tf 72 700 Td (below) Tj ET Q"
         b" BT /F1 10 Tf 72 700 Td (above) Tj ET")
    assert P.extract_text(P.write_pdf_raw([c]))[0] == "above\nbelow"


def test_literal_string_escapes():
    c = b"BT /F1 10 Tf 72 700 Td (a\\(b\\)c (nested) \\101 x\\\ny) Tj ET"
    assert P.extract_text(P.write_pdf_raw([c]))[0] == "a(b)c (nested) A xy"


def test_multiple_content_streams_concatenate():
    # /Contents array: streams concatenate at a lexical boundary
    c1 = b"BT /F1 10 Tf 14 TL 72 700 Td (part one) Tj"
    c2 = b"(part two) ' ET"
    objs, streams = _skeleton(c1)
    objs[4]["Contents"] = [Ref(5, 0), Ref(6, 0)]
    objs[6] = {"Length": len(c2)}
    streams[6] = c2
    assert P.extract_text(_build(objs, streams))[0] == "part one\npart two"


# -- filters ----------------------------------------------------------------

def test_asciihex_filter():
    body = b"BT /F1 10 Tf 72 700 Td (hexed) Tj ET"
    objs, streams = _skeleton(body.hex().encode() + b">",
                              filt=Name("ASCIIHexDecode"))
    assert P.extract_text(_build(objs, streams))[0] == "hexed"


def test_ascii85_filter():
    import base64
    body = b"BT /F1 10 Tf 72 700 Td (a85) Tj ET"
    objs, streams = _skeleton(base64.a85encode(body) + b"~>",
                              filt=Name("ASCII85Decode"))
    assert P.extract_text(_build(objs, streams))[0] == "a85"


def test_runlength_filter():
    body = b"BT /F1 10 Tf 72 700 Td (rle) Tj ET" + b" " * 40
    enc = bytearray()
    # mix literal and repeat runs
    enc.append(len(body) - 41)
    enc.extend(body[:-40])
    enc.append(257 - 40)
    enc.append(0x20)
    enc.append(128)
    objs, streams = _skeleton(bytes(enc), filt=Name("RunLengthDecode"))
    assert P.extract_text(_build(objs, streams))[0] == "rle"


def test_filter_chain_outermost_first():
    body = b"BT /F1 10 Tf 72 700 Td (chained) Tj ET"
    data = zlib.compress(body).hex().encode() + b">"
    objs, streams = _skeleton(
        data, filt=[Name("ASCIIHexDecode"), Name("FlateDecode")])
    assert P.extract_text(_build(objs, streams))[0] == "chained"


def test_unsupported_filter_raises():
    objs, streams = _skeleton(b"irrelevant", filt=Name("LZWDecode"))
    with pytest.raises(P.UnsupportedPdf):
        P.extract_text(_build(objs, streams))


def test_corrupt_flate_raises_unsupported():
    objs, streams = _skeleton(b"not zlib at all",
                              filt=Name("FlateDecode"))
    with pytest.raises(P.UnsupportedPdf):
        P.extract_text(_build(objs, streams))


# -- fonts -------------------------------------------------------------------

def test_identity_h_tounicode_bfchar_and_bfrange():
    cmap = (b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
            b"2 beginbfchar <0048> <0048> <0069> <0069> endbfchar\n"
            b"1 beginbfrange <0100> <0102> <0041> endbfrange")
    body = b"BT /F1 10 Tf 72 700 Td <00480069010001010102> Tj ET"
    font = {"Type": "Font", "Subtype": "Type0",
            "BaseFont": "Fake-Identity-H", "Encoding": "Identity-H",
            "ToUnicode": Ref(6, 0)}
    objs, streams = _skeleton(body, font=font)
    objs[6] = {"Length": len(cmap)}
    streams[6] = cmap
    text, _, real = P.extract_text(_build(objs, streams))
    assert (text, real) == ("HiABC", True)


def test_bfrange_array_destination_form():
    cmap = b"1 beginbfrange <0001> <0002> [<0058> <0059>] endbfrange"
    body = b"BT /F1 10 Tf 72 700 Td <00010002> Tj ET"
    font = {"Type": "Font", "Subtype": "Type0", "BaseFont": "F",
            "Encoding": "Identity-H", "ToUnicode": Ref(6, 0)}
    objs, streams = _skeleton(body, font=font)
    objs[6] = {"Length": len(cmap)}
    streams[6] = cmap
    assert P.extract_text(_build(objs, streams))[0] == "XY"


def test_type0_without_tounicode_flags_not_real():
    body = b"BT /F1 10 Tf 72 700 Td <0041> Tj ET"
    font = {"Type": "Font", "Subtype": "Type0", "BaseFont": "F",
            "Encoding": "Identity-H"}
    objs, streams = _skeleton(body, font=font)
    _, _, real = P.extract_text(_build(objs, streams))
    assert real is False


def test_differences_encoding_with_agl_names():
    font = {"Type": "Font", "Subtype": "Type1", "BaseFont": "Helvetica",
            "Encoding": {"BaseEncoding": "WinAnsiEncoding",
                         "Differences": [65, Name("emdash"),
                                         Name("bullet"), 97,
                                         Name("zero")]}}
    body = b"BT /F1 10 Tf 72 700 Td (AB a b) Tj ET"
    objs, streams = _skeleton(body, font=font)
    text, _, real = P.extract_text(_build(objs, streams))
    assert (text, real) == ("—• 0 b", True)


def test_unknown_glyph_name_flags_not_real():
    font = {"Type": "Font", "Subtype": "Type1", "BaseFont": "Helvetica",
            "Encoding": {"Differences": [65, Name("notaglyph")]}}
    body = b"BT /F1 10 Tf 72 700 Td (A) Tj ET"
    objs, streams = _skeleton(body, font=font)
    text, _, real = P.extract_text(_build(objs, streams))
    assert text == "�" and real is False


def test_missing_font_resource_flags_not_real():
    body = b"BT /F9 10 Tf 72 700 Td (ghost) Tj ET"
    objs, streams = _skeleton(body)
    text, _, real = P.extract_text(_build(objs, streams))
    assert text == "ghost" and real is False


# -- xref / object machinery -------------------------------------------------

def test_indirect_length():
    body = b"BT /F1 10 Tf 72 700 Td (len by ref) Tj ET"
    objs, streams = _skeleton(body)
    objs[5] = {"Length": Ref(6, 0)}
    objs[6] = len(body)
    assert P.extract_text(_build(objs, streams))[0] == "len by ref"


def test_incremental_update_prev_chain():
    base = P.write_pdf([[(72, 700, 11, "version one")]])
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)", base):
        pass
    prev_off = int(m.group(1))
    new_body = b"BT /F1 11 Tf 72 700 Td (version two) Tj ET"
    comp = zlib.compress(new_body, 6)
    upd = bytearray(base)
    off5 = len(upd)
    upd.extend(b"5 0 obj\n"
               + _ser({"Length": len(comp), "Filter": Name("FlateDecode")})
               + b"\nstream\n" + comp + b"\nendstream\nendobj\n")
    start = len(upd)
    upd.extend(b"xref\n0 1\n0000000000 65535 f \n"
               b"5 1\n%010d 00000 n \n" % off5)
    upd.extend(b"trailer\n"
               + _ser({"Size": 6, "Root": Ref(1, 0), "Prev": prev_off})
               + b"\nstartxref\n%d\n%%%%EOF\n" % start)
    text, n, real = P.extract_text(bytes(upd))
    assert (text, n, real) == ("version two", 1, True)


def test_nested_page_tree_with_inherited_resources():
    c1 = b"BT /F1 10 Tf 72 700 Td (left leaf) Tj ET"
    c2 = b"BT /F1 10 Tf 72 700 Td (right leaf) Tj ET"
    objs = {
        1: {"Type": "Catalog", "Pages": Ref(2, 0)},
        2: {"Type": "Pages", "Kids": [Ref(7, 0), Ref(8, 0)], "Count": 2,
            "Resources": {"Font": {"F1": Ref(3, 0)}},
            "MediaBox": [0, 0, 612, 792]},
        3: {"Type": "Font", "Subtype": "Type1", "BaseFont": "Helvetica",
            "Encoding": "WinAnsiEncoding"},
        4: {"Type": "Page", "Parent": Ref(7, 0), "Contents": Ref(5, 0)},
        5: {"Length": len(c1)},
        6: {"Length": len(c2)},
        7: {"Type": "Pages", "Kids": [Ref(4, 0)], "Count": 1,
            "Parent": Ref(2, 0)},
        8: {"Type": "Page", "Parent": Ref(2, 0), "Contents": Ref(6, 0)},
    }
    text, n, _ = P.extract_text(_build(objs, {5: c1, 6: c2}))
    assert (text, n) == ("left leaf\nright leaf", 2)


def test_not_a_pdf_rejected():
    with pytest.raises(P.UnsupportedPdf):
        P.extract_text(b"GIF89a totally not a pdf")


def test_truncated_pdf_rejected():
    data = P.write_pdf(PAGES)
    with pytest.raises(P.UnsupportedPdf):
        P.extract_text(data[:len(data) // 2])


def test_reference_cycle_rejected():
    objs = {
        1: {"Type": "Catalog", "Pages": Ref(2, 0)},
        2: Ref(3, 0),
        3: Ref(2, 0),
    }
    with pytest.raises(P.UnsupportedPdf):
        P.extract_text(_build(objs, {}))


def test_name_hex_escape_and_hexstring_odd_digits():
    lex = P._Lexer(b"/Le#6egth")
    assert lex.next_token() == "Length"
    lex = P._Lexer(b"<41 4>")  # odd digit count pads a trailing zero
    assert lex.next_token() == b"A@"


# -- furniture strip ---------------------------------------------------------

def _furnished(n_pages, header="ACME Web Corpus — crawl snapshot"):
    pages = []
    for p in range(n_pages):
        pages.append([
            (72, 780, 9, header),
            (72, 648, 11, f"body {p} alpha"),
            (72, 620, 11, f"body {p} beta"),
            (306, 24, 9, f"Page {p + 1} of {n_pages}"),
        ])
    return P.write_pdf(pages)


def test_furniture_stripped_multipage():
    text, n, _ = P.extract_text(_furnished(3), strip=True,
                                margin_band=(95, 673))
    assert n == 3
    assert text == ("body 0 alpha\nbody 0 beta\nbody 1 alpha\nbody 1 beta"
                    "\nbody 2 alpha\nbody 2 beta")


def test_furniture_single_page_keeps_header_drops_page_number():
    text, n, _ = P.extract_text(_furnished(1), strip=True,
                                margin_band=(95, 673))
    assert n == 1
    assert text == ("ACME Web Corpus — crawl snapshot\n"
                    "body 0 alpha\nbody 0 beta")


def test_furniture_band_protects_repetitive_body():
    # identical body lines on every page at the same y must survive when
    # the margin band excludes them
    pages = [[(72, 648, 11, "same body line"),
              (72, 780, 9, "Running Header")] for _ in range(4)]
    text, _, _ = P.extract_text(P.write_pdf(pages), strip=True,
                                margin_band=(95, 673))
    assert text == "\n".join(["same body line"] * 4)


def test_furniture_generic_mode_strips_everywhere():
    # digit-masked repetition key: letters must differ for body to survive
    pages = [[(72, 648, 11, "repeated everywhere"),
              (72, 620, 11, f"unique {'abcd'[p]} line")] for p in range(4)]
    text, _, _ = P.extract_text(P.write_pdf(pages), strip=True)
    assert text == "\n".join(f"unique {'abcd'[p]} line" for p in range(4))


# -- property: roundtrip arbitrary WinAnsi text ------------------------------

_winansi_text = st.text(
    alphabet=st.sampled_from(
        [chr(c) for c in range(32, 127)] + ["—", "•", "é", "ü", "€"]),
    min_size=1, max_size=200).filter(lambda s: s.strip() == s and s.strip())


@settings(max_examples=50, deadline=None)
@given(lines=st.lists(_winansi_text, min_size=1, max_size=8))
def test_roundtrip_property(lines):
    pages = [[(72, 700 - 28 * i, 11, ln) for i, ln in enumerate(lines)]]
    text, n, real = P.extract_text(P.write_pdf(pages))
    assert real and n == 1
    assert text == "\n".join(lines)


@settings(max_examples=25, deadline=None)
@given(lines=st.lists(_winansi_text, min_size=1, max_size=6),
       xref_stream=st.booleans(), hexs=st.booleans())
def test_roundtrip_property_xref_variants(lines, xref_stream, hexs):
    pages = [[(72, 700 - 28 * i, 11, ln) for i, ln in enumerate(lines)]]
    data = P.write_pdf(pages, xref_stream=xref_stream, hex_strings=hexs,
                       object_streams=xref_stream)
    assert P.extract_text(data)[0] == "\n".join(lines)
