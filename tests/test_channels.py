"""Negative link-polarity detection channel (D1, verdict item 5).

The reference appends negated channels so bright-on-dark text is detected
(detectRegions, erfilter.c:1738-1744) and groups survivors of ALL channels
(erfilter.c:1754-1761).  The web analog inverts link polarity: channel 1
treats link text as foreground, recovering link-structured main content
(directories, tables of contents) that channel 0's link-density stumps
reject.  Fixtures here are hand-authored, independent of the fixture
generator.
"""

from __future__ import annotations

import numpy as np
import pytest

from ocr_hardsubx_spark.operators.cascade import (
    channel_features,
    feature_matrix,
    invert_link_polarity,
    stage1_gate,
)
from ocr_hardsubx_spark.operators.parse import parse_document
from ocr_hardsubx_spark.refimpl import extract_document
from ocr_hardsubx_spark.sources.model_store import load_models

# a curated link directory page: the MAIN CONTENT is a list of long,
# descriptive links — nearly pure link text, which channel 0's stage-1
# link-density penalty rejects wholesale.  Labels are mutually DISSIMILAR
# so the consecutive Levenshtein dedup (threshold 0.85) keeps them all;
# near-identical labels would legitimately collapse to one.
_LABELS = [
    "archive of historical weather measurements for coastal stations",
    "community cookbook gathering regional bread recipes and techniques",
    "open dataset describing urban tree canopy coverage by district",
    "beginner guide to restoring antique mechanical wristwatches",
    "catalogue of public domain sheet music for chamber ensembles",
    "field notes on migratory songbird populations in wetland areas",
    "repository of annotated court rulings on maritime trade disputes",
    "atlas mapping underground aquifers across the northern plateau",
    "manual covering safe fermentation practices for small dairies",
    "gallery of restored photographs from early railway construction",
    "survey results about commuting patterns in mid-sized towns",
    "handbook explaining cooperative governance for housing groups",
]
LINKS = "".join(
    f'<li><a href="/r/{i}">{label}</a></li>'
    for i, label in enumerate(_LABELS)
)
DIRECTORY_PAGE = (
    "<html><body>"
    '<div class="directory"><ul>' + LINKS + "</ul></div>"
    "</body></html>"
).encode()


def _stage1_by_channel(html: bytes):
    nm1, _ = load_models()
    regions, stream, events = parse_document(html)
    X = feature_matrix(regions, events)
    areas = np.array([r.area for r in regions], dtype=np.float64)
    totals = np.full(len(regions), regions[0].area, dtype=np.float64)
    out = {}
    for ch in (0, 1):
        mask, p = stage1_gate(channel_features(X, ch), areas, totals, nm1)
        out[ch] = mask
    return regions, stream, out


def test_invert_link_polarity_only_touches_f1():
    X = np.arange(21, dtype=np.float64).reshape(3, 7)
    Xi = invert_link_polarity(X)
    assert (Xi[:, 1] == 1.0 - X[:, 1]).all()
    keep = [0, 2, 3, 4, 5, 6]
    assert (Xi[:, keep] == X[:, keep]).all()
    # polarity inversion is an involution on f1
    assert (invert_link_polarity(Xi) == X).all()


def test_channel1_recovers_link_directory():
    """The directory block is rejected by channel 0's stage 1 and accepted
    by channel 1 (the negative-polarity recovery the reference gets from
    its subtracted channels)."""
    regions, stream, masks = _stage1_by_channel(DIRECTORY_PAGE)
    # the <li> entries hold the link text (the enclosing <ul> is ~the whole
    # document, so it trips the max-area gate on EVERY channel, as the
    # reference's whole-image region would)
    lis = [r for r in regions if r.tag == "li"]
    assert len(lis) == 12
    for r in lis:
        assert r.link_density > 0.9
        assert not masks[0][r.region_id]
        assert masks[1][r.region_id]


def test_extract_with_channel1_recovers_directory_text():
    only0 = extract_document(DIRECTORY_PAGE, channels=(0,))
    both = extract_document(DIRECTORY_PAGE, channels=(0, 1))
    assert only0["extracted_text"] == ""
    # every distinct entry comes through exactly once
    for label in _LABELS:
        assert label not in only0["extracted_text"]
        assert both["extracted_text"].count(label) == 1


def test_default_single_channel_output_unchanged():
    """channels=(0,) must be byte-identical to the pre-channel pipeline
    (the committed goldens pin this corpus-wide; spot-check here)."""
    page = (b"<html><body><nav><ul>"
            b'<li><a href="/">Home</a></li><li><a href="/a">About</a></li>'
            b"</ul></nav>"
            b'<div class="c"><p>Plain prose content paragraph with enough '
            b"text to clear the area gates comfortably.</p></div>"
            b"</body></html>")
    r_default = extract_document(page)
    r_ch0 = extract_document(page, channels=(0,))
    assert r_default == r_ch0
    assert "Plain prose content" in r_default["extracted_text"]
    assert "Home" not in r_default["extracted_text"]


def test_regions_by_channel_census(spark):
    """Spark surface: both channels' rows flow through the ERStat table
    with the channel column set and identical structural descriptors."""
    import pandas as pd

    from ocr_hardsubx_spark.operators.regions import regions_pandas_batch

    nm1, nm2 = load_models()
    pdf = pd.DataFrame({"url": ["u0"], "html": [DIRECTORY_PAGE]})
    out = regions_pandas_batch(pdf, nm1, nm2, channels=(0, 1))
    c0 = out[out.channel == 0].set_index("region_id")
    c1 = out[out.channel == 1].set_index("region_id")
    assert len(c0) == len(c1) > 0
    # structural descriptors are polarity-invariant
    for col in ("area", "perimeter", "euler", "depth", "tag"):
        assert (c0[col] == c1[col]).all()
    # probabilities differ (the whole point)
    assert (c0["probability"] != c1["probability"]).any()


def test_channel_features_rejects_unknown():
    with pytest.raises(ValueError):
        channel_features(np.zeros((1, 7)), 2)


def test_fused_batch_path_honors_channels():
    """The Spark stage's Arrow-batch entry point produces the same
    channel-1 recovery as the single-doc oracle path."""
    import pandas as pd

    from ocr_hardsubx_spark.operators.extract import extract_pandas_batch

    nm1, nm2 = load_models()
    pdf = pd.DataFrame({
        "url": ["u0"], "warc_ts": [None], "lang": ["en"],
        "html": [DIRECTORY_PAGE],
    })
    out0 = extract_pandas_batch(pdf, nm1, nm2, channels=(0,))
    out01 = extract_pandas_batch(pdf, nm1, nm2, channels=(0, 1))
    assert out0["extracted_text"][0] == ""
    assert out01["extracted_text"][0] == \
        extract_document(DIRECTORY_PAGE, channels=(0, 1))["extracted_text"]


def test_regions_channel_golden_regenerates_identically(spark, tmp_path,
                                                        monkeypatch):
    """The golden-census writer reproduces the committed file exactly
    (exercises the documented regeneration path and detects drift)."""
    import pandas as pd

    import ocr_hardsubx_spark.plans.queries as q

    committed = pd.read_parquet(q.REGIONS_CHANNEL_GOLDEN)
    fresh_path = str(tmp_path / "census.parquet")
    monkeypatch.setattr(q, "REGIONS_CHANNEL_GOLDEN", fresh_path)
    q.ensure_regions_channel_golden(spark)
    fresh = pd.read_parquet(fresh_path)
    cols = sorted(committed.columns)
    pd.testing.assert_frame_equal(
        committed[cols].sort_values("channel").reset_index(drop=True),
        fresh[cols].sort_values("channel").reset_index(drop=True))


def test_multichannel_spark_matches_refimpl_corpus():
    """channels=(0,1) parity between the Arrow-batch stage and the
    single-doc oracle across 60 fixture pages (the single-channel path
    has the corpus goldens; this pins the multichannel path too)."""
    import pandas as pd

    from ocr_hardsubx_spark.operators.extract import extract_pandas_batch
    from ocr_hardsubx_spark.sources.fixtures import build_page

    pages = [build_page(i)[1] for i in range(60)]
    nm1, nm2 = load_models()
    pdf = pd.DataFrame({
        "url": [f"u{i}" for i in range(60)],
        "warc_ts": [None] * 60, "lang": ["en"] * 60,
        "html": pages,
    })
    out = extract_pandas_batch(pdf, nm1, nm2, channels=(0, 1))
    want = [extract_document(p, channels=(0, 1))["extracted_text"]
            for p in pages]
    got = list(out["extracted_text"])
    assert got == want
