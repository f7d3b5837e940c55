"""Distiller parity (S3/S4): reference XML ensembles -> stump tables.

Checks the decode against (a) hand-decoded literals read straight off the
XML text, and (b) an independent tree-walk evaluator written directly over
the XML in this test (no shared code with the distiller's row extraction),
mirroring predictTrees (ml.c:527-611).
"""

from __future__ import annotations

import math
import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from ocr_hardsubx_spark.functions.scoring import StumpModel
from ocr_hardsubx_spark.sources.distill import (
    REFERENCE_DIR,
    distill_boost_xml,
)

NM1_XML = os.path.join(REFERENCE_DIR, "trained_classifierNM1.xml")
NM2_XML = os.path.join(REFERENCE_DIR, "trained_classifierNM2.xml")

pytestmark = pytest.mark.skipif(
    not os.path.exists(NM1_XML), reason="reference models not present")


def test_nm1_first_tree_hand_decoded():
    """Tree 0 of NM1, hand-read from the XML: split on var 1 at
    8.5429996252059937e-02; first depth-1 node (-> left, ml.c:516-519)
    carries 6.7336438045684699e-01, second (-> right) carries
    -1.6797288877446712e+00."""
    rows = distill_boost_xml(NM1_XML)
    assert len(rows) == 100
    t0 = rows[0]
    assert t0["var"] == 1
    assert t0["le"] == pytest.approx(8.5429996252059937e-02, abs=0)
    assert t0["left_val"] == pytest.approx(6.7336438045684699e-01, abs=0)
    assert t0["right_val"] == pytest.approx(-1.6797288877446712e+00, abs=0)


def test_nm2_first_tree_hand_decoded():
    rows = distill_boost_xml(NM2_XML)
    assert len(rows) == 100
    t0 = rows[0]
    assert t0["var"] == 6
    assert t0["le"] == pytest.approx(8.5, abs=0)


def _xml_votes(xml_path: str, sample: list[float]) -> float:
    """Independent predictTrees: walk every tree of the raw XML.
    val <= le -> first depth-1 node, else second; sum leaf values."""
    boost = ET.parse(xml_path).getroot().find("opencv_ml_boost")
    total = 0.0
    for tree in boost.find("trees"):
        nodes = list(tree.find("nodes"))
        root, leaves = nodes[0], nodes[1:]
        split = root.find("splits")[0]
        var, le = int(split.findtext("var")), float(split.findtext("le"))
        leaf = leaves[0] if sample[var] <= le else leaves[1]
        total += float(leaf.findtext("value"))
    return total


@pytest.mark.parametrize("xml_path,n_features", [(NM1_XML, 4), (NM2_XML, 7)])
def test_votes_match_independent_tree_walk(xml_path, n_features):
    rows = distill_boost_xml(xml_path)
    model = StumpModel.from_rows(rows, n_features)
    rng = np.random.default_rng(99)
    # samples spanning the thresholds' dynamic range (les span ~0..10)
    X = np.abs(rng.normal(scale=3.0, size=(64, n_features)))
    got = model.votes(X)
    want = np.array([_xml_votes(xml_path, list(x)) for x in X])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_reference_probability_form():
    """erfilter.c:214: p = 1 - 1/(1+exp(-2*votes)).  The distilled table
    keeps the XML's leaf signs, so mapping our convention
    (scoring.py: p = 1/(1+exp(-2*votes))) onto the reference's requires
    negating votes — pin the identity that makes the two forms agree."""
    v = 0.73
    ref_p = 1.0 - 1.0 / (1.0 + math.exp(-2.0 * v))
    ours = 1.0 / (1.0 + math.exp(-2.0 * (-v)))
    assert ref_p == pytest.approx(ours, abs=1e-15)


def test_frozen_json_matches_fresh_distill():
    """models/stumps_ref_nm{1,2}.json are the committed distiller output."""
    import json

    from ocr_hardsubx_spark.sources.distill import MODELS_DIR
    for stage, xml_path in (("nm1", NM1_XML), ("nm2", NM2_XML)):
        frozen = json.load(
            open(os.path.join(MODELS_DIR, f"stumps_ref_{stage}.json")))
        assert frozen == distill_boost_xml(xml_path)
