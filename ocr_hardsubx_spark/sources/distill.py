"""Offline distiller: reference OpenCV Boost XML -> stump tables (S3/S4).

Parses the reference's trained RealAdaBoost ensembles
(``/root/reference/trained_classifierNM1.xml`` / ``NM2.xml``) with
``xml.etree`` and emits the same columnar stump-table format the Spark
pipeline broadcasts (``models/stumps_ref_nm{1,2}.json``).

Decode path matched line-by-line against the reference loader:

* ``ml.c:671-678`` read_ml: iterate ``<trees>``, one ``readTree`` per
  ``<nodes>`` list, ``<ntrees>`` trees total.
* ``ml.c:497-525`` readTree: nodes arrive depth-first; for a depth-1
  stump the list is [root, left-leaf, right-leaf] — the FIRST child read
  attaches as ``left``, the second as ``right`` (``parent->left < 0``
  branch).
* ``ml.c:443-461`` readSplit: ``<var>`` indexes the ordered feature
  (``var_idx`` is the identity map here), ``<le>`` is the threshold; a
  ``<gt>`` split would set ``inversed`` (none of the shipped models use
  it, and we refuse rather than silently mis-decode).
* ``ml.c:527-611`` predictTrees: ``val <= split.c -> left else right``;
  the prediction adds the LEAF's ``<value>`` (``sum += nodes[prev].value``)
  — the root's own value is never used.
* ``erfilter.c:214`` / ``:232``: probability = 1 - 1/(1+exp(-2*votes)).
  Our StumpModel uses p = 1/(1+exp(-2*votes)) with "content" positive
  (functions/scoring.py sign convention), so callers scoring the
  reference's raw feature space should negate votes or mirror p; the
  distilled table preserves the XML's own leaf signs untouched.

The web pipeline keeps its own feature-remapped tables
(``models/stumps_nm{1,2}.json`` — its features are DOM analogs, not the
reference's raster features); the distilled tables exist so the decode
path itself is pinned and testable against the real learned ensembles.
"""

from __future__ import annotations

import json
import os
import xml.etree.ElementTree as ET

REFERENCE_DIR = "/root/reference"
MODELS_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "models")


def distill_boost_xml(path: str) -> list[dict]:
    """Parse one OpenCV Boost XML into stump rows
    [{var, le, left_val, right_val}, ...] (readTree order)."""
    root = ET.parse(path).getroot()
    boost = root.find("opencv_ml_boost")
    if boost is None:
        raise ValueError(f"{path}: no <opencv_ml_boost> node")
    ntrees = int(boost.findtext("ntrees"))
    # var_idx is the varMapping applied by readSplit (ml.c:447-448);
    # identity for the shipped models but applied anyway
    var_idx = [int(v) for v in boost.findtext("var_idx").split()]
    rows = []
    for tree in boost.find("trees"):
        nodes = tree.find("nodes")
        parsed = []
        for node in nodes:
            depth = int(node.findtext("depth"))
            value = float(node.findtext("value"))
            splits = node.find("splits")
            split = None
            if splits is not None:
                s = splits[0]  # depth-1 stumps have exactly one split
                if s.findtext("le") is None:
                    raise ValueError(
                        f"{path}: <gt> (inversed) split not supported")
                split = {
                    "var": var_idx[int(s.findtext("var"))],
                    "le": float(s.findtext("le")),
                }
            parsed.append({"depth": depth, "value": value, "split": split})
        if (len(parsed) != 3 or parsed[0]["split"] is None
                or parsed[1]["split"] is not None
                or parsed[2]["split"] is not None):
            raise ValueError(f"{path}: tree is not a depth-1 stump")
        # readTree: first depth-1 node read -> left, second -> right
        rows.append({
            "var": parsed[0]["split"]["var"],
            "le": parsed[0]["split"]["le"],
            "left_val": parsed[1]["value"],
            "right_val": parsed[2]["value"],
        })
    if len(rows) != ntrees:
        raise ValueError(f"{path}: ntrees={ntrees} but parsed {len(rows)}")
    return rows


def distill_reference_models(reference_dir: str = REFERENCE_DIR,
                             models_dir: str = MODELS_DIR) -> dict[str, str]:
    """Distill both NM ensembles; returns {stage_name: output_path}."""
    out = {}
    for stage, xml_name in (("nm1", "trained_classifierNM1.xml"),
                            ("nm2", "trained_classifierNM2.xml")):
        rows = distill_boost_xml(os.path.join(reference_dir, xml_name))
        dst = os.path.join(models_dir, f"stumps_ref_{stage}.json")
        with open(dst, "w") as f:
            json.dump(rows, f, indent=1)
        out[stage] = dst
    return out


if __name__ == "__main__":
    for stage, path in distill_reference_models().items():
        print(stage, "->", path)
