"""Single-node reference implementation (the oracle, SURVEY.md §5.2.1).

``extract_document`` runs the full detect -> classify -> recognize -> dedup
pipeline on ONE document with no Spark involved.  It composes the exact
same pure operator functions the Spark stage uses (parse + stage-1 gate +
operators.assemble.finish_document), so the distributed pipeline matches
it byte-for-byte by construction; goldens for the fixture corpus are
generated from this function and committed, pinning behavior against
regressions.

Pipeline (reference ``/root/reference/erfilter.c:1730-1762`` detectRegions):
  parse_document           — component-tree analog (er_tree_extract)
  stage1_gate              — inline cascade gate (er_merge + evalNM1)
  finish_document          — NMS, stage 2 (+ child recovery), grouping,
                             G6 feedback, normalization, HardsubX dedup
"""

from __future__ import annotations

import numpy as np

from ..functions.scoring import StumpModel
from ..operators.assemble import finish_document
from ..operators.cascade import feature_matrix, stage1_gate
from ..operators.parse import parse_document
from ..sources.model_store import load_models

_MODELS: tuple[StumpModel, StumpModel] | None = None


def _models() -> tuple[StumpModel, StumpModel]:
    global _MODELS
    if _MODELS is None:
        _MODELS = load_models()
    return _MODELS


def extract_document(
    html: bytes | str,
    nm1: StumpModel | None = None,
    nm2: StumpModel | None = None,
    channels: tuple = (0,),
) -> dict:
    """Extract one page. Returns
    {"spans": [(start, end, text), ...], "extracted_text": str}.

    ``channels``: detection channels (cascade.channel_features); (0,) is
    the default content polarity, (0, 1) adds the negative link-polarity
    scan (D1) whose survivors union before grouping.
    """
    if nm1 is None or nm2 is None:
        nm1, nm2 = _models()
    regions, stream, inline_events = parse_document(html)
    if not regions:
        return {"spans": [], "extracted_text": ""}
    from ..operators.cascade import channel_features

    X = feature_matrix(regions, inline_events)
    areas = np.array([r.area for r in regions], dtype=np.float64)
    doc_total = np.full(len(regions), regions[0].area, dtype=np.float64)
    mask1, p1 = stage1_gate(X, areas, doc_total, nm1)
    for i, r in enumerate(regions):
        r.probability = float(p1[i])
    extra = []
    for ch in channels:
        if ch == 0:
            continue
        Xc = channel_features(X, ch)
        maskc, pc = stage1_gate(Xc, areas, doc_total, nm1)
        extra.append((Xc, maskc, pc))
    spans, text, _ = finish_document(regions, stream, X, mask1, p1, nm2,
                                     extra_channels=tuple(extra))
    return {
        "spans": [(s["start"], s["end"], s["text"]) for s in spans],
        "extracted_text": text,
    }
