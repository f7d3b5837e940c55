"""Single-node reference implementation (the oracle, SURVEY.md §5.2.1).

``extract_document`` runs the full detect -> classify -> recognize -> dedup
pipeline on ONE document with no Spark involved.  It composes the exact
same pure operator functions the Spark stage uses, so the distributed
pipeline matches it byte-for-byte by construction; goldens for the fixture
corpus are generated from this function and committed, pinning behavior
against regressions.

Pipeline (reference ``/root/reference/erfilter.c:1730-1762`` detectRegions):
  parse_document           — component-tree analog (er_tree_extract)
  stage1_gate              — inline cascade gate (er_merge + evalNM1)
  nonmax_suppression       — er_save / er_tree_nonmax_suppression
  stage2_gate              — er_tree_filter + evalNM2
  group_regions            — erGroupingNM pairs/sequences
  normalize + dedup        — OCR projection + HardsubX consecutive dedup
"""

from __future__ import annotations

import numpy as np

from ..config import GROUP_JOINER
from ..functions.normalize import normalize_text
from ..functions.scoring import StumpModel
from ..operators.cascade import (
    feature_matrix,
    nonmax_suppression,
    stage1_gate,
    stage2_gate,
)
from ..operators.dedup import dedup_consecutive
from ..operators.grouping import group_regions
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
) -> dict:
    """Extract one page. Returns
    {"spans": [(start, end, text), ...], "extracted_text": str}.
    """
    if nm1 is None or nm2 is None:
        nm1, nm2 = _models()
    regions, stream, inline_events = parse_document(html)
    if not regions:
        return {"spans": [], "extracted_text": ""}
    X = feature_matrix(regions, inline_events)
    areas = np.array([r.area for r in regions], dtype=np.float64)
    doc_total = np.full(len(regions), regions[0].area, dtype=np.float64)

    mask1, p1 = stage1_gate(X, areas, doc_total, nm1)
    for i, r in enumerate(regions):
        r.probability = float(p1[i])
    acc1 = np.nonzero(mask1)[0]
    kept_ids = nonmax_suppression(regions, acc1, p1[acc1])
    if not kept_ids:
        return {"spans": [], "extracted_text": ""}

    by_id = {r.region_id: r for r in regions}
    kept = [by_id[i] for i in kept_ids]
    X2 = X[[i for i in kept_ids], :]
    mask2, p2 = stage2_gate(X2, nm2)
    survivors = [r for r, ok, p in zip(kept, mask2, p2, strict=True)
                 if ok and _note_prob(r, p)]
    if not survivors:
        return {"spans": [], "extracted_text": ""}

    groups = group_regions(survivors)
    # per-group assembly: normalize members, drop consecutive near-dups
    # WITHIN the group, then join; the same dedup runs ACROSS groups below
    # (HardsubX consecutive-region semantics at both granularities)
    texts = []
    for g in groups:
        member_texts = [normalize_text(stream[r.start:r.end]) for r in g]
        kept_members = dedup_consecutive(member_texts)
        texts.append("\n".join(member_texts[i] for i in kept_members))
    kept_idx = dedup_consecutive(texts)
    spans = [
        (groups[i][0].start, groups[i][-1].end, texts[i]) for i in kept_idx
    ]
    return {
        "spans": spans,
        "extracted_text": GROUP_JOINER.join(texts[i] for i in kept_idx),
    }


def _note_prob(r, p: float) -> bool:
    r.probability = float(p)
    return True
