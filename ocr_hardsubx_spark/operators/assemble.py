"""Per-document back half of the pipeline: NMS -> stage 2 (with child
recovery) -> grouping -> feedback -> recognition -> dedup -> assembly.

One shared implementation consumed by both the single-node oracle
(refimpl) and the Spark stage (operators/extract.py), so the two can never
drift.  Mirrors the reference sequence er_tree_nonmax_suppression ->
er_tree_filter -> erGroupingNM(feedback=true) -> OCR -> HardsubX dedup
(``/root/reference/erfilter.c:1730-1762``).
"""

from __future__ import annotations

from bisect import bisect_right

import numpy as np

from ..config import GROUP_JOINER, MIN_AREA_ABS
from ..functions.normalize import normalize_text
from ..functions.scoring import StumpModel
from .cascade import nms_with_forest, stage2_with_recovery
from .dedup import dedup_consecutive
from .grouping import feedback_absorb, group_regions
from .parse import Region


def finish_document(
    regions: list[Region],
    stream: str,
    X: np.ndarray,
    mask1: np.ndarray,
    p1: np.ndarray,
    nm2: StumpModel,
) -> tuple[list[dict], str, int]:
    """Returns (spans, extracted_text, n_surviving_regions)."""
    acc1 = np.nonzero(mask1)[0]
    kept_ids, children = nms_with_forest(regions, acc1, p1[acc1])
    if not kept_ids:
        return [], "", 0
    survivors = stage2_with_recovery(kept_ids, children, X, nm2, regions)
    if not survivors:
        return [], "", 0

    groups = group_regions(survivors)

    # G6 feedback: stage-1-rejected, area-plausible regions disjoint from
    # every survivor get a second chance via the pair predicates
    starts = sorted((r.start, r.end) for r in survivors)
    s_lo = [s for s, _ in starts]

    def _disjoint(r: Region) -> bool:
        k = bisect_right(s_lo, r.start)
        if k < len(starts) and starts[k][0] < r.end:
            return False
        return not (k > 0 and starts[k - 1][1] > r.start)

    candidates = [
        r for i, r in enumerate(regions)
        if not mask1[i] and r.area >= MIN_AREA_ABS and r.group_id == -1
        and _disjoint(r)
    ]
    groups = feedback_absorb(groups, candidates)

    texts = []
    for g in groups:
        member_texts = [normalize_text(stream[r.start:r.end]) for r in g]
        km = dedup_consecutive(member_texts)
        texts.append("\n".join(member_texts[i] for i in km))
    kept_idx = dedup_consecutive(texts)
    spans = [
        {"start": int(groups[i][0].start), "end": int(groups[i][-1].end),
         "text": texts[i]}
        for i in kept_idx
    ]
    return spans, GROUP_JOINER.join(texts[i] for i in kept_idx), len(survivors)
