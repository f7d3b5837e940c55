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

from ..config import GROUP_JOINER
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
    extra_channels: tuple = (),
) -> tuple[list[dict], str, int]:
    """Returns (spans, extracted_text, n_surviving_regions).

    ``extra_channels``: optional per-channel (X_c, mask_c, p_c) triples
    (e.g. the negative link-polarity channel, cascade.channel_features).
    Each channel runs its own NMS + stage 2 — the reference runs
    er_filter1/er_filter2 per channel (erfilter.c:1752-1758) — and the
    survivor sets union (dedup by region_id) before grouping, as
    erGroupingNM consumes all channels' regions (erfilter.c:1754-1761).
    """

    def _channel_survivors(Xc, maskc, pc):
        accc = np.nonzero(maskc)[0]
        keptc, childrenc = nms_with_forest(regions, accc, pc[accc])
        if not keptc:
            return []
        return stage2_with_recovery(keptc, childrenc, Xc, nm2, regions)

    survivors = _channel_survivors(X, mask1, p1)
    seen_ids = {r.region_id for r in survivors}
    for Xc, maskc, pc in extra_channels:
        for r in _channel_survivors(Xc, maskc, pc):
            if r.region_id not in seen_ids:
                seen_ids.add(r.region_id)
                survivors.append(r)
    if not survivors:
        return [], "", 0

    groups = group_regions(survivors)

    # G6 feedback: EVERY non-empty region disjoint from the surviving
    # set gets a second chance via the pair predicates — eval_dummy
    # semantics (erfilter.c:1316 re-runs detection over the padded box
    # with loadDummyClassifier; area > 0 is its only classifier gate),
    # so regions the main cascade never surfaced (below MIN_AREA_ABS,
    # stage-1 rejects, non-overlapping NMS losers) are all recoverable.
    # feedback_absorb applies the feedback filter's own window-relative
    # area gates (0.005-0.3 of the padded span) per reference dials.
    starts = sorted((r.start, r.end) for r in survivors)
    s_lo = [s for s, _ in starts]

    def _disjoint(r: Region) -> bool:
        k = bisect_right(s_lo, r.start)
        if k < len(starts) and starts[k][0] < r.end:
            return False
        return not (k > 0 and starts[k - 1][1] > r.start)

    candidates = [
        r for r in regions
        if r.area > 0 and r.group_id == -1 and _disjoint(r)
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
