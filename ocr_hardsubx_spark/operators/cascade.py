"""Two-stage cascade + non-max suppression over DOM region trees.

Mirrors the reference's cost-ordered cascade (SURVEY.md §4 O1):

  stage 1  — cheap incremental features, gate p >= 0.2 plus area bounds
             (inline gate in er_merge, ``/root/reference/erfilter.c:817-832``)
  NMS      — keep locally-maximal-probability regions along ancestor paths
             (er_save max/min-probability-ancestor tracking erfilter.c:872-925;
             er_tree_nonmax_suppression erfilter.c:1062-1102)
  stage 2  — expensive features on survivors only, gate p >= 0.5
             (er_tree_filter erfilter.c:928-1059)

Feature computation is vectorized with numpy across ALL regions of an Arrow
batch at once (potentially thousands of documents); only the NMS path-scan
walks per-document trees (they are tiny, and document-local by
construction — no shuffle).
"""

from __future__ import annotations

import numpy as np

from ..config import (
    MAX_AREA_FRAC,
    MIN_AREA_ABS,
    MIN_AREA_FRAC,
    MIN_PROB_DIFF,
    STAGE1_MIN_PROB,
    STAGE2_MIN_PROB,
)
from ..functions.scoring import StumpModel
from .parse import Region, med_crossings, region_crossings

INFLEXION_MIN_DIFF = 0.2  # |profile diff| below this is noise, not an inflexion


def num_inflexions(profiles: list[float]) -> float:
    """Sign changes of significant diffs in children's content profiles
    (num_inflexion_points analog, reference erfilter.c:958-990)."""
    n = 0
    last_sign = 0
    prev = None
    for v in profiles:
        if prev is not None:
            d = v - prev
            if abs(d) > INFLEXION_MIN_DIFF:
                s = 1 if d > 0 else -1
                if last_sign and s != last_sign:
                    n += 1
                last_sign = s
        prev = v
    return float(n)


def profile_gradient(profiles: list[float]) -> tuple[float, float]:
    """Gradient-magnitude analog as a standalone descriptor (D4, reference
    get_gradient_magnitude ``filter.c`` feeding channel 4 of
    computeNMChannels, erfilter.c:176-190): the |diff| sequence of a
    region's child content profiles is its "intensity gradient" along the
    document axis.  Returns (max, mean) of the magnitudes — the same
    diffs whose thresholded sign changes drive ``num_inflexions``; here
    they are exposed unthresholded, as the reference exposes the raw
    gradient channel next to the derived features."""
    if len(profiles) < 2:
        return 0.0, 0.0
    diffs = [abs(b - a) for a, b in zip(profiles, profiles[1:])]
    return max(diffs), sum(diffs) / len(diffs)


def feature_matrix(regions: list[Region], inline_events: list[int]) -> np.ndarray:
    """(n_regions, 7) float64 feature matrix; columns per model_store spec.
    Stage 1 uses X[:, :4], stage 2 the full matrix."""
    n = len(regions)
    X = np.empty((n, 7), dtype=np.float64)
    for i, r in enumerate(regions):
        perimeter = 2 * r.n_elements
        raw_span = max(1, r.raw_span)
        X[i, 0] = r.area / max(1, perimeter)
        X[i, 1] = r.link_area / max(1, r.area)
        X[i, 2] = 1.0 - r.islands
        # med_crossings is 0 for the (common) regions with no inline events
        X[i, 3] = (_med_crossings_sampled(r, inline_events)
                   if r.ev_end > r.ev_start else 0.0)
        X[i, 4] = r.skipped_chars / raw_span
        X[i, 5] = r.area / raw_span
        X[i, 6] = num_inflexions(r.child_profiles)
    return X


def _med_crossings_sampled(r: Region, inline_events: list[int]) -> float:
    """Exact equivalent of ``med_crossings(region_crossings(r, events))``
    without materializing the per-line counts list: only the three
    sampled lines (h/6, 3h/6, 5h/6 — erfilter.c:799-808) are counted.
    When sample lines coincide (short regions) each target is counted
    independently, matching the list formulation's repeated reads."""
    h = r.end_line - r.start_line + 1
    t1 = r.start_line + h // 6
    t2 = r.start_line + 3 * h // 6
    t3 = r.start_line + 5 * h // 6
    c1 = c2 = c3 = 0
    for ln in inline_events[r.ev_start:r.ev_end]:
        if ln == t1:
            c1 += 1
        if ln == t2:
            c2 += 1
        if ln == t3:
            c3 += 1
    if c1 > c2:
        c1, c2 = c2, c1
    if c2 > c3:
        c2, c3 = c3, c2
    if c1 > c2:
        c1, c2 = c2, c1
    return float(c2)


def invert_link_polarity(X: np.ndarray) -> np.ndarray:
    """Negative-polarity channel (D1 analog of detectRegions' appended
    ``subtract(channel, 255)`` channels, reference erfilter.c:1738-1744).

    On the web the light/dark duality maps to the content/link duality:
    channel 1 treats LINK text as the foreground signal (f1' = 1 - f1,
    i.e. link_density inverted), so link-structured main content — a
    curated directory, a table of contents — that stage 1 rejects on
    channel 0 becomes detectable.  Every other descriptor is polarity-
    invariant, exactly as the reference's negated channel preserves
    geometry: the inflexion feature counts |profile diffs| (sign-
    symmetric), and area/islands/crossings don't change.  Survivors of
    all channels union before grouping, as erGroupingNM consumes all
    channels' regions (erfilter.c:1754-1761)."""
    Xc = X.copy()
    Xc[:, 1] = 1.0 - Xc[:, 1]
    return Xc


def channel_features(X: np.ndarray, channel: int) -> np.ndarray:
    """Feature matrix for one detection channel (0 = as-parsed, 1 =
    negative link polarity)."""
    if channel == 0:
        return X
    if channel == 1:
        return invert_link_polarity(X)
    raise ValueError(f"unknown channel {channel}")


def stage1_gate(X: np.ndarray, areas: np.ndarray, doc_total: np.ndarray,
                nm1: StumpModel) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized stage-1 accept mask + probabilities.

    Gate (er_merge, erfilter.c:817-832): p >= minProbability AND
    minArea*N <= area <= maxArea*N AND the w>2/h>2 analog (area >= 3).
    ``doc_total`` is N (total doc text chars) aligned per region.
    """
    p = nm1.probability(X[:, :4])
    lo = np.maximum(MIN_AREA_ABS, MIN_AREA_FRAC * doc_total)
    hi = MAX_AREA_FRAC * doc_total
    mask = (p >= STAGE1_MIN_PROB) & (areas >= lo) & (areas <= hi)
    return mask, p


def stage2_gate(X: np.ndarray, nm2: StumpModel) -> tuple[np.ndarray, np.ndarray]:
    """Stage-2 accept mask + probabilities (er_tree_filter gate,
    erfilter.c:1018-1021). Area bounds were already enforced at stage 1."""
    p = nm2.probability(X)
    return p >= STAGE2_MIN_PROB, p


def nms_with_forest(regions: list[Region], accepted_idx: np.ndarray,
                    prob: np.ndarray) -> tuple[list[int], dict[int, list[int]]]:
    """nonmax_suppression + the spliced accepted-forest children map.

    The children map lets stage 2 recover a rejected container's clean
    children (er_tree_filter splices rejected nodes' children to the
    grandparent, reference erfilter.c:1046-1058): when stage 2 rejects a
    kept region, its direct children in the accepted forest become
    candidates in its place.
    """
    kept = nonmax_suppression(regions, accepted_idx, prob)
    children = _spliced_children(regions, accepted_idx)
    return kept, children


def _spliced_children(regions: list[Region],
                      accepted_idx: np.ndarray) -> dict[int, list[int]]:
    acc = set(int(i) for i in accepted_idx)
    by_id = {r.region_id: r for r in regions}
    children: dict[int, list[int]] = {int(i): [] for i in accepted_idx}
    for i in accepted_idx:
        p = by_id[int(i)].parent_id
        while p != -1 and p not in acc:
            p = by_id[p].parent_id
        if p != -1:
            children[p].append(int(i))
    return children


def stage2_with_recovery(kept_ids: list[int], children: dict[int, list[int]],
                         X: np.ndarray, nm2: StumpModel,
                         regions: list[Region]) -> list[Region]:
    """Stage-2 gate with child splicing: a rejected region's accepted-
    forest children are re-tested in its place (bounded by tree depth).
    Returns surviving Regions with probability set."""
    by_id = {r.region_id: r for r in regions}
    survivors: list[Region] = []
    queue = list(kept_ids)
    seen = set(queue)
    while queue:
        idx = np.array(queue, dtype=np.int64)
        mask, p = stage2_gate(X[idx, :], nm2)
        next_queue: list[int] = []
        for rid, ok, pp in zip(queue, mask, p):
            if ok:
                r = by_id[rid]
                r.probability = float(pp)
                survivors.append(r)
            else:
                for c in children.get(rid, ()):
                    if c not in seen:
                        seen.add(c)
                        next_queue.append(c)
        queue = next_queue
    return survivors


def nonmax_suppression(regions: list[Region], accepted_idx: np.ndarray,
                       prob: np.ndarray) -> list[int]:
    """Keep locally-maximal regions along ancestor chains of the accepted
    forest (one document).

    Modeled on er_save (erfilter.c:900-917): along each root->leaf path
    track the max- and min-probability ancestors; when a node becomes the
    new max and (maxP >= minProbability and maxP - minP > minProbabilityDiff)
    it takes the local_maxima flag and clears its predecessor's.
    Rejected regions are spliced out first: each accepted region's parent
    is its nearest accepted ancestor (er_merge child-splicing analog,
    erfilter.c:847-862).

    Intentional divergences from er_save (pinned by the committed goldens
    and the hand-authored suite; round-1 advisory asked that they be
    declared rather than papered over):

    * the gate uses ``p >= minProbability`` where the reference uses
      strict ``>`` — our probabilities come from different (web-feature)
      models, and the boundary case is pinned by tests;
    * ALL forest roots start flagged, not just the reference's single
      whole-image root — after splicing, a document's accepted forest has
      several roots and each chain needs a starting maximum;
    * the superseded predecessor's flag is cleared unconditionally,
      where the reference clears only a flagged direct parent — with
      spliced chains the previous max need not be the direct parent.
    """
    if len(accepted_idx) == 0:
        return []
    acc = set(int(i) for i in accepted_idx)
    by_id = {r.region_id: r for r in regions}
    # splice: nearest accepted ancestor
    parent_of: dict[int, int] = {}
    for i in accepted_idx:
        p = by_id[int(i)].parent_id
        while p != -1 and p not in acc:
            p = by_id[p].parent_id
        parent_of[int(i)] = p
    children: dict[int, list[int]] = {int(i): [] for i in accepted_idx}
    roots = []
    for i, p in parent_of.items():
        if p == -1:
            roots.append(i)
        else:
            children[p].append(i)
    pr = {int(i): float(prob[k]) for k, i in enumerate(accepted_idx)}

    flag: dict[int, bool] = {}
    # iterative DFS carrying (node, max_anc, min_anc)
    stack = [(r, r, r) for r in roots]
    for r in roots:
        flag[r] = True
    while stack:
        node, mx, mn = stack.pop()
        if node != mn and pr[node] < pr[mn]:
            mn = node
        if node != mx and pr[node] > pr[mx]:
            # node supersedes the previous max ancestor (erfilter.c:900-917)
            if pr[node] >= STAGE1_MIN_PROB and pr[node] - pr[mn] > MIN_PROB_DIFF:
                flag[node] = True
                flag[mx] = False
            mx = node
        for c in children[node]:
            stack.append((c, mx, mn))
    return sorted(i for i in flag if flag.get(i))
