"""Region grouping: pairs -> closest sibling -> sequences (text blocks).

Web analog of the reference's exhaustive grouping (SURVEY.md §2.5):

  isValidPair     (``/root/reference/erfilter.c:1506-1596``): geometric gates
                  (non-overlap, order, height ratio >= 0.4, gap in
                  [-0.4, 2.2] x avg size) + color consistency
  closest sibling (erfilter.c:1187-1241): keep nearest valid partner
  sequences       (erfilter.c:1259-1311): agglomerate compatible pairs,
                  longest-wins subsumption

Our analogs: regions are document-order text blocks; "height" is text
length, "gap" is the char distance between consecutive blocks in the
document stream, "color consistency" is link-density style distance.
Sequences are connected components of the kept pair graph (union-find —
the reference's agglomerate-then-subsume loop computes the same maximal
groups); a region with no valid partner forms a singleton group, which is
the degenerate sequence the reference recovers via its feedback loop
(erfilter.c:1313-1463).

Everything here is document-local: it runs inside the fused vectorized
stage on one document's few surviving regions; the *relational shadow*
(range self-join + window top-1) is exposed in __spark_entry__ queries.
"""

from __future__ import annotations

from ..config import (
    PAIR_GAP_HI,
    PAIR_GAP_LO,
    PAIR_MAX_STYLE_DIST,
    PAIR_MIN_LENGTH_RATIO,
    TRIPLET_GAP_TOLERANCE,
    TRIPLET_MAX_GAP_RATIO,
)
from .parse import Region


def is_valid_pair(a: Region, b: Region) -> bool:
    """Gate for an ordered pair (a before b) of kept regions."""
    if b.start < a.end:          # non-overlap + order (erfilter.c:1508-1527)
        return False
    la, lb = a.area, b.area
    if min(la, lb) / max(1, max(la, lb)) < PAIR_MIN_LENGTH_RATIO:
        return False             # height_ratio analog (erfilter.c:1529)
    avg = 0.5 * (la + lb)
    gap = b.start - a.end
    if not (PAIR_GAP_LO * avg <= gap <= PAIR_GAP_HI * avg):
        return False             # centroid-distance band (erfilter.c:1545)
    if abs(a.link_density - b.link_density) > PAIR_MAX_STYLE_DIST:
        return False             # color-consistency analog (erfilter.c:1553-1595)
    return True


def gaps_consistent(g1: int, g2: int) -> bool:
    """Collinearity analog for two chained pair gaps (G3, reference
    isValidTriplet line-fit consistency erfilter.c:1693-1716): the offset
    run a->b->c is accepted only when the two gaps agree within a ratio
    band (plus an additive tolerance absorbing separator jitter), the way
    the reference rejects triplets whose top/bottom line offsets diverge
    beyond TRIPLET_MAX_DIST of the central height."""
    lo, hi = min(g1, g2), max(g1, g2)
    return hi <= TRIPLET_GAP_TOLERANCE + TRIPLET_MAX_GAP_RATIO * max(0, lo)


def group_regions(kept: list[Region]) -> list[list[Region]]:
    """Group a document's kept regions into ordered text blocks.

    Returns groups ordered by start offset; each group's members ordered by
    start offset.  Closest-sibling pair edges are agglomerated only through
    consistent triplets (pair JOIN pair on the shared middle region +
    gap-run consistency, reference isValidTriplet erfilter.c:1601-1722):
    an edge whose gap is inconsistent with the following edge's gap is kept
    only if it is the tighter of the two — the accidental chain through an
    inconsistent junction does NOT merge (the union-find transitivity of
    round 1 merged it unconditionally).
    """
    kept = sorted(kept, key=lambda r: r.start)
    n = len(kept)
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x: int, y: int) -> None:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[ry] = rx

    # closest-sibling: for each left region, link only the nearest valid
    # right partner (erfilter.c:1187-1241 top-1 per group).  Exact
    # early exits off the start-sort (the former full O(n^2) scan was
    # 2/3 of single-core extraction wall):
    # * gap = kept[j].start - kept[i].end is NON-DECREASING in j, so
    #   the FIRST valid j is the minimum-gap partner with the earliest
    #   tie — identical to the old min-tracking scan;
    # * once gap exceeds PAIR_GAP_HI * 0.5 * (area_i + max remaining
    #   area), no later j can pass the gap band (their gaps are >= and
    #   their bands are <=) — suffix max of area makes that a hard stop.
    sufmax = [0] * (n + 1)
    for idx in range(n - 1, -1, -1):
        sufmax[idx] = max(sufmax[idx + 1], kept[idx].area)
    half_hi = PAIR_GAP_HI * 0.5
    edges: dict[int, int] = {}
    for i in range(n):
        a = kept[i]
        for j in range(i + 1, n):
            gap = kept[j].start - a.end
            if gap > half_hi * (a.area + sufmax[j]):
                break
            if is_valid_pair(a, kept[j]):
                edges[i] = j
                break

    # triplet gate: each chain junction i->j->k is a pair JOIN pair on the
    # shared middle j (isValidTriplet's "at least one region in common",
    # erfilter.c:1607-1611); an inconsistent gap run drops the LOOSER edge
    # so the chain breaks there — the shared region stays with its tighter
    # partner (closest-sibling spirit), and transitivity cannot re-merge
    dropped: set[tuple[int, int]] = set()
    for i, j in edges.items():
        k = edges.get(j)
        if k is None:
            continue
        g1 = kept[j].start - kept[i].end
        g2 = kept[k].start - kept[j].end
        if not gaps_consistent(g1, g2):
            dropped.add((i, j) if g1 >= g2 else (j, k))
    # convergent junctions: several left regions picking the SAME closest
    # right partner also form pair-pairs sharing a region (the reference's
    # shared-b case, erfilter.c:1666-1690, whose both-others-on-one-side
    # triplets are invalid); edges whose gap is inconsistent with the
    # tightest incoming edge drop, so distant text cannot chain into a
    # tight block through a shared tail
    incoming: dict[int, list[int]] = {}
    for i, j in edges.items():
        incoming.setdefault(j, []).append(i)
    for j, srcs in incoming.items():
        if len(srcs) < 2:
            continue
        gaps = sorted((kept[j].start - kept[i].end, i) for i in srcs)
        tightest = gaps[0][0]
        for g, i in gaps[1:]:
            if not gaps_consistent(tightest, g):
                dropped.add((i, j))

    # G4 sequence-compatibility gate (reference isValidSequence,
    # erfilter.c:1131-1147: two sequences merge only if SOME triplet of
    # one is within distance of SOME triplet of the other).  Our 1-D
    # analog: an edge may join two chains only if some gap of the chain
    # behind it is consistent with some gap of the chain ahead of it —
    # two internally-tight chains with divergent overall gap profiles
    # stay separate even when the junction's own gaps pass the triplet
    # gate transitively (e.g. gaps 2..2 -12- 50..50: 12 is consistent
    # with both neighbours but 2-vs-50 is not).  Evaluated simultaneously
    # over the surviving edge graph, so the result is independent of
    # union order; a chain with no gap evidence (singleton) is vacuously
    # compatible, matching the reference's feedback-recovered degenerate
    # sequences.
    kept_edges = [(i, j) for i, j in edges.items() if (i, j) not in dropped]
    gap_of = {(i, j): kept[j].start - kept[i].end for i, j in kept_edges}
    fwd = dict(kept_edges)
    back: dict[int, list[int]] = {}
    for i, j in kept_edges:
        back.setdefault(j, []).append(i)

    # both walks memoize on the node: chain suffixes/prefixes are shared
    # by every edge along a chain, so the former per-edge re-walk was
    # quadratic in chain length (profiled hot on boilerplate-heavy docs)
    _ahead: dict[int, list[int]] = {}
    _behind: dict[int, list[int]] = {}

    def _gaps_ahead(j: int) -> list[int]:
        path = []
        while j in fwd and j not in _ahead:   # starts increase: no cycle
            path.append(j)
            j = fwd[j]
        tail = _ahead.get(j, [])
        for x in reversed(path):
            tail = [gap_of[(x, fwd[x])]] + tail
            _ahead[x] = tail
        return _ahead.get(j, []) if not path else _ahead[path[0]]

    def _gaps_behind(i: int) -> list[int]:
        # iterative post-order over the ancestor in-tree (each node has
        # <= 1 outgoing edge, so ancestors never re-converge)
        order = []
        stack = [i]
        while stack:
            x = stack.pop()
            if x in _behind:
                continue
            order.append(x)
            stack.extend(p for p in back.get(x, []) if p not in _behind)
        for x in reversed(order):
            out = []
            for p in back.get(x, []):
                out.append(gap_of[(p, x)])
                out.extend(_behind[p])
            _behind[x] = out
        return _behind[i]

    for i, j in kept_edges:
        ga = _gaps_behind(i)
        gb = _gaps_ahead(j)
        if ga and gb and not any(
                gaps_consistent(x, y) for x in ga for y in gb):
            continue                       # sequence-incompatible: no union
        union(i, j)

    groups: dict[int, list[Region]] = {}
    for i, r in enumerate(kept):
        groups.setdefault(find(i), []).append(r)
    out = sorted(groups.values(), key=lambda g: g[0].start)
    for gid, g in enumerate(out):
        for r in g:
            r.group_id = gid
    return out


FEEDBACK_PAD = 0.25  # padded-window fraction around each group's span


#: Reference feedback ERFilter dials (erfilter.c:1316 —
#: createERFilterNM1(loadDummyClassifier(), 1, 0.005f, 0.3f, ...)): the
#: re-detection pass has its OWN area gates, relative to the padded
#: window it re-extracts, with the classifier replaced by eval_dummy
#: (erfilter.c:192-198 — any region with area > 0 scores 1.0).
FEEDBACK_MIN_AREA_FRAC = 0.005
FEEDBACK_MAX_AREA_FRAC = 0.3


def feedback_absorb(groups: list[list[Region]],
                    candidates: list[Region]) -> list[list[Region]]:
    """Second-chance feedback loop (G6, reference erfilter.c:1313-1463):
    re-detect inside the padded window around each accepted block with
    the classifier gate DISABLED (eval_dummy — erfilter.c:1316 runs a
    fresh ERFilter with loadDummyClassifier over the padded bbox) and
    absorb regions that satisfy the pair predicates against the nearest
    group member.

    ``candidates``: every parsed region disjoint from the surviving set
    (the caller guarantees disjointness so absorbed text never
    duplicates member text) with area > 0 — INCLUDING regions the main
    cascade never surfaced (below MIN_AREA_ABS, or local-maxima losers
    whose spans don't overlap a survivor).  Our region tree is
    deterministic from the HTML, so "re-run extraction over the padded
    subimage" reduces to re-testing the window's subtree with the dummy
    gate — the tree walk cannot produce different nodes the way a
    re-thresholded component tree can (declared fidelity divergence).

    Per window the reference filter's own gates apply
    (erfilter.c:1316): area within [0.005, 0.3] of the padded span, and
    the region fully inside the window (the reference skips regions
    clipped by the subimage border, erfilter.c:1352-1353).
    One pass, document-local, deterministic.
    """
    if not groups or not candidates:
        return groups
    # sorted by start so each group touches only its padded window's slice
    from bisect import bisect_left

    candidates = sorted(candidates, key=lambda r: r.start)
    cand_starts = [r.start for r in candidates]
    for g in groups:
        lo, hi = g[0].start, g[-1].end
        pad = int(FEEDBACK_PAD * max(1, hi - lo))
        wlo, whi = lo - pad, hi + pad
        wspan = whi - wlo
        absorbed = False
        k0 = bisect_left(cand_starts, wlo)
        for r in candidates[k0:]:
            if r.start >= whi:
                break
            if r.group_id != -1:
                continue
            # window-relative area gates + border clip (see docstring)
            if not (FEEDBACK_MIN_AREA_FRAC * wspan <= r.area
                    <= FEEDBACK_MAX_AREA_FRAC * wspan and r.end <= whi):
                continue
            # nearest member on the matching side, reference pair re-test
            before = [m for m in g if m.end <= r.start]
            after = [m for m in g if m.start >= r.end]
            ok = (before and is_valid_pair(before[-1], r)) or \
                 (after and is_valid_pair(r, after[0]))
            if ok:
                r.group_id = g[0].group_id
                g.append(r)
                absorbed = True
        if absorbed:
            g.sort(key=lambda m: m.start)
    return groups
