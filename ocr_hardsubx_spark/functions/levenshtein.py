"""Levenshtein similarity ratio for consecutive-region dedup (R3).

Web analog of the HardsubX consecutive-subtitle dedup specified by
BASELINE.json's north_star (the logic lives in CCExtractor's hardsubx, not
in the reference repo itself — SURVEY.md §2.6 R3).

ratio(a, b) = 1 - levenshtein(a, b) / max(len(a), len(b))

Similarity is computed over the first ``DEDUP_PREFIX_CHARS`` characters of
each normalized region (pinned rule — keeps the DP O(512^2) worst case
regardless of region size, which matters at 10^12-document scale).  A cheap
length-difference bound short-circuits the DP when the ratio cannot reach
the threshold.
"""

from __future__ import annotations

from ..config import DEDUP_PREFIX_CHARS


def levenshtein(a: str, b: str) -> int:
    """Plain iterative two-row DP edit distance."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    if la < lb:  # keep the inner row short
        a, b, la, lb = b, a, lb, la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        ca = a[i - 1]
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[lb]


def similarity_ratio(a: str, b: str) -> float:
    """1 - dist/max(len); 1.0 for two empty strings."""
    a = a[:DEDUP_PREFIX_CHARS]
    b = b[:DEDUP_PREFIX_CHARS]
    m = max(len(a), len(b))
    if m == 0:
        return 1.0
    return 1.0 - levenshtein(a, b) / m


def at_least_as_similar(a: str, b: str, threshold: float) -> bool:
    """True iff similarity_ratio(a, b) >= threshold, with a length
    short-circuit: |la-lb| is a lower bound on the edit distance."""
    a = a[:DEDUP_PREFIX_CHARS]
    b = b[:DEDUP_PREFIX_CHARS]
    m = max(len(a), len(b))
    if m == 0:
        return True
    if 1.0 - abs(len(a) - len(b)) / m < threshold:
        return False
    return 1.0 - levenshtein(a, b) / m >= threshold
