"""Levenshtein similarity ratio for consecutive-region dedup (R3).

Web analog of the HardsubX consecutive-subtitle dedup specified by
BASELINE.json's north_star (the logic lives in CCExtractor's hardsubx, not
in the reference repo itself — SURVEY.md §2.6 R3).

ratio(a, b) = 1 - levenshtein(a, b) / max(len(a), len(b))

Similarity is computed over the first ``DEDUP_PREFIX_CHARS`` characters of
each normalized region (pinned rule — bounds the DP at 512^2 cells
regardless of region size, which matters at 10^12-document scale).  Two
fast paths keep the hot loop cheap:

* a length-difference bound short-circuits the DP when the ratio cannot
  reach the threshold;
* the DP itself is numpy-vectorized one row at a time using the
  running-minimum identity  cur[j] = j + min_{k<=j}(cand[k] - k)
  (unit insertion costs), with early exit once every cell in a row
  exceeds the distance cap.
"""

from __future__ import annotations

import numpy as np

from ..config import DEDUP_PREFIX_CHARS


def levenshtein(a: str, b: str) -> int:
    """Edit distance; pure-Python two-row DP for short inputs, numpy rows
    for long ones.  Both paths compute the exact distance."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    if la * lb <= 1024:
        return _lev_py(a, b)
    return _lev_np(a, b, cap=None)


def _lev_py(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    if la < lb:
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


def _lev_np(a: str, b: str, cap: int | None) -> int:
    """Row-vectorized DP.  With ``cap``, returns any value > cap as soon as
    the true distance provably exceeds it."""
    la, lb = len(a), len(b)
    if la < lb:
        a, b, la, lb = b, a, lb, la
    bcodes = np.fromiter((ord(c) for c in b), dtype=np.int64, count=lb)
    idx = np.arange(lb + 1, dtype=np.int64)
    prev = idx.copy()
    cur = np.empty(lb + 1, dtype=np.int64)
    for i in range(1, la + 1):
        cost = (bcodes != ord(a[i - 1])).astype(np.int64)
        cur[0] = i
        np.minimum(prev[:-1] + cost, prev[1:] + 1, out=cur[1:])
        # fix left-to-right dependency: cur[j] = j + min_{k<=j}(cur[k]-k)
        t = cur - idx
        np.minimum.accumulate(t, out=t)
        cur = t + idx
        if cap is not None and cur.min() > cap:
            return cap + 1
        prev, cur = cur, prev
    return int(prev[lb])


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
    short-circuit (|la-lb| lower-bounds the distance) and a capped DP."""
    a = a[:DEDUP_PREFIX_CHARS]
    b = b[:DEDUP_PREFIX_CHARS]
    m = max(len(a), len(b))
    if m == 0:
        return True
    # ratio >= threshold  <=>  dist <= (1 - threshold) * m
    cap = int((1.0 - threshold) * m)
    if abs(len(a) - len(b)) > cap:
        return False
    if a == b:
        return True
    if len(a) * len(b) <= 1024:
        return _lev_py(a, b) <= cap
    return _lev_np(a, b, cap=cap) <= cap