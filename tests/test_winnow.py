"""Winnowing guarantee (Schleimer et al. 2003): any shared token run
of length >= W + K - 1 yields at least one shared fingerprint."""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_hardsubx_spark.plans.dataset_queries import WINNOW_K, WINNOW_W

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
         "theta", "iota", "kappa"]


def _fps(tokens):
    """Pure-Python mirror of the registered kernel."""
    hs = []
    for i in range(len(tokens) - WINNOW_K + 1):
        gram = " ".join(tokens[i:i + WINNOW_K])
        hs.append(int(hashlib.md5(gram.encode()).hexdigest()[:12], 16))
    return {min(hs[j:j + WINNOW_W])
            for j in range(len(hs) - WINNOW_W + 1)}


@settings(max_examples=50, deadline=None)
@given(
    left=st.lists(st.sampled_from(VOCAB), max_size=8),
    shared=st.lists(st.sampled_from(VOCAB),
                    min_size=WINNOW_W + WINNOW_K - 1,
                    max_size=WINNOW_W + WINNOW_K + 4),
    right=st.lists(st.sampled_from(VOCAB), max_size=8),
)
def test_shared_run_shares_a_fingerprint(left, shared, right):
    doc_a = left + shared
    doc_b = shared + right
    assert _fps(doc_a) & _fps(doc_b), (doc_a, doc_b)


def test_density_roughly_one_per_window():
    tokens = [f"w{i}" for i in range(200)]   # all grams distinct
    n_grams = len(tokens) - WINNOW_K + 1
    fps = _fps(tokens)
    # winnowing retains ~2/(W+1) of the grams; allow generous slack
    assert len(fps) <= n_grams
    assert len(fps) >= n_grams // (2 * WINNOW_W)


def test_short_doc_has_no_fingerprints(spark):
    from ocr_hardsubx_spark.plans.dataset_queries import (
        q_winnow_fingerprints)

    rows = q_winnow_fingerprints(spark, "/root/testdata/sf0.001") \
        .collect()
    # every fixture doc long enough gets fps; none crashes on shorts
    assert all(r.n_fps > 0 for r in rows)
