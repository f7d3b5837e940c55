"""DSIR importance resampling and SemDeDup — the round-6 additions to
the curation operator family.  Hand-built fixtures pin the semantics
(target-affinity ordering, Gumbel top-k boundary, cluster-scoped drop
rule, keep-representative invariant); oracle parity at sf0.01 rides the
entry-contract gate like every other registered query.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from ocr_hardsubx_spark.plans import dataset_queries as dq

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------


def _docs(spark, tmp_path, rows):
    out = str(tmp_path)
    (spark.createDataFrame(rows, "doc_id long, text string, lang string")
     .write.parquet(out + "/documents.parquet"))
    return out


def test_dsir_target_affinity_orders_weights(spark, tmp_path):
    """Docs built from the target-language bigram distribution score
    above docs built from the out-of-target distribution: the weight is
    a log ratio of target vs raw feature mass."""
    en = "the cat sat on the mat and the dog ran"
    de = "der hund lief schnell durch den wald heute"
    rows = ([(i, en, "en") for i in range(8)]
            + [(100 + i, de, "de") for i in range(8)]
            # held-out docs, one per vocabulary, both labeled 'xx' so
            # neither contributes to the target counts
            + [(900, en, "xx"), (901, de, "xx")])
    out = _docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in dq.q_dsir(spark, out).collect()}
    assert got[900]["dsir_weight"] > 0 > got[901]["dsir_weight"]
    assert got[900]["dsir_weight"] > got[901]["dsir_weight"]


def test_dsir_short_docs_weight_zero(spark, tmp_path):
    """Docs with fewer than two tokens have no bigram features: weight
    is exactly 0.0, and they still receive a Gumbel score (the sampler
    sees the whole corpus)."""
    rows = [(1, "alpha beta gamma", "en"), (2, "single", "en"),
            (3, "", "en")]
    out = _docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in dq.q_dsir(spark, out).collect()}
    assert got[2]["dsir_weight"] == 0.0
    assert got[3]["dsir_weight"] == 0.0
    for d in (2, 3):
        assert got[d]["gumbel_score"] is not None
    assert len(got) == 3


def test_dsir_gumbel_topk_boundary(spark, tmp_path, monkeypatch):
    """With K patched below the corpus size, exactly K docs are kept
    and they are the lexicographic top-K by (score DESC, doc_id ASC) —
    the broadcast-boundary predicate reproduces row_number <= K."""
    monkeypatch.setattr(dq, "DSIR_KEEP_K", 5)
    rows = [(i, f"w{i % 7} w{(i + 1) % 7} w{(i + 2) % 5}",
             "en" if i % 2 else "de") for i in range(30)]
    out = _docs(spark, tmp_path, rows)
    res = dq.q_dsir(spark, out).collect()
    assert len(res) == 30
    kept = {r["doc_id"] for r in res if r["keep"]}
    top5 = [r["doc_id"] for r in
            sorted(res, key=lambda r: (-r["gumbel_score"], r["doc_id"]))[:5]]
    assert kept == set(top5)
    assert len(kept) == 5


def test_dsir_deterministic_across_runs(spark, tmp_path):
    """No RNG state anywhere: two evaluations produce identical
    weights, scores, and keep sets."""
    rows = [(i, f"tok{i % 11} tok{(i * 3) % 11} tok{(i * 7) % 11}",
             "en" if i % 3 else "fr") for i in range(20)]
    out = _docs(spark, tmp_path, rows)
    a = sorted(map(tuple, dq.q_dsir(spark, out).collect()))
    b = sorted(map(tuple, dq.q_dsir(spark, out).collect()))
    assert a == b


def test_dsir_keep_all_when_corpus_below_k(spark, tmp_path):
    """Fewer docs than DSIR_KEEP_K: the boundary row is the corpus
    minimum, so everything is kept."""
    rows = [(i, "a b c", "en") for i in range(4)]
    out = _docs(spark, tmp_path, rows)
    res = dq.q_dsir(spark, out).collect()
    assert len(res) == 4 and all(r["keep"] for r in res)


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------


def _unit(*comps):
    """64-dim unit vector from (dim, weight) components."""
    v = np.zeros(64)
    for d, w in comps:
        v[d] = w
    return (v / np.linalg.norm(v)).astype(np.float32).tolist()


def _emb(spark, tmp_path, extra):
    """Embeddings fixture: vec 0 (query slot) + 16 basis seeds (the IVF
    codebook rows) + the test vectors in `extra` = [(vec_id, vec)]."""
    rows = [(0, _unit((40, 1.0)), 0)]
    rows += [(i, _unit((i - 1, 1.0)), 0) for i in range(1, 17)]
    rows += [(vid, vec, 0) for vid, vec in extra]
    out = str(tmp_path)
    (spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
     .write.parquet(out + "/embeddings.parquet"))
    return out


def test_semdedup_drops_high_centsim_twin(spark, tmp_path):
    """Two near-identical vectors in one cluster: the member CLOSER to
    the centroid is dropped, the farther one kept (SemDeDup keeps the
    lowest-centroid-similarity representative); an unrelated member of
    the same cluster survives."""
    near_cent = _unit((0, 1.0), (20, 0.1))    # cos to e_0 ~ 0.995
    far_cent = _unit((0, 1.0), (20, 0.35))    # cos to e_0 ~ 0.94
    lone = _unit((0, 0.34), (25, 0.94))       # same cluster, cos to twins < tau
    out = _emb(spark, tmp_path,
               [(100, near_cent), (101, far_cent), (102, lone)])
    got = {r["vec_id"]: r for r in dq.q_semdedup(spark, out).collect()}
    assert got[100]["list_id"] == got[101]["list_id"] == 1
    assert got[100]["is_dropped"] is True      # nearer the centroid
    assert got[101]["is_dropped"] is False     # kept representative
    assert got[102]["is_dropped"] is False
    assert got[100]["cent_sim"] > got[101]["cent_sim"]


def test_semdedup_cluster_scoped(spark, tmp_path):
    """A duplicate pair split across two clusters is NOT deduped: the
    comparison is intra-cluster by design (the cross-cluster tail is
    the recall/cost dial SemDeDup trades on)."""
    a = _unit((1, 0.8), (2, 0.6))              # cluster of e_1
    b = _unit((1, 0.6), (2, 0.8))              # cluster of e_2; cos(a,b)=.96
    out = _emb(spark, tmp_path, [(200, a), (201, b)])
    got = {r["vec_id"]: r for r in dq.q_semdedup(spark, out).collect()}
    assert got[200]["list_id"] != got[201]["list_id"]
    assert got[200]["is_dropped"] is False
    assert got[201]["is_dropped"] is False


def test_semdedup_keeps_one_per_duplicate_chain(spark, tmp_path):
    """Three mutual duplicates in one cluster: exactly the
    lowest-cent_sim member survives, the other two drop."""
    v1 = _unit((3, 1.0), (30, 0.05))
    v2 = _unit((3, 1.0), (30, 0.15))
    v3 = _unit((3, 1.0), (30, 0.25))           # farthest from e_3
    out = _emb(spark, tmp_path, [(300, v1), (301, v2), (302, v3)])
    got = {r["vec_id"]: r for r in dq.q_semdedup(spark, out).collect()}
    assert [got[i]["is_dropped"] for i in (300, 301, 302)] == \
        [True, True, False]


def test_semdedup_invariants_on_corpus(spark):
    """On the real sf0.001 embeddings: every assigned vector appears
    exactly once, and every non-empty cluster keeps at least one member
    (the lexicographic-minimum representative can never be beaten)."""
    res = dq.q_semdedup(spark, SF).collect()
    ids = [r["vec_id"] for r in res]
    assert len(ids) == len(set(ids))
    by_cluster = {}
    for r in res:
        by_cluster.setdefault(r["list_id"], []).append(r["is_dropped"])
    for lid, drops in by_cluster.items():
        assert not all(drops), f"cluster {lid} lost every member"


def test_semdedup_plan_one_kernel_one_shuffle(spark):
    """The scale contract: exactly ONE Arrow assignment kernel (a
    Filter on the UDF column would make ExtractPythonUDFs evaluate it
    twice), ONE exchange (on list_id), and no per-row Python."""
    df = dq.q_semdedup(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # count in the FINAL adaptive plan only (the toString repeats the
    # whole tree under "== Initial Plan ==")
    plan = plan.split("Initial Plan")[0]
    assert plan.count("ArrowEvalPython") == 1, plan
    assert plan.count("Exchange") == 1, plan
    assert "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" in plan


def test_dsir_plan_no_global_sort_window(spark):
    """The keep decision must not be a global rank window (single
    reducer at 10^12 docs): the boundary is a TakeOrdered 1-row
    broadcast and `keep` a filter predicate."""
    df = dq.q_dsir(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "BatchEvalPython" not in plan


def test_semdedup_tau_boundary_uses_rounded_cosine(spark, tmp_path,
                                                   monkeypatch):
    """A pair whose exact cosine is just BELOW tau but rounds to tau at
    4 decimals is treated as a duplicate — comparisons happen on the
    rounded value on both engines (cross-engine determinism rule)."""
    monkeypatch.setattr(dq, "SEMDEDUP_TAU", 0.7071)
    a = _unit((5, 1.0))
    b = _unit((5, 1.0), (31, 1.0))   # cos = 1/sqrt(2) = 0.70710678...
    out = _emb(spark, tmp_path, [(400, a), (401, b)])
    got = {r["vec_id"]: r for r in dq.q_semdedup(spark, out).collect()}
    assert got[400]["list_id"] == got[401]["list_id"] == 6
    # 0.70710678 rounds to 0.7071 == tau -> duplicate pair; 401 is
    # farther from the centroid, so 400 drops
    assert got[400]["is_dropped"] is True
    assert got[401]["is_dropped"] is False
