"""End-to-end curation job: funnel composition, shard layout, commit
protocol, and snapshot idempotence.

The job must add NO decision logic of its own — every stage count is
re-derived here from the registered operators it composes, and the
written dataset is cross-checked row-for-row against those operators'
outputs."""

from __future__ import annotations

import os

import pytest

from ocr_hardsubx_spark.plans import dataset_queries as dq
from ocr_hardsubx_spark.plans.curation import (
    committed_curation_runs,
    read_curated,
    run_curation_job,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def job(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curated"))
    summary = run_curation_job(spark, SF, out)
    return out, summary


def _expected_keep(spark):
    url = {r["doc_id"]: r["keep"]
           for r in dq.q_url_filter(spark, SF).collect()}
    gop = {r["doc_id"]: r["keep"]
           for r in dq.q_gopher_rules(spark, SF).collect()}
    rep = {r["doc_id"]: r["keep"]
           for r in dq.q_gopher_repetition(spark, SF).collect()}
    c4 = {r["doc_id"]: r["keep"]
          for r in dq.q_c4_clean(spark, SF).collect()}
    ded = {r["doc_id"]: r["keep"]
           for r in dq.q_dedup_keep_list(spark, SF).collect()}
    qual = {r["doc_id"]: r["keep"]
            for r in dq.q_quality_cut_trained(spark, SF).collect()}
    return {i for i in url
            if url[i] and gop[i] and rep[i] and c4[i]
            and ded.get(i, True) and qual[i]}


def test_output_is_exactly_the_surviving_docs(spark, job):
    out, summary = job
    assert not summary["skipped"]
    want = _expected_keep(spark)
    got = read_curated(spark, out)
    ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    assert ids == want
    assert summary["n_docs_out"] == len(want)
    clean = {r["doc_id"]: r["clean_text"]
             for r in dq.q_c4_clean(spark, SF).collect()}
    for r in got.select("doc_id", "text").collect():
        assert r["text"] == clean[r["doc_id"]]


def test_stage_census_matches_operator_composition(spark, job):
    _, summary = job
    stages = summary["stages"]
    assert [s for s in stages] == list(
        ("1_raw", "2_url", "3_gopher", "4_repetition", "5_c4",
         "6_near_dedup", "7_quality"))
    docs = spark.read.parquet(SF + "/documents.parquet")
    assert stages["1_raw"]["n_docs"] == docs.count()
    for a, b in zip(list(stages), list(stages)[1:]):
        assert stages[a]["n_docs"] >= stages[b]["n_docs"]
    assert stages["7_quality"]["n_docs"] == summary["n_docs_out"]


def test_shard_layout_is_the_registered_semantics(spark, job):
    """(shard, pos) on the written dataset equals q_shard_shuffle's
    salted-md5 assignment restricted to the survivors: same shard, and
    pos is the dense per-shard rank of the same ordering key."""
    out, _ = job
    got = {r["doc_id"]: (r["shard"], r["pos"])
           for r in read_curated(spark, out).collect()}
    full = {r["doc_id"]: (r["shard"], r["pos"])
            for r in dq.q_shard_shuffle(spark, SF).collect()}
    by_shard: dict[int, list] = {}
    for did, (shard, fpos) in full.items():
        if did in got:
            assert got[did][0] == shard
            by_shard.setdefault(shard, []).append((fpos, did))
    for shard, members in by_shard.items():
        members.sort()
        for rank, (_, did) in enumerate(members, start=1):
            assert got[did] == (shard, rank)


def test_rerun_same_snapshot_is_a_noop(spark, job):
    out, summary = job
    again = run_curation_job(spark, SF, out)
    assert again["skipped"] and again["run_id"] == summary["run_id"]
    assert len(committed_curation_runs(spark, out)) == 1


def test_torn_run_is_invisible(spark, job):
    """A data dir without a manifest (crash before commit) is ignored
    by readers and does not block the committed run."""
    out, summary = job
    torn = os.path.join(out, "data", "run_id=deadbeefdeadbeef")
    os.makedirs(torn, exist_ok=True)
    runs = committed_curation_runs(spark, out)
    assert [r["run_id"] for r in runs] == [summary["run_id"]]
    assert read_curated(spark, out).count() == summary["n_docs_out"]


def test_cli_smoke(tmp_path):
    """The spark-submit entrypoint runs the same code path end to end
    and prints the one-line JSON summary."""
    import json
    import subprocess
    import sys

    out = str(tmp_path / "curated")
    r = subprocess.run(
        [sys.executable, "scripts/run_curation.py", "--input", SF,
         "--output", out, "--cores", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["n_docs_out"] > 0 and not summary["skipped"]
