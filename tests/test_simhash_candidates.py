"""SimHash 64-bit fingerprint + banded Hamming candidate pairs.

Round-2 verdict item 1: the fingerprint must be CONSUMED by a
candidates-then-verify near-dup search, with a behavioral test that two
docs at small Hamming distance pair and two at large distance don't.

The test mirrors the fingerprint definition in pure Python (md5 halves,
+/-1 bit votes), searches deterministic single-token edits of a base
document for a variant whose fingerprint lands at 1 <= hamming <= 3
(pairs: guaranteed by the 4x16-bit band pigeonhole) and uses an
unrelated document at hamming >= 8 (must not pair even when, by chance,
it shares a band — the exact-verify filter kicks it out).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from ocr_hardsubx_spark.plans.dataset_queries import (
    SIMHASH_HAMMING_MAX,
    q_simhash,
    q_simhash_candidates,
)

BASE = ("quarterly revenue grew nine percent across the retail division "
        "while logistics costs held flat according to the filing")
FAR = ("völlig anderer deutscher Text über Bergwanderungen im Winter "
       "mit Schnee Lawinen Hütten Gipfeln und langen Abstiegen")


def simhash64(text: str) -> int:
    """Pure-Python mirror of q_simhash's definition."""
    votes = [0] * 64
    for w in text.split(" "):
        if not w:
            continue
        d = hashlib.md5(w.encode()).hexdigest()
        hi, lo = int(d[:8], 16), int(d[8:16], 16)
        for i in range(32):
            votes[i] += 1 if (lo >> i) & 1 else -1
            votes[32 + i] += 1 if (hi >> i) & 1 else -1
    v = sum(1 << i for i in range(64) if votes[i] > 0)
    return v - (1 << 64) if v >= (1 << 63) else v


def hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _near_variant() -> tuple[str, int]:
    """Deterministic search: replace one token of BASE until the
    fingerprint lands at 1 <= hamming <= SIMHASH_HAMMING_MAX."""
    base_h = simhash64(BASE)
    toks = BASE.split(" ")
    for i in range(len(toks)):
        for sub in ("eight", "seven", "six", "five", "four", "three",
                    "two", "ten", "eleven", "twelve"):
            cand = " ".join(toks[:i] + [sub] + toks[i + 1:])
            d = hamming(base_h, simhash64(cand))
            if 1 <= d <= SIMHASH_HAMMING_MAX:
                return cand, d
    raise AssertionError("no near variant found — widen the search")


def test_mirror_matches_engine(spark, tmp_path):
    """The pure-Python mirror and q_simhash agree (so the distance
    arithmetic below tests the real fingerprints)."""
    p = str(tmp_path / "documents.parquet")
    pd.DataFrame({"doc_id": [0, 1], "text": [BASE, FAR]}).to_parquet(p)
    got = {r["doc_id"]: r["simhash64"]
           for r in q_simhash(spark, str(tmp_path)).collect()}
    assert got[0] == simhash64(BASE)
    assert got[1] == simhash64(FAR)


def test_near_pairs_far_does_not(spark, tmp_path):
    near, d_near = _near_variant()
    d_far = hamming(simhash64(BASE), simhash64(FAR))
    assert d_far >= 8, f"fixture too similar: {d_far}"

    p = str(tmp_path / "documents.parquet")
    pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [BASE, near, FAR],
    }).to_parquet(p)

    rows = q_simhash_candidates(spark, str(tmp_path)).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
    # hamming <= 3 with 4 bands: the near pair MUST be found (pigeonhole)
    assert pairs.get((0, 1)) == d_near
    # the far doc pairs with nothing
    assert (0, 2) not in pairs and (1, 2) not in pairs
    # every returned pair respects the verify threshold
    assert all(h <= SIMHASH_HAMMING_MAX for h in pairs.values())


def test_identical_docs_pair_at_zero(spark, tmp_path):
    p = str(tmp_path / "documents.parquet")
    pd.DataFrame({"doc_id": [5, 9], "text": [BASE, BASE]}).to_parquet(p)
    rows = q_simhash_candidates(spark, str(tmp_path)).collect()
    assert {(r["doc_a"], r["doc_b"], r["hamming"]) for r in rows} \
        == {(5, 9, 0)}


@pytest.mark.parametrize("text", [BASE, FAR, "single", "a b a b a b"])
def test_fingerprint_is_signed_64bit(text):
    v = simhash64(text)
    assert -(1 << 63) <= v < (1 << 63)


def test_kernel_equals_jvm_shadow_including_empty_docs(spark, tmp_path):
    """The Arrow bit-vote kernel must be bit-identical to the
    oracle-mirrored JVM 64-counter form — on the corpus AND on the
    edge docs the JVM form's inner explode silently drops (empty /
    all-space / NULL text): the kernel must drop exactly the same
    set."""
    from ocr_hardsubx_spark.plans import dataset_queries as dq

    SF = "/root/testdata/sf0.001"
    kern = {r["doc_id"]: r["simhash64"]
            for r in dq.q_simhash(spark, SF).collect()}
    jvm = {r["doc_id"]: r["simhash64"]
           for r in dq.q_simhash_jvm_shadow(spark, SF).collect()}
    assert kern == jvm and len(kern) > 0

    rows = [(1, "hello world"), (2, ""), (3, "   "), (4, None),
            (5, "hello"), (6, "the the the")]
    d = str(tmp_path)
    (spark.createDataFrame(rows, "doc_id long, text string")
     .write.parquet(d + "/documents.parquet"))
    got = {r["doc_id"]: r["simhash64"]
           for r in dq.q_simhash(spark, d).collect()}
    want = {r["doc_id"]: r["simhash64"]
            for r in dq.q_simhash_jvm_shadow(spark, d).collect()}
    assert got == want
    assert set(got) == {1, 5, 6}          # 2/3/4 dropped on BOTH paths


def test_kernel_batch_ending_in_empty_docs(spark, tmp_path):
    """Round-6 ADVICE (high): a batch whose LAST rows are zero-token
    docs (empty / whitespace / NULL text) must not truncate the
    preceding real doc's vote segment.  The former np.minimum clip on
    reduceat starts created a spurious boundary at len-1 in exactly
    that case, silently dropping the last token's votes of the last
    real doc.  Pinned two ways: the raw Arrow kernel on the literal
    advisor repro batch, and end-to-end through Spark on a
    single-partition parquet with the empty doc as the final row."""
    from ocr_hardsubx_spark.plans import dataset_queries as dq

    # raw kernel, exact advisor batch: doc 1's fingerprint must match
    # the pure-Python mirror regardless of the trailing empty doc
    kern = dq._simhash_kernel_udf().func
    got = kern(pd.Series(["hello world foo", "bar baz qux quux", ""]))
    assert pd.isna(got.iloc[2])
    assert got.iloc[0] == simhash64("hello world foo")
    assert got.iloc[1] == simhash64("bar baz qux quux")

    # end-to-end: single-partition parquet, empty/NULL docs at the tail
    rows = [(1, "hello world foo"), (2, "bar baz qux quux"),
            (3, ""), (4, None)]
    d = str(tmp_path)
    (spark.createDataFrame(rows, "doc_id long, text string")
     .coalesce(1).write.parquet(d + "/documents.parquet"))
    got = {r["doc_id"]: r["simhash64"]
           for r in dq.q_simhash(spark, d).collect()}
    want = {r["doc_id"]: r["simhash64"]
            for r in dq.q_simhash_jvm_shadow(spark, d).collect()}
    assert got == want == {1: simhash64("hello world foo"),
                           2: simhash64("bar baz qux quux")}
