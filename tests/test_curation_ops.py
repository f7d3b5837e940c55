"""Round-4 curation operators: bigram-LM perplexity, deterministic
stratified sampling, mixture planning — semantics pinned on hand-built
fixtures (the oracle gate covers the full corpus)."""

from __future__ import annotations

import hashlib

from ocr_hardsubx_spark.plans import dataset_queries as dq


def _docs_dir(spark, tmp_path, rows,
              schema="doc_id long, text string, lang string, "
                     "source string"):
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "sf")
    df.coalesce(1).write.mode("overwrite") \
        .parquet(out + "/documents.parquet")
    return out


def test_lm_scores_repetition_below_salad(spark, tmp_path):
    """A document built from the corpus's dominant bigram pattern is
    less surprising (lower avg neg log-prob) than a one-off word
    salad; single-token docs have no bigrams and are excluded."""
    common = "the cat sat on the mat"
    rows = (
        [(i, common, "en", "web") for i in range(8)]
        + [(100, "zyx wvu tsr qpo nml kji", "en", "web")]  # salad
        + [(101, "solo", "en", "web")]                     # no bigrams
    )
    out = _docs_dir(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in dq.q_lm_perplexity(spark, out).collect()}
    assert 101 not in got
    assert got[0]["avg_neg_logp"] < got[100]["avg_neg_logp"]
    assert got[0]["n_bigrams"] == 5
    # the 8 repeated docs all score identically (same bigrams)
    assert len({got[i]["avg_neg_logp"] for i in range(8)}) == 1


def test_stratified_sample_is_deterministic_and_rate_bound(spark,
                                                           tmp_path):
    rows = [(i, f"text {i}", "en" if i % 2 else "es", "web")
            for i in range(400)]
    out = _docs_dir(spark, tmp_path, rows)
    a = {r["doc_id"] for r in dq.q_stratified_sample(spark, out).collect()}
    b = {r["doc_id"] for r in dq.q_stratified_sample(spark, out).collect()}
    assert a == b                     # reruns agree exactly (no RNG)
    # the keep decision is recomputable from the row alone
    for r in dq.q_stratified_sample(spark, out).collect():
        h = int(hashlib.md5(str(r["doc_id"]).encode())
                .hexdigest()[:8], 16) % 1000
        assert h == r["bucket"] < r["rate_permille"]
    # en keeps everything (rate 1000); es keeps roughly a quarter
    en = [i for i in a if i % 2]
    es = [i for i in a if not i % 2]
    assert len(en) == 200
    assert 20 <= len(es) <= 90        # 200 docs at 250/1000 +- hash noise


def test_mixture_plan_hand_computed(spark, tmp_path):
    """web:news weights 6:2 over a 50k budget -> 30k:10k allocations,
    capped at availability; unknown source gets weight 0."""
    mk = lambda n: " ".join("w" for _ in range(n))  # noqa: E731
    rows = (
        [(1, mk(40000), "en", "web")]        # avail 40k < alloc 30k? no:
        + [(2, mk(5000), "en", "news")]      # news avail 5k < alloc 10k
        + [(3, mk(1000), "en", "mystery")]   # unknown source
    )
    out = _docs_dir(spark, tmp_path, rows)
    got = {r["source"]: r for r in dq.q_mixture_plan(spark, out).collect()}
    assert got["web"]["alloc_tokens"] == 30000       # 50k * 6/10
    assert got["web"]["rate_permille"] == 750        # 30k of 40k
    assert got["news"]["alloc_tokens"] == 5000       # capped at avail
    assert got["news"]["rate_permille"] == 1000
    assert got["mystery"]["weight"] == 0
    assert got["mystery"]["alloc_tokens"] == 0


def test_pack_plan_bins_and_overflow_semantics(spark, tmp_path):
    """Docs pack greedily in doc_id order per stream: bin = floor of
    the running total BEFORE the doc, so a doc straddling a boundary
    stays in (and overflows) its bin — documents are never split."""
    mk = lambda n: " ".join("w" for _ in range(n))  # noqa: E731
    W = dq.PACK_WINDOW_TOKENS
    rows = [
        (1, mk(1000), "en", "web"),
        (2, mk(1500), "en", "web"),     # starts at 1000 -> bin 0, runs long
        (3, mk(100), "en", "web"),      # starts at 2500 -> bin 1
        (10, mk(10), "de", "web"),      # independent stream
    ]
    out = _docs_dir(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in dq.q_pack_plan(spark, out).collect()}
    assert (got[1]["bin"], got[1]["offset_in_bin"]) == (0, 0)
    assert (got[2]["bin"], got[2]["offset_in_bin"]) == (0, 1000)
    assert got[3]["bin"] == 1 and got[3]["tokens_before"] == 2500
    assert got[3]["offset_in_bin"] == 2500 - W
    assert got[10]["bin"] == 0 and got[10]["tokens_before"] == 0


def test_pack_plan_global_two_phase_no_window_node(spark, tmp_path):
    """The global stream must NOT collapse to a single-partition window
    (the naive Window.orderBy shape): the executed plan has no Window
    node, the data stays multi-partition, and the cross-partition
    prefix continues exactly (a bin straddles the partition boundary)."""
    mk = lambda n: " ".join("w" for _ in range(n))  # noqa: E731
    rows = [(i, mk(500), "en", "web") for i in range(64)]
    out = _docs_dir(spark, tmp_path, rows)
    df = dq.q_pack_plan_global(spark, out)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert df.rdd.getNumPartitions() > 1
    got = {r["doc_id"]: r for r in df.collect()}
    # exact global prefix regardless of partitioning: doc i starts at
    # 500*i tokens -> bin floor(500*i/2048)
    for i in range(64):
        assert got[i]["tokens_before"] == 500 * i
        assert got[i]["bin"] == (500 * i) // dq.PACK_WINDOW_TOKENS
    assert len({r["bin"] for r in got.values()}) > 10  # many bins spanned


def test_hll_accuracy_and_merge_on_large_vocab(spark, tmp_path):
    """5000 distinct tokens (the synthetic corpus's 31-word vocab can't
    stress the sketch): estimate within the m=256 error envelope, and
    the sketch is MERGEABLE — registers of two half-corpora max-merge
    to exactly the full corpus's registers (the union law that makes
    HLL the 100 TB distinct-count pattern)."""
    from pyspark.sql import functions as F

    rows = [(i, " ".join(f"tok{j}" for j in range(i * 10, i * 10 + 10)),
             "en", "web") for i in range(500)]     # 5000 distinct tokens
    out = _docs_dir(spark, tmp_path, rows)
    got = dq.q_hll_distinct(spark, out).collect()[0]
    est, exact = got["estimate"], 5000
    assert abs(est - exact) / exact < 0.2          # ~3 sigma for m=256
    assert got["n_registers_hit"] == 256           # saturated, no linear path

    # mergeability: half-corpus register files max-merge to the full one
    def regs(pred):
        docs = spark.read.parquet(out + "/documents.parquet").where(pred)
        tok = (docs.select(F.explode(F.split("text", " ")).alias("w"))
               .where(F.col("w") != ""))
        h = F.conv(F.substring(F.md5("w"), 1, dq.HLL_HASH_HEX), 16, 10) \
             .cast("long")
        rest = F.shiftright(h, dq.HLL_P)
        rho = F.when(rest > 0, F.lit(45) - F.length(F.bin(rest))) \
               .otherwise(F.lit(45))
        return {r["register"]: r["m"]
                for r in tok.select(
                    F.pmod(h, F.lit(dq.HLL_M)).alias("register"),
                    rho.alias("rho"))
                .groupBy("register").agg(F.max("rho").alias("m"))
                .collect()}

    lo = regs(F.col("doc_id") < 250)
    hi = regs(F.col("doc_id") >= 250)
    full = regs(F.lit(True))
    merged = {k: max(lo.get(k, 0), hi.get(k, 0)) for k in set(lo) | set(hi)}
    assert merged == full


def test_unicode_tokens_hash_identically_across_engines(spark, tmp_path):
    """md5-keyed operators (HLL registers, sampling buckets, LM grams)
    depend on Spark and DuckDB hashing the SAME bytes for non-ASCII
    text: pin a unicode/emoji corpus through q_hll_distinct and
    q_lm_perplexity against the oracle directly."""
    import duckdb

    rows = [
        (1, "héllo wörld héllo naïve", "fr", "web"),
        (2, "日本語 トークン 日本語 テスト", "ja", "web"),
        (3, "emoji 🙂 mix 🙂 emoji test", "en", "web"),
        (4, "héllo wörld naïve encore", "fr", "web"),
    ]
    out = _docs_dir(spark, tmp_path, rows)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{out}/documents.parquet/*.parquet')")
    got = sorted(map(tuple, dq.q_hll_distinct(spark, out).collect()))
    exp = sorted(map(tuple,
                     con.execute(dq.q_hll_distinct_sql()).fetchall()))
    assert got == exp
    got = sorted(map(tuple, dq.q_lm_perplexity(spark, out).collect()))
    exp = sorted(map(tuple,
                     con.execute(dq.q_lm_perplexity_sql()).fetchall()))
    assert got == exp


def test_pack_plan_partitions_every_token_exactly_once(spark, tmp_path):
    """Conservation law: per stream, tokens_before of the k-th doc ==
    sum of earlier docs' n_tokens (no token lost or double-counted),
    for an adversarial mix of sizes including empty-ish docs."""
    import itertools

    sizes = [1, 2048, 3, 5000, 1, 1, 2047, 2049, 10]
    mk = lambda n: " ".join("w" for _ in range(n))  # noqa: E731
    rows = [(i, mk(n), "en", "web") for i, n in enumerate(sizes)]
    out = _docs_dir(spark, tmp_path, rows)
    got = sorted((r["doc_id"], r["n_tokens"], r["tokens_before"])
                 for r in dq.q_pack_plan(spark, out).collect())
    acc = 0
    for (_, n, before), want_n in zip(got, sizes):
        assert before == acc and n == want_n
        acc += n
    assert acc == sum(sizes)
    # the global two-phase form obeys the same law
    got_g = sorted((r["doc_id"], r["tokens_before"])
                   for r in dq.q_pack_plan_global(spark, out).collect())
    assert [b for _, b in got_g] == \
        [0] + list(itertools.accumulate(sizes))[:-1]
    # and the ASSEMBLED windows conserve tokens end to end: every
    # window is exactly full except the final partial one, total tokens
    # across windows equals the corpus total, and each doc's window
    # range is contiguous
    W = dq.PACK_WINDOW_TOKENS
    wins = sorted((r["window_id"], r) for r in
                  dq.q_pack_assemble(spark, out).collect())
    assert [w for w, _ in wins] == list(range(len(wins)))
    assert sum(r["n_tokens"] for _, r in wins) == sum(sizes)
    for w, r in wins[:-1]:
        assert r["n_tokens"] == W and r["waste"] == 0
    last = wins[-1][1]
    assert last["waste"] == W - last["n_tokens"] >= 0
    # doc 3 (5000 tokens, starts at 2052) spans windows 1..3 and is on
    # every roster in between
    spanning = [w for w, r in wins if "3" in r["doc_ids"].split(",")]
    assert spanning == list(range(spanning[0], spanning[-1] + 1))
    assert len(spanning) >= 3


def test_stratified_rates_are_monotone_in_the_dial(spark, tmp_path):
    """A stratum with a higher keep rate keeps a superset-sized sample
    of the SAME hash space: every doc kept at rate r is also kept at
    any higher rate (the determinism law that makes rate changes safe
    to reason about in production)."""
    rows = [(i, f"text {i}", "es", "web") for i in range(300)]
    out = _docs_dir(spark, tmp_path, rows)
    kept_low = {r["doc_id"]
                for r in dq.q_stratified_sample(spark, out).collect()}
    # re-dial es to 1000 permille and recompute
    orig = dict(dq.SAMPLE_RATES_PERMILLE)
    try:
        dq.SAMPLE_RATES_PERMILLE["es"] = 1000
        kept_high = {r["doc_id"]
                     for r in dq.q_stratified_sample(spark, out).collect()}
    finally:
        dq.SAMPLE_RATES_PERMILLE.clear()
        dq.SAMPLE_RATES_PERMILLE.update(orig)
    assert kept_low <= kept_high
    assert len(kept_high) == 300


def test_bm25_semantics_on_fixture(spark, tmp_path):
    """Hand-checkable BM25 behavior: a doc with more query-term mass
    (tf saturation notwithstanding) outranks one mention; docs without
    any query term never appear; rarer terms weigh more (idf)."""
    filler = " ".join(f"f{i}" for i in range(30))
    rows = [
        (1, f"spark query data {filler}", "en", "web"),  # all 3 terms
        (2, f"spark spark spark {filler}", "en", "web"),  # tf on one
        (3, f"query {filler}", "en", "web"),
        (4, filler, "en", "web"),                         # no terms
        (5, f"data {filler} {filler}", "en", "web"),      # long doc
    ]
    out = _docs_dir(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in dq.q_bm25_topk(spark, out).collect()}
    assert 4 not in got
    assert got[1]["n_matched_terms"] == 3
    assert got[1]["rank"] == 1                    # coverage beats tf
    assert got[1]["bm25"] > got[2]["bm25"] > 0
    # length normalization: the same single term in a longer doc scores
    # lower than in a shorter one
    assert got[3]["bm25"] > got[5]["bm25"]


def test_dedup_keep_list_keeps_exactly_one_per_cluster(spark, tmp_path):
    """Every cluster keeps exactly ONE doc — the longest member (ties
    to lowest id); reusing the unified-cluster fixture (reorder caught
    by simhash, edit by minhash) all three dup docs form one cluster
    with one keeper."""
    base = [f"w{i}" for i in range(20)]
    rows = [
        (1, " ".join(base), "en", "web"),
        (2, " ".join(reversed(base)), "en", "web"),
        (3, " ".join(base[:-1] + ["zz"]), "en", "web"),
        (50, " ".join(f"a{i}" for i in range(20)), "en", "web"),
    ]
    out = _docs_dir(spark, tmp_path, rows)
    got = dq.q_dedup_keep_list(spark, out).collect()
    by_cluster = {}
    for r in got:
        by_cluster.setdefault(r["cluster_rep"], []).append(r)
    assert len(by_cluster) == 1                   # one unified cluster
    members = by_cluster[1]
    assert {r["doc_id"] for r in members} == {1, 2, 3}
    keepers = [r["doc_id"] for r in members if r["keep"]]
    assert keepers == [1]                         # equal length, min id


def test_minhash_shingles_match_oracle_on_stray_spaces(spark, tmp_path):
    """Round-6 ADVICE (low): docs with doubled / leading / trailing
    spaces produce empty split-tokens.  Spark's concat_ws keeps them
    (stray edge spaces in the shingle) while the oracle's trim(...)
    strips them, so shingle md5s — and hence band minima — diverged
    cross-engine.  F.trim on the Spark shingle pins the two forms
    equal; this fixture is exactly the divergent shapes."""
    import duckdb

    rows = [
        (1, " leading space doc here", "en", "web"),
        (2, "trailing space doc here ", "en", "web"),
        (3, "double  space doc here", "en", "web"),
        (4, "a  ", "en", "web"),            # advisor repro: 'a '
        (5, " b c", "en", "web"),           # advisor repro: ' b c'
        (6, "normal three token doc", "en", "web"),
    ]
    out = _docs_dir(spark, tmp_path, rows)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{out}/documents.parquet/*.parquet')")
    got = sorted(map(tuple, dq.q_minhash_bands(spark, out).collect()))
    exp = sorted(map(tuple,
                     con.execute(dq.q_minhash_bands_sql()).fetchall()))
    assert got == exp
