"""AQE skew-join handling: the runtime re-plan path SURVEY §4 O11 names
as the complement to salting — a hot join key is split by AQE without any
manual salt.  Thresholds are lowered to make the tiny local dataset look
skewed; restored afterwards."""

from __future__ import annotations

from pyspark.sql import functions as F

SKEW_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_hot_key_join(spark):
    old = {k: spark.conf.get(k, None) for k in SKEW_CONF}
    try:
        for k, v in SKEW_CONF.items():
            spark.conf.set(k, v)
        # 150k rows on ONE key vs a uniform right side: the classic
        # mega-host join a crawl pipeline hits
        left = spark.range(150_000).select(
            F.lit(0).alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string"))
             .alias("pay"))
        left = left.unionByName(
            spark.range(1, 65).select(
                F.col("id").alias("k"), F.lit("small").alias("pay")))
        right = spark.range(0, 65).select(
            F.col("id").alias("k"),
            F.concat(F.lit("dim-"), F.col("id").cast("string"))
             .alias("name"))
        joined = left.join(right, "k")
        # execute THIS plan (df.count() builds a separate aggregate plan
        # whose queryExecution would still be pre-adaptive)
        assert len(joined.collect()) == 150_000 + 64
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # AQE marked and split the hot partition
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _stopword_skewed_docs(spark, tmp_path, n_docs=800, n_pairs=40):
    """Corpus where every other token is 'the': half of all distinct
    (doc, bigram) rows share w1='the' — the 100 TB stop-word hot key."""
    docs = []
    for i in range(n_docs):
        toks = []
        for j in range(n_pairs):
            toks += ["the", f"w{i}_{j}"]
        docs.append((i, " ".join(toks)))
    sf = str(tmp_path)
    (spark.createDataFrame(docs, "doc_id long, text string")
     .repartition(4).write.parquet(sf + "/documents.parquet"))
    return sf


def _with_conf(spark, conf):
    import contextlib

    @contextlib.contextmanager
    def cm():
        old = {k: spark.conf.get(k, None) for k in conf}
        try:
            for k, v in conf.items():
                spark.conf.set(k, v)
            yield
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
    return cm()


def test_lm_perplexity_salted_join_splits_hot_unigram(spark, tmp_path):
    """q_lm_perplexity's unigram join cannot be split by AQE (the c1
    aggregate is join-colocated — see the structural test below), so
    the query salts it deterministically: the probe carries a doc-hash
    salt, c1 is replicated, 'the' lands on LM_JOIN_SALT reducers by
    construction — and because BOTH sides of the salted join are now
    plain ENSURE_REQUIREMENTS shuffles, AQE's skew split works again as
    the runtime backstop for residual intra-salt skew."""
    from ocr_hardsubx_spark.plans import dataset_queries as dq

    sf = _stopword_skewed_docs(spark, tmp_path)
    conf = {**SKEW_CONF,
            "spark.sql.adaptive.forceOptimizeSkewedJoin": "true"}
    with _with_conf(spark, conf):
        df = dq.q_lm_perplexity(spark, sf)
        rows = df.collect()              # execute THIS adaptive plan
        assert len(rows) == 800
        # 80 tokens -> 79 bigram occurrences per doc, weights carried
        assert all(r["n_bigrams"] == 79 for r in rows)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "_salt" in plan           # the deterministic split
        assert "skew=true" in plan, plan[:3000]   # the AQE backstop


def test_skew_split_needs_shuffles_on_both_sides(spark, tmp_path):
    """The structural finding behind the salt: OptimizeSkewedJoin only
    matches SMJs whose children are both ENSURE_REQUIREMENTS shuffles.
    A probe join against a just-aggregated table is join-colocated on
    the build side — no splittable shuffle there, so the hot partition
    stays whole even with forceOptimizeSkewedJoin.  Materializing the
    build side (the persisted-LM scoring architecture) or salting the
    join restores the pattern."""
    from pyspark.sql import functions as F

    left = spark.range(40_000).select(
        F.lit("the").alias("w1"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("pay"))
    left = left.unionByName(
        spark.range(64).select(
            F.concat(F.lit("w"), F.col("id").cast("string")).alias("w1"),
            F.lit("small").alias("pay")))
    conf = {**SKEW_CONF,
            "spark.sql.adaptive.forceOptimizeSkewedJoin": "true"}
    with _with_conf(spark, conf):
        # build side = inline aggregate, join-colocated: NO split
        agg = left.groupBy("w1").agg(F.count("*").alias("n1"))
        j1 = left.join(agg, "w1")
        assert len(j1.collect()) == 40_064
        p1 = j1._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in p1 and "skew=true" not in p1
        # build side materialized (persisted-LM scoring): split fires
        agg.write.parquet(str(tmp_path / "c1"))
        j2 = left.join(spark.read.parquet(str(tmp_path / "c1")), "w1")
        assert len(j2.collect()) == 40_064
        p2 = j2._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in p2 and "skew=true" in p2, p2[:3000]
