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
