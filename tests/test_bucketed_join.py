"""Bucketed co-located joins: pay the partitioning once at ingest.

Two tables bucketed by the same key with the same bucket count join
WITHOUT any shuffle exchange; the identical join over plain parquet
costs two ShuffleExchanges.  This is the scale posture for every
host-/doc-keyed stage of the pipeline (SURVEY.md §4): at 100 TB the
bucketed layout turns each downstream join/agg from a corpus reshuffle
into a local merge.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_hardsubx_spark.sources.catalog import write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketdb(spark, tmp_path):
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")
    yield f"file://{tmp_path}/bucketdb"
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def _executed(df):
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_elides_the_shuffle(spark, bucketdb):
    """Broadcast is disabled for BOTH plans: at sf0.001 AQE would
    broadcast the tiny side (the other way to skip this shuffle), which
    would make the assertion vacuous — at 100 TB neither side
    broadcasts and bucketing is what remains.  The bucketed pair must
    sort-merge-join with ZERO exchanges; the raw-parquet pair costs
    hash-partitioning exchanges."""
    docs = spark.read.parquet(SF + "/documents.parquet")
    left = docs.select("doc_id", "source", "lang")
    right = docs.select("doc_id", F.length("text").alias("n_chars"))
    write_bucketed(left, "bucketdb.docs_meta", "doc_id", 4,
                   database_location=bucketdb)
    write_bucketed(right, "bucketdb.docs_len", "doc_id", 4,
                   database_location=bucketdb)

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (spark.table("bucketdb.docs_meta")
                  .join(spark.table("bucketdb.docs_len"), "doc_id")
                  .where(F.col("n_chars") > 0))
        plan = _executed(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert joined.count() == docs.count()

        # contrast: the same join over the raw parquet shuffles both
        plain = left.join(right, "doc_id").where(F.col("n_chars") > 0)
        assert "Exchange hashpartitioning" in _executed(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_bucketed_aggregation_is_exchange_free(spark, bucketdb):
    docs = spark.read.parquet(SF + "/documents.parquet")
    write_bucketed(docs.select("doc_id", "source", "lang"),
                   "bucketdb.docs_agg", "doc_id", 4,
                   database_location=bucketdb)
    agg = (spark.table("bucketdb.docs_agg")
           .groupBy("doc_id").agg(F.count("*").alias("n")))
    plan = _executed(agg)
    assert "Exchange hashpartitioning" not in plan, plan
    assert agg.where(F.col("n") != 1).count() == 0
