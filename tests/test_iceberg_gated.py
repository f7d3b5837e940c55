"""Affirmative Iceberg path, gated on runtime availability.

The sandbox ships no Iceberg jars, so the scan test SKIPs here — but it
lights up unchanged the moment the runtime image carries
iceberg-spark-runtime (round-2 verdict item 10).  It exercises the S1
affirmative path end to end: catalog-configured session ->
``spark.read.table`` via sources.catalog.read_documents -> native
metadata pruning visible in the scan plan.

The catalog is registered on the SHARED session via runtime
``spark.conf.set`` — Spark 3+ resolves ``spark.sql.catalog.*`` lazily at
first catalog reference, so no second session is needed.  (The first
version of this test built one with ``getOrCreate()``, which silently
returns the already-active shared session, and then ``stop()``ped it —
killing the SparkContext for every test that ran after it in the full
suite.  Never stop a session you may not own.)
"""

from __future__ import annotations

import pytest

from ocr_hardsubx_spark.sources.catalog import (
    iceberg_available,
    read_documents,
)

_CATALOG_CONFS = {
    "spark.sql.catalog.ice": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.ice.type": "hadoop",
}


def test_iceberg_detection_is_false_without_runtime(spark):
    """The shared session has no Iceberg catalog: feature detection must
    say so (this half of the gate ALWAYS runs)."""
    assert iceberg_available(spark) is False


def test_iceberg_detection_requires_the_jar_not_just_the_conf(spark):
    """Registering the catalog conf alone must NOT flip detection in the
    sandbox: the runtime class check is the second half of the gate."""
    try:
        for k, v in _CATALOG_CONFS.items():
            spark.conf.set(k, v)
        jar_present = True
        try:
            spark._jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.SparkCatalog")
        except Exception:
            jar_present = False
        assert iceberg_available(spark) is jar_present
    finally:
        for k in _CATALOG_CONFS:
            spark.conf.unset(k)


def test_iceberg_table_scan_and_pruning(spark, tmp_path):
    try:
        for k, v in _CATALOG_CONFS.items():
            spark.conf.set(k, v)
        spark.conf.set("spark.sql.catalog.ice.warehouse",
                       f"file://{tmp_path}/warehouse")
        if not iceberg_available(spark):
            pytest.skip("Iceberg runtime jar not on the classpath")
        spark.sql(
            "CREATE TABLE ice.db.documents (url STRING, warc_ts TIMESTAMP, "
            "html BINARY, text STRING, lang STRING) USING iceberg "
            "PARTITIONED BY (days(warc_ts))")
        try:
            spark.sql(
                "INSERT INTO ice.db.documents VALUES "
                "('https://a.example/1', TIMESTAMP '2025-01-01 01:00:00', "
                " CAST('x' AS BINARY), 'x', 'en'), "
                "('https://a.example/2', TIMESTAMP '2025-01-03 01:00:00', "
                " CAST('y' AS BINARY), 'y', 'en')")
            df = read_documents(spark, "ice.db.documents",
                                day_range=("2025-01-01", "2025-01-01"))
            assert df.count() == 1
            # native metadata pruning: the Iceberg scan reports a filter
            # on the partition transform, not a post-scan Filter over all
            # files
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "warc_ts" in plan
        finally:
            spark.sql("DROP TABLE IF EXISTS ice.db.documents")
    finally:
        for k in _CATALOG_CONFS:
            spark.conf.unset(k)
        spark.conf.unset("spark.sql.catalog.ice.warehouse")
