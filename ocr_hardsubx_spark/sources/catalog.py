"""Documents source with Iceberg feature-detection and parquet fallback.

The north_rule targets an Iceberg table of Common-Crawl-style pages; the
sandbox has no Iceberg runtime, so the source layer feature-detects at
session time (SURVEY.md §7.6):

* Iceberg available (``spark.sql.catalog.*`` configured and the runtime
  jar on the classpath) -> ``spark.read.table(name)``; partition pruning
  on ``warc_ts`` is native table metadata.
* otherwise -> hive-layout parquet partitioned on ``warc_dt=date(warc_ts)``
  with identical pruning semantics (directory pruning, asserted via
  ``PartitionFilters`` in tests/test_pipeline_resume.py).

Either way the downstream job sees the same DataFrame schema.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: "SparkSession") -> bool:
    """True iff an Iceberg catalog is configured AND the runtime class
    loads (the jar must be on the session classpath).

    Catalog confs are read from the session's SQL conf (``SET``), not
    only the construction-time SparkConf: Spark 3+ resolves
    ``spark.sql.catalog.*`` lazily at first catalog reference, so a
    catalog registered at runtime via ``spark.conf.set`` is just as
    usable — and a test can gate on the jar without building (or worse,
    ``getOrCreate()``-ing and stopping) a second session."""
    confs = [(r.key, r.value or "") for r in spark.sql("SET").collect()]
    confs += spark.sparkContext.getConf().getAll()
    has_catalog = any(
        k.startswith("spark.sql.catalog.") and "iceberg" in v.lower()
        for k, v in confs
    )
    if not has_catalog:
        return False
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_documents(spark: "SparkSession", source: str,
                   day_range: tuple[str, str] | None = None) -> "DataFrame":
    """Load the documents table from an Iceberg table name or a parquet
    path, applying warc_ts partition pruning when a day range is given."""
    if "/" not in source and iceberg_available(spark):
        df = spark.read.table(source)
        if day_range is not None:
            df = df.where(
                F.col("warc_ts").between(
                    f"{day_range[0]} 00:00:00", f"{day_range[1]} 23:59:59"))
        return df
    df = spark.read.parquet(source)
    if day_range is not None:
        if "warc_dt" in df.columns:  # hive layout: directory-level pruning
            df = df.where(F.col("warc_dt").between(*day_range))
        else:
            df = df.where(
                F.to_date(F.col("warc_ts")).between(*day_range))
    return df
