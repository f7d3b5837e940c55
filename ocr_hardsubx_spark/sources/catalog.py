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

Enabling the affirmative path (documented environmental blocker: the
sandbox has no network, so the jar cannot be vendored — verified by a
maven-central GET returning no route in round 5 and re-verified in
round 6: DNS for repo1.maven.org unresolvable, no ~/.ivy2 / ~/.m2
cache, and a filesystem-wide search finds no iceberg jar to commit):

* jar: ``org.apache.iceberg:iceberg-spark-runtime-4.1_2.13:<latest>``
  for this PySpark (4.1.x, Scala 2.13); for Spark 4.0 use
  ``iceberg-spark-runtime-4.0_2.13`` (Iceberg >= 1.9).  Ship it via
  ``spark.jars.packages`` (online) or drop it into ``$SPARK_HOME/jars``
  / ``spark.jars`` (air-gapped).
* confs: ``spark.sql.catalog.ice=org.apache.iceberg.spark.SparkCatalog``,
  ``spark.sql.catalog.ice.type=hadoop``,
  ``spark.sql.catalog.ice.warehouse=<path>`` (or ``type=rest`` + ``uri``
  for a REST catalog).
* with both present, tests/test_iceberg_gated.py's scan test lights up
  unchanged: ``spark.read.table`` + native ``warc_ts`` metadata pruning.
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


def write_bucketed(df: "DataFrame", table: str, key: str,
                   buckets: int, database_location: str | None = None
                   ) -> None:
    """Persist a table bucketed (and sorted) by `key` so every
    subsequent equi-join or aggregation on that key is CO-LOCATED: both
    sides land in matching buckets and Spark elides the shuffle
    exchange entirely (tests/test_bucketed_join.py asserts the
    executed plan has zero ShuffleExchange, vs. the SortMergeJoin +
    two Exchanges the same join costs un-bucketed).

    At 100 TB this is the difference between re-shuffling the corpus on
    every host-keyed stage and paying the partitioning ONCE at ingest:
    write documents bucketed by canonical host (or doc hash for dedup
    joins) and the whole downstream host-keyed pipeline — dedup,
    sessionize, domain census, host-rate joins — runs exchange-free.
    Bucket count rules of thumb: ~2-4x total executor cores, and sized
    so one bucket's rows fit an executor's memory at the target SF.

    `database_location` lets callers (and tests) route the managed
    table's files away from the default warehouse directory."""
    spark = df.sparkSession
    parts = table.split(".")
    # the database is the SECOND-TO-LAST part (catalog.db.tbl or db.tbl)
    db = parts[-2] if len(parts) >= 2 else None
    if database_location is not None and db is None:
        raise ValueError(
            f"database_location given but table {table!r} is unqualified "
            f"— the location can only bind to a database (use 'db.table')")
    if db and database_location is not None:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} "
                  f"LOCATION '{database_location}'")
    (df.write.mode("overwrite").format("parquet")
       .bucketBy(buckets, key).sortBy(key).saveAsTable(table))


JSONL_DOC_SCHEMA = ("url string, warc_ts string, html string, "
                    "text string, lang string")


def read_documents_jsonl(spark: "SparkSession", path: str) -> "DataFrame":
    """Crawl-interchange JSONL source: one JSON object per line with
    (url, warc_ts as ISO-8601 string, html as UTF-8 string, text, lang)
    — the common hand-off format when pages arrive from a non-parquet
    upstream (WARC extractors, API dumps).

    The schema is EXPLICIT (inference over JSON is a full data scan at
    100 TB and can silently widen types); timestamps parse from the ISO
    string and html re-encodes to the binary column the extraction
    stage expects, so downstream code sees the exact parquet-source
    schema.  Corrupt lines surface under Spark's default PERMISSIVE
    mode as null rows — filtered and countable by the caller via the
    null url; pass mode=FAILFAST semantics by validating counts."""
    raw = spark.read.schema(JSONL_DOC_SCHEMA).json(path)
    return raw.select(
        "url",
        F.to_timestamp("warc_ts").alias("warc_ts"),
        F.encode(F.coalesce(F.col("html"), F.lit("")), "UTF-8")
         .alias("html"),
        "text",
        "lang",
    )
