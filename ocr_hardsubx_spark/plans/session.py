"""SparkSession factory with the engine's pinned configuration.

All parallelism in the graft comes from Spark (the reference's
``parallel_for_`` is a serial stub — ``/root/reference/contours.c:475-479``);
these settings size the Arrow batches and shuffle partitions per
SURVEY.md §4 (O6, O11).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..config import ARROW_MAX_RECORDS_PER_BATCH, DEFAULT_SHUFFLE_PARTITIONS


def get_spark(app_name: str = "ocr-hardsubx-spark", cores: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(max(DEFAULT_SHUFFLE_PARTITIONS, cores)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Scan-parallelism floor (optimization guide §6): without it a
        # table whose BYTES fit one 128 MB split scans as ONE task no
        # matter how much per-row compute follows (the sandbox fact
        # tables are byte-light/CPU-heavy).  Scale-adaptive by
        # construction: split size = min(maxPartitionBytes,
        # totalBytes/minPartitionNum), so at production scale (splits
        # >> cores) the floor is inert and maxPartitionBytes governs.
        # Parquet caveat: a single-ROW-GROUP file still cannot split —
        # dataset_queries._tbl handles that case with an explicit
        # fan-out repartition.
        .config("spark.sql.files.minPartitionNum",
                os.environ.get("SPARK_GRAFT_MIN_PARTITION_NUM", str(cores)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(ARROW_MAX_RECORDS_PER_BATCH))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
