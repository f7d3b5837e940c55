#!/usr/bin/env python
"""spark-submit entrypoint for the curation job: rule gauntlet ->
near-dedup -> trained quality cut -> deterministic shard layout ->
committed training-ready dataset.

Cluster usage (same deployment shape as the extraction job):

    spark-submit --py-files dist/ocr_hardsubx_spark.zip \\
        scripts/run_curation.py \\
        --input  s3a://bucket/crawl/sf_dir \\
        --output s3a://bucket/crawl/curated \\
        [--shards 1024]

Sandbox smoke (local mode, same code path):

    python scripts/run_curation.py --input /root/testdata/sf0.001 \\
        --output /tmp/curated --cores 8

Re-running against the same input snapshot is a committed-run no-op
(every decision is a pure function of the row); a torn run (data dir
without a manifest) is invisible to readers.  Prints one JSON summary
line with per-stage doc/token accounting.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="directory holding documents.parquet (+ the "
                         "embeddings table if near-dedup should see it)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--shards", type=int, default=None)
    ap.add_argument("--cores", type=int, default=None,
                    help="local-mode cores (ignored under spark-submit)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from ocr_hardsubx_spark.plans import dataset_queries as dq
    from ocr_hardsubx_spark.plans.curation import run_curation_job

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from ocr_hardsubx_spark.plans.session import get_spark

        spark = get_spark(cores=args.cores or 8)
    from ocr_hardsubx_spark.plans.packaging import ensure_workers_can_import

    ensure_workers_can_import(spark)
    summary = run_curation_job(
        spark, args.input, args.output,
        n_shards=args.shards or dq.N_SHARDS)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
