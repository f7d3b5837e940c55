#!/usr/bin/env python
"""spark-submit entrypoint for the extraction job.

Cluster usage (the north_rule deployment shape):

    python -c "from ocr_hardsubx_spark.plans.packaging import build_pyfiles_zip; \\
               print(build_pyfiles_zip())"
    spark-submit --py-files dist/ocr_hardsubx_spark.zip \\
        scripts/run_extract.py \\
        --input  s3a://bucket/crawl/documents \\
        --output s3a://bucket/crawl/extracted \\
        --from-day 2025-01-01 --to-day 2025-01-07 \\
        [--salt] [--partitions 4096]

Sandbox smoke (local mode, same code path):

    python scripts/run_extract.py --input data/fixtures/documents_part \\
        --output /tmp/extracted --cores 8

The job is resumable: re-running with the same --output processes only
input files absent from committed manifests (plans/pipeline.py).  URI
inputs (s3a://, hdfs://, file://) are listed via the Hadoop FileSystem
API; an --output is bound to one day-range policy (mismatched resumes
refuse rather than skip unprocessed days).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--from-day", default=None)
    ap.add_argument("--to-day", default=None)
    ap.add_argument("--salt", action="store_true",
                    help="salted repartition before extraction (skew path)")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--max-files", type=int, default=None)
    ap.add_argument("--cores", type=int, default=None,
                    help="local-mode cores (ignored under spark-submit)")
    ap.add_argument("--compact", action="store_true",
                    help="after the job, compact all live runs into one "
                         "size-targeted run (crash-safe supersede)")
    ap.add_argument("--target-file-mb", type=int, default=256)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from ocr_hardsubx_spark.plans.pipeline import run_extraction_job

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active  # spark-submit provided the session config
    else:
        from ocr_hardsubx_spark.plans.session import get_spark

        spark = get_spark(app_name="extract-job", cores=args.cores)

    day_range = None
    if args.from_day or args.to_day:
        day_range = (args.from_day or "0001-01-01",
                     args.to_day or "9999-12-31")
    res = run_extraction_job(
        spark, args.input, args.output,
        day_range=day_range, max_files=args.max_files,
        n_partitions=args.partitions, salt=args.salt,
    )
    if args.compact:
        from ocr_hardsubx_spark.plans.pipeline import compact_extracted

        res["compaction"] = compact_extracted(
            spark, args.output, target_file_mb=args.target_file_mb)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
