#!/usr/bin/env python
"""Per-query isolation harness for the optimization rounds (guide §1.4).

NOT the driver contract — ``bench.py`` is frozen for measurement.  This
file exists so individual queries can be timed (noop sink, N reps,
median+min) and their ``explain("formatted")`` captured without running
the whole headline suite.

Usage:
  python bench_extra.py --queries q_pdf_extract,q_pagerank --reps 3
  python bench_extra.py --explain q_pagerank --out plans/r07/q_pagerank_before.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ocr_hardsubx_spark.plans.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default="")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark(app_name="bench-extra", cores=CPUS)
    try:
        if args.explain:
            df = qs[args.explain](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            if args.out:
                os.makedirs(os.path.dirname(args.out), exist_ok=True)
                with open(args.out, "w") as f:
                    f.write(txt)
                print(f"wrote {args.out}")
            else:
                print(txt)
            return

        # same exclusions as bench.py: the IVF layout is ingest-time
        from ocr_hardsubx_spark.plans import dataset_queries as dq
        dq.ensure_ivf_layout(spark, SF_DIR)

        # same worker warm-up exclusion as bench.py
        def _noop(batches):
            from ocr_hardsubx_spark.operators import extract as _e  # noqa
            for b in batches:
                yield b

        (spark.range(CPUS * 4).repartition(CPUS * 4)
         .mapInPandas(_noop, schema="id long")
         .write.format("noop").mode("overwrite").save())

        names = [n for n in args.queries.split(",") if n]
        results = {}
        for name in names:
            walls = []
            for _ in range(args.reps):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.time()
                qs[name](spark, SF_DIR).write.format("noop") \
                    .mode("overwrite").save()
                walls.append(round(time.time() - t0, 3))
            results[name] = {"median": sorted(walls)[len(walls) // 2],
                             "min": min(walls), "all": walls}
            print(json.dumps({name: results[name]}), flush=True)
        print(json.dumps({"sf": SF_DIR, "results": results}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
