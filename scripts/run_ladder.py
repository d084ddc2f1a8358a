#!/usr/bin/env python
"""Cluster entry point for the resumable tier-ladder job.

Usage (north_rule launch mode):

  zip -r t2f_spark.zip time2feat_spark
  spark-submit --py-files t2f_spark.zip scripts/run_ladder.py \
      --input  s3://bucket/sequences \
      --output s3://bucket/rollup \
      [--incremental] [--rows-per-task 200000]

On a real cluster pass the usual --master/--num-executors/--conf flags;
the job itself is agnostic (no local-mode assumptions). Re-running after
a failure resumes from the checkpoint manifest; --incremental processes
only rows past each unit's watermark.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# local runs: the package sits next to scripts/; on a cluster
# --py-files t2f_spark.zip makes this a no-op
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--incremental", action="store_true")
    p.add_argument("--rows-per-task", type=int, default=200_000)
    p.add_argument("--max-units", type=int, default=None)
    p.add_argument(
        "--retention",
        default=None,
        help="per-tier max-age days as tier=days[,tier=days...]; 'forever' "
        "keeps a tier indefinitely (e.g. raw=7,1m=90,1h=730,1d=forever). "
        "Enforced after the run as pure window_day partition drops.",
    )
    p.add_argument(
        "--compact",
        action="store_true",
        help="after the run (and retention), rewrite each source's "
        "(tier, window_day) leaves to one file each — the small-file "
        "maintenance pass for salted/incremental writes (on Iceberg use "
        "rewrite_data_files instead).",
    )
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from time2feat_spark.plans.ladder_job import LadderJob

    spark = SparkSession.builder.appName("t2f-ladder").getOrCreate()
    job = LadderJob(
        spark, args.input, args.output, rows_per_task=args.rows_per_task
    )
    res = job.run(incremental=args.incremental, max_units=args.max_units)
    if args.retention:
        import time

        from time2feat_spark.plans.retention import (
            RetentionPolicy,
            enforce_retention,
        )

        ages: dict = {}
        for part in args.retention.split(","):
            tier, days = part.split("=")
            ages[tier] = None if days == "forever" else int(days)
        res["retention"] = enforce_retention(
            args.output, RetentionPolicy(ages), int(time.time() * 1000)
        )
    if args.compact:
        from time2feat_spark.plans.compaction import compact_all

        res["compaction"] = compact_all(spark, args.output)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
