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


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--incremental", action="store_true")
    p.add_argument("--rows-per-task", type=int, default=200_000)
    p.add_argument("--max-units", type=int, default=None)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from time2feat_spark.plans.ladder_job import LadderJob

    spark = SparkSession.builder.appName("t2f-ladder").getOrCreate()
    job = LadderJob(
        spark, args.input, args.output, rows_per_task=args.rows_per_task
    )
    res = job.run(incremental=args.incremental, max_units=args.max_units)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
