"""SparkSession factory with the engine's standard configuration.

Scale posture (SURVEY.md §4): AQE on (runtime coalescing + skew-join
splitting), Arrow on with a batch size tuned for array columns, UTC
session timezone so window arithmetic is timezone-free, and shuffle
partitions sized for the local harness (overridable for a real cluster
via normal --conf flags; nothing here hard-codes local mode for the
engine itself).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # token arrays average ~4 KB; 1024 rows/batch keeps each kernel's padded
    # window matrices ~100-150 MB — larger batches (e.g. one 7500-doc split)
    # allocate GB-sized temporaries that blow caches and halve throughput
    "spark.sql.execution.arrow.maxRecordsPerBatch": "1024",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.driver.memory": "8g",
}


def get_spark(app: str = "time2feat_spark", master: str | None = None,
              extra: dict | None = None) -> SparkSession:
    b = SparkSession.builder.appName(app)
    master = master or os.environ.get("SPARK_GRAFT_MASTER")
    if master:
        b = b.master(master)
    elif not os.environ.get("SPARK_CONNECT_MODE_ENABLED"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        b = b.master(f"local[{cpus}]")
    conf = dict(DEFAULT_CONF)
    if extra:
        conf.update(extra)
    for k, v in conf.items():
        b = b.config(k, v)
    return b.getOrCreate()
