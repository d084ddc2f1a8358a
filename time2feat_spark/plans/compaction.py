"""Small-file compaction for tier tables.

LadderJob's salted, per-unit, incremental writes deliberately trade
file granularity for parallelism and resumability: a hot source writes
through `salt_k` tasks and every incremental run appends more files
into the same `(tier, window_day)` leaves. At 100 TB that is the
classic small-file problem — scan planning cost and open-file overhead
grow with file count, not data size. `compact_source` rewrites one
source partition tree so every leaf holds `files_per_partition` files
(grouped by the partition columns, salted within a leaf when >1), and
swaps the rewritten tree in with a directory rename.

Scale posture: the rewrite is ONE Spark job per source (repartition on
the partition columns routes each leaf's rows to one task, which the
dynamic partition writer turns into one file per leaf), not a job per
leaf. On an Iceberg deployment this operator is replaced by
`rewrite_data_files` (compaction with snapshot isolation); the
directory swap here is the parquet-on-filesystem equivalent and is safe
for a maintenance window, not for concurrent writers — the same
constraint plain-parquet compaction always has.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession, functions as F


def _parquet_files(root: str) -> list[str]:
    out = []
    for dirpath, _, files in os.walk(root):
        out.extend(
            os.path.join(dirpath, f)
            for f in files
            if f.endswith(".parquet")
        )
    return out


def compact_source(
    spark: SparkSession,
    out_root: str,
    source: str,
    files_per_partition: int = 1,
    salt_col: str = "doc_id",
) -> dict:
    """Compact `{out_root}/source={source}` (layout written by
    LadderJob: partitioned by tier, window_day). Returns
    {files_before, files_after, rows}. No-op (no rewrite) when the tree
    is already at or below the target file count."""
    path = f"{out_root}/source={source}"
    before = _parquet_files(path)
    df = spark.read.parquet(path)  # tier/window_day partition cols inferred
    n_leaves = df.select("tier", "window_day").distinct().count()
    target_files = n_leaves * files_per_partition
    if len(before) <= target_files:
        return {
            "files_before": len(before),
            "files_after": len(before),
            "rows": None,
        }
    keys = [F.col("tier"), F.col("window_day")]
    if files_per_partition > 1:
        keys.append(
            F.pmod(F.xxhash64(salt_col), F.lit(files_per_partition))
        )
    tmp = f"{out_root}/.compacting__source={source}"
    old = f"{out_root}/.old__source={source}"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    src_rows = df.count()
    (
        df.repartition(max(target_files, 1), *keys)
        .write.mode("overwrite")
        .partitionBy("tier", "window_day")
        .parquet(tmp)
    )
    # verify BEFORE touching the source: a silent row loss in the rewrite
    # (partition-inference drift, schema drift) must abort with the
    # original tree intact, never become permanent
    rows = spark.read.parquet(tmp).count()
    if rows != src_rows:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction rewrite of {path} produced {rows} rows, "
            f"source has {src_rows}; aborted, source left untouched"
        )
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except BaseException:
        # crash window between the two renames: restore the source so the
        # table is never left hidden under a dot-prefixed dir
        os.rename(old, path)
        raise
    shutil.rmtree(old)
    return {
        "files_before": len(before),
        "files_after": len(_parquet_files(path)),
        "rows": rows,
    }


def compact_all(
    spark: SparkSession,
    out_root: str,
    files_per_partition: int = 1,
    salt_col: str = "doc_id",
) -> dict[str, dict]:
    """Compact every `source=` partition under out_root."""
    results = {}
    for d in sorted(os.listdir(out_root)):
        if d.startswith("source="):
            results[d.split("=", 1)[1]] = compact_source(
                spark, out_root, d.split("=", 1)[1],
                files_per_partition, salt_col,
            )
    return results
