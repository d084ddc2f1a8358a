"""Pluggable table layer: Iceberg when a catalog is configured, partitioned
parquet otherwise (SURVEY.md §7.0 — no Iceberg runtime jar ships in this
sandbox, so the parquet backend carries the same interface and the
checkpoint manifest supplies the snapshot/lineage semantics an Iceberg
catalog would give natively).

The engine only needs four verbs: read a table (optionally pinned to a
snapshot), append, overwrite one partition idempotently, and fingerprint
the current snapshot.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..plans.checkpoint import snapshot_id


class TableIO:
    def read(self, spark: SparkSession, snapshot: str | None = None) -> DataFrame:
        raise NotImplementedError

    def append(self, df: DataFrame) -> None:
        raise NotImplementedError

    def overwrite_partition(self, df: DataFrame, partition: dict) -> None:
        raise NotImplementedError

    def snapshot(self) -> str:
        raise NotImplementedError


class ParquetTableIO(TableIO):
    """Partitioned-parquet backend. Partition dirs are the unit of
    idempotent overwrite (same contract Iceberg's overwritePartitions
    gives); snapshot = content fingerprint of the file listing."""

    def __init__(self, path: str, partition_cols: list[str] | None = None):
        self.path = path
        self.partition_cols = partition_cols or []

    def read(self, spark: SparkSession, snapshot: str | None = None) -> DataFrame:
        if snapshot is not None and snapshot != self.snapshot():
            raise ValueError(
                f"snapshot {snapshot} is not current ({self.snapshot()}); "
                "parquet backend keeps only the latest snapshot — pin reads "
                "via the checkpoint manifest instead"
            )
        return spark.read.option("basePath", self.path).parquet(self.path)

    def append(self, df: DataFrame) -> None:
        w = df.write.mode("append")
        if self.partition_cols:
            w = w.partitionBy(*self.partition_cols)
        w.parquet(self.path)

    def overwrite_partition(self, df: DataFrame, partition: dict) -> None:
        sub = "/".join(f"{k}={v}" for k, v in partition.items())
        drop = [c for c in partition if c in df.columns]
        df.drop(*drop).write.mode("overwrite").parquet(f"{self.path}/{sub}")

    def snapshot(self) -> str:
        if not os.path.exists(self.path):
            return "empty"
        return snapshot_id(self.path)


class IcebergTableIO(TableIO):
    """Iceberg backend: native snapshots, hidden partitioning
    (bucket(doc_id), days(window_start)), incremental reads between
    snapshot ids. Requires org.apache.iceberg:iceberg-spark-runtime on the
    classpath and a configured catalog — not available in this sandbox, so
    construction fails fast with the spark-submit recipe."""

    def __init__(self, table: str, spark: SparkSession | None = None):
        self.table = table
        self.spark = spark

    def read(self, spark: SparkSession, snapshot: str | None = None) -> DataFrame:
        r = spark.read
        if snapshot is not None:
            r = r.option("snapshot-id", snapshot)
        return r.table(self.table)

    def read_incremental(
        self, spark: SparkSession, start_snapshot: str, end_snapshot: str | None = None
    ) -> DataFrame:
        """Rows appended strictly after start_snapshot (Iceberg
        incremental read) — the native form of the manifest watermark."""
        r = spark.read.option("start-snapshot-id", start_snapshot)
        if end_snapshot is not None:
            r = r.option("end-snapshot-id", end_snapshot)
        return r.table(self.table)

    def append(self, df: DataFrame) -> None:
        df.writeTo(self.table).append()

    def overwrite_partition(self, df: DataFrame, partition: dict) -> None:
        df.writeTo(self.table).overwritePartitions()

    def snapshot(self) -> str:
        if self.spark is None:
            raise NotImplementedError(
                "requires an Iceberg catalog: spark-submit --packages "
                "org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:<ver> "
                "--conf spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog"
            )
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self.table}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return str(row.snapshot_id) if row else "empty"
