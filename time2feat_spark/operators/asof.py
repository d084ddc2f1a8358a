"""As-of join and session windows — time-series operators Spark lacks as
built-ins (SURVEY.md §2.3 notes the reference has none either; the engine
provides them as compositions of existing DataFrame ops, the preferred
strategy before reaching for UDFs).

asof_join: for each left row, the latest right row with
right.ts <= left.ts on the same key — implemented as a tagged union +
one window pass (`last(..., ignoreNulls)`), i.e. a single sort-based
shuffle on (key), no per-row Python, no range-join explosion. Ties at
equal timestamps resolve to the right row (side ordering), matching
DuckDB/kdb ASOF semantics.

sessionize: gap-based sessions (new session when the gap to the previous
event exceeds `gap`): lag + cumulative sum of session starts — the same
one-shuffle shape. Spark's native F.session_window covers the streaming
case; this batch formulation is exactly SQL-translatable for oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row plus the most recent right
    `value_cols` at or before its timestamp (NULL when none)."""
    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        *on, ts_col, *[F.col(c).alias(f"{c}{suffix}") for c in value_cols]
    ).withColumn("_side", F.lit(0))
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    for c in rt.columns:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None))
    unioned = lt.unionByName(rt.select(*lt.columns))
    # final sort keys make equal-(key, ts) right rows deterministic: the
    # as-of value is then the max value tuple among the tied rows, under
    # any partitioning/run (mirrored in oracle SQL via row_number DESC)
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col(ts_col).asc(),
            F.col("_side").asc(),
            *[F.col(f"{c}{suffix}").asc_nulls_first() for c in value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *[c for c in left.columns],
        "_side",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return filled.where(F.col("_side") == 1).drop("_side")


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: int,
    tie_break_cols: list[str] | None = None,
) -> DataFrame:
    """Assign gap-based session ids: a row starts a new session when it is
    more than `gap_seconds` after the previous row of its key. Adds
    `session_id` (0-based per key, in time order).

    `tie_break_cols` (e.g. a unique row id) pins the order of equal-ts
    rows so the cumulative session counter is deterministic under any
    partitioning — pass them whenever timestamps can collide."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *(tie_break_cols or []))
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = (
        prev.isNull()
        | (
            F.unix_millis(F.col(ts_col).cast("timestamp"))
            - F.unix_millis(prev.cast("timestamp"))
            > gap_seconds * 1000
        )
    ).cast("long")
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ) - 1,
    )


def detect_gaps(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    threshold_sec: int,
) -> DataFrame:
    """Heartbeat/gap monitoring: one row per interval where a series was
    silent for more than `threshold_sec` — the dual of sessionize (the
    session BOUNDARIES instead of the sessions). Output: key cols +
    gap_start_ms (last point before the silence), gap_end_ms (first
    point after), gap_ms. One window function over the (key, ts) sort —
    a single shuffle on the series key, whole-stage codegen after it."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    t_ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    prev_ms = F.lag(t_ms).over(w)
    return (
        df.select(*key_cols, ts_col)
        .withColumn("_prev_ms", prev_ms)
        .withColumn("_t_ms", t_ms)
        .where(
            F.col("_prev_ms").isNotNull()
            & (F.col("_t_ms") - F.col("_prev_ms") > threshold_sec * 1000)
        )
        .select(
            *key_cols,
            F.col("_prev_ms").alias("gap_start_ms"),
            F.col("_t_ms").alias("gap_end_ms"),
            (F.col("_t_ms") - F.col("_prev_ms")).alias("gap_ms"),
        )
    )


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ev_ts: str = "ts",
    iv_start: str = "start",
    iv_end: str = "end",
    key_cols: list[str] | None = None,
    bucket_ms: int | None = None,
) -> DataFrame:
    """Range join: every (event, interval) pair with
    `start <= event.ts < end` (and equal keys when `key_cols` given) —
    the join Spark otherwise executes as a BroadcastNestedLoopJoin
    (O(|events| * |intervals|), the classic range-join cliff).

    Strategy: bucketize time. Each interval is exploded to the coarse
    buckets it covers; events join on their single containing bucket
    plus the keys (an ordinary shuffle HASH join), then the exact range
    predicate filters within the bucket. An event's bucket is covered at
    most once per interval, so no dedup is needed. `bucket_ms` defaults
    to the longest interval (one cheap agg pass), bounding the explosion
    at <= 2 buckets per interval; pass a smaller bucket for mostly-short
    intervals with rare long outliers (explosion grows as
    len/bucket_ms, selectivity per bucket improves)."""
    key_cols = key_cols or []
    t_ev = F.unix_millis(F.col(ev_ts).cast("timestamp"))
    t_lo = F.unix_millis(F.col(iv_start).cast("timestamp"))
    t_hi = F.unix_millis(F.col(iv_end).cast("timestamp"))
    if bucket_ms is None:
        bucket_ms = int(
            intervals.agg(F.max(t_hi - t_lo)).first()[0] or 1
        )
        bucket_ms = max(bucket_ms, 1)
    # drop empty/inverted intervals FIRST: [start, end) with end <= start
    # matches nothing, and without this filter the bucket sequence would
    # be DESCENDING (CLAUDE.md: F.sequence(1, 0) = [1, 0], not empty) —
    # dirty end<start data would explode into O(span/bucket) junk rows
    iv = intervals.where(t_hi > t_lo).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(t_lo / bucket_ms), F.floor((t_hi - 1) / bucket_ms)
            )
        ),
    ).withColumns({"_lo_ms": t_lo, "_hi_ms": t_hi})
    ev = events.withColumns(
        {"_bucket": F.floor(t_ev / bucket_ms), "_ev_ms": t_ev}
    )
    joined = ev.join(iv, key_cols + ["_bucket"]).where(
        (F.col("_ev_ms") >= F.col("_lo_ms"))
        & (F.col("_ev_ms") < F.col("_hi_ms"))
    )
    return joined.drop("_bucket", "_ev_ms", "_lo_ms", "_hi_ms")
