"""Tier-ladder rollup operator (raw -> 1m -> 1h -> 1d).

The engine's workhorse (SURVEY.md §2.10, §7). Two input shapes:

* ``rollup_sequences`` — the canonical token table
  (doc_id, tokens:array<int32>, n_tok, source); token position k has the
  implicit timestamp ``t0 + k*tick``. Because every row is a whole series,
  this path is **shuffle-free**: a single ``mapInPandas`` slices each doc's
  array into nested tier windows and emits all tiers in one pass over the
  raw data (the reference computes everything from one full-series pass too,
  /root/reference/t2f/extraction/extractor.py:108-126 — here projected onto
  nested tumbling windows, SURVEY.md §7.4).

* ``rollup_points`` — long/event shape (key, ts, value), e.g. the events
  table. Points of one series must be co-located per day-chunk, so this
  path shuffles once on ``(key, 1d-chunk)`` and runs the same kernels via
  ``applyInPandas``. Chunking by the coarsest tier bounds group size (skew
  relief) without splitting any window across groups.

Determinism (SURVEY.md §7.5): all statistics come from
``kernels.window_stats`` on matrices padded to *power-of-two width buckets*
— a window of n points is always computed in a matrix of width
next_pow2(n), regardless of which batch/partition it lands in, so float
reduction trees are fixed and results are bit-identical under any
parallelism. The single-threaded test oracle calls the same functions.

No per-row Python anywhere: batches are processed with vectorized numpy,
Gorilla blocks are bit-packed globally per batch (functions/gorilla.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.kernels import ROLLUP_FEATURES, window_stats
from ..functions.gorilla import encode_ts_blocks, encode_val_blocks

DEFAULT_TIERS = [("1m", 60), ("1h", 3600), ("1d", 86400)]
T0_MS = 1704067200000  # 2024-01-01T00:00:00Z


@dataclass
class RollupConfig:
    tiers: list[tuple[str, int]] = field(default_factory=lambda: list(DEFAULT_TIERS))
    t0_ms: int = T0_MS
    tick_ms: int = 1000
    features: list[str] = field(default_factory=lambda: list(ROLLUP_FEATURES))
    compress: bool = True
    include_raw: bool = True  # emit a `raw` tier: per-series Gorilla blocks
    # points path only: ("linear"|"locf", grid step ms) resample before windowing
    gapfill: tuple[str, int] | None = None


def _next_pow2(x: np.ndarray) -> np.ndarray:
    return np.power(2, np.ceil(np.log2(np.maximum(x, 1))).astype(np.int64))


#: row-block budget for one padded matrix inside stats_ragged (bytes).
#: The multi-feature pass re-reads the matrix (and feature temporaries)
#: ~dozens of times; blocking windows so each matrix is ~2 MB keeps that
#: traffic cache-resident instead of streaming a 10-100 MB matrix from
#: DRAM per feature — measured 15% single-threaded, more under the
#: 32-worker DRAM contention this box saturates at (CLAUDE.md).
#: Values are UNCHANGED by construction: every window's statistics
#: depend only on its own (pow2-padded) row, so splitting the rows of a
#: bucket into blocks leaves each per-window reduction tree identical
#: (asserted bit-for-bit in test_kernels.py::test_stats_ragged_blocking).
_STATS_BLOCK_BYTES = 2 << 20


def stats_ragged(
    flat: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    features: list[str],
) -> dict[str, np.ndarray]:
    """window_stats over ragged windows, batch-invariant via pow2 buckets."""
    counts = (ends - starts).astype(np.int64)
    k = len(counts)
    out: dict[str, np.ndarray] | None = None
    if k == 0:
        names = ["count", "sum", "min", "max", "mean"] + list(features)
        return {nm: np.empty(0) for nm in names}
    buckets = _next_pow2(counts)
    for b in np.unique(buckets):
        sel_all = np.nonzero(buckets == b)[0]
        w = int(b)
        col = np.arange(w)
        rows = max(256, _STATS_BLOCK_BYTES // (8 * w))
        for off in range(0, len(sel_all), rows):
            sel = sel_all[off:off + rows]
            idx = starts[sel][:, None] + col[None, :]
            if (counts[sel] == w).all():
                # full windows: plain gather, no padding mask needed
                mat = flat[idx].astype(np.float64, copy=False)
            else:
                mask = col[None, :] < counts[sel][:, None]
                mat = flat[np.where(mask, idx, 0)].astype(
                    np.float64, copy=False
                )
                mat = np.where(mask, mat, np.nan)
            st = window_stats(mat, counts[sel], features)
            if out is None:
                out = {nm: np.empty(k, dtype=v.dtype) for nm, v in st.items()}
            for nm, v in st.items():
                out[nm][sel] = v
    assert out is not None
    return out


# ---------------------------------------------------------------- sequences

def rollup_sequences_pdf(pdf: pd.DataFrame, cfg: RollupConfig) -> pd.DataFrame:
    """Roll one pandas batch of sequence rows into all tiers (flat columns).

    Shared verbatim by the Spark path (inside mapInPandas) and the
    single-threaded oracle — that sharing is what makes tier outputs exactly
    partition-invariant.
    """
    n_docs = len(pdf)
    if n_docs == 0:
        return _empty_flat(cfg)
    n_tok = pdf["n_tok"].to_numpy().astype(np.int64)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    flat = np.concatenate([np.asarray(t) for t in pdf["tokens"]]).astype(
        np.float64, copy=False
    )
    total = int(offsets[-1])
    pos_in_doc = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], n_tok)
    ts_flat = cfg.t0_ms + pos_in_doc * cfg.tick_ms

    frames = []
    doc_ids = pdf["doc_id"].to_numpy()
    sources = pdf["source"].to_numpy()

    if cfg.include_raw:
        frames.append(
            _raw_tier_frame(doc_ids, sources, n_tok, offsets, ts_flat, flat, cfg)
        )

    for tier_name, tier_sec in cfg.tiers:
        tt = tier_sec * 1000 // cfg.tick_ms  # window width in ticks
        nw = (n_tok + tt - 1) // tt
        nw_off = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(nw, out=nw_off[1:])
        k = int(nw_off[-1])
        doc_of_w = np.repeat(np.arange(n_docs), nw)
        j = np.arange(k, dtype=np.int64) - np.repeat(nw_off[:-1], nw)
        w_starts = offsets[:-1][doc_of_w] + j * tt
        w_ends = np.minimum(w_starts + tt, offsets[1:][doc_of_w])

        st = stats_ragged(flat, w_starts, w_ends, cfg.features)
        res = {
            "source": sources[doc_of_w],
            "doc_id": doc_ids[doc_of_w],
            "tier": np.full(k, tier_name, dtype=object),
            "window_start_ms": cfg.t0_ms + j * tt * cfg.tick_ms,
            "count": st["count"].astype(np.int64),
        }
        for nm in ("sum", "min", "max", "mean"):
            res[nm] = st[nm]
        for nm in cfg.features:
            res[f"feat_{nm}"] = st[nm]
        if cfg.compress:
            # windows tile each doc contiguously and docs are flat-contiguous,
            # so block offsets are just the window starts + final end
            boffs = np.append(w_starts, total)
            res["ts_gorilla"] = encode_ts_blocks(ts_flat, boffs)
            res["val_gorilla"] = encode_val_blocks(flat, boffs)
        else:
            res["ts_gorilla"] = None
            res["val_gorilla"] = None
        res["fill_method"] = np.full(k, "none", dtype=object)
        frames.append(pd.DataFrame(res))
    return pd.concat(frames, ignore_index=True)


def _raw_tier_frame(doc_ids, sources, n_tok, offsets, ts_flat, flat, cfg):
    n_docs = len(doc_ids)
    if cfg.compress:
        ts_blocks = encode_ts_blocks(ts_flat, offsets)
        val_blocks = encode_val_blocks(flat, offsets)
    else:
        ts_blocks = [None] * n_docs
        val_blocks = [None] * n_docs
    base = {
        "source": sources,
        "doc_id": doc_ids,
        "tier": np.full(n_docs, "raw", dtype=object),
        "window_start_ms": np.full(n_docs, cfg.t0_ms, dtype=np.int64),
        "count": n_tok,
        "sum": np.full(n_docs, np.nan),
        "min": np.full(n_docs, np.nan),
        "max": np.full(n_docs, np.nan),
        "mean": np.full(n_docs, np.nan),
    }
    for nm in cfg.features:
        base[f"feat_{nm}"] = np.full(n_docs, np.nan)
    base["ts_gorilla"] = ts_blocks
    base["val_gorilla"] = val_blocks
    base["fill_method"] = np.full(n_docs, "none", dtype=object)
    return pd.DataFrame(base)


def flat_schema(cfg: RollupConfig) -> StructType:
    fields = [
        StructField("source", StringType()),
        StructField("doc_id", StringType()),
        StructField("tier", StringType()),
        StructField("window_start_ms", LongType()),
        StructField("count", LongType()),
        StructField("sum", DoubleType()),
        StructField("min", DoubleType()),
        StructField("max", DoubleType()),
        StructField("mean", DoubleType()),
    ]
    fields += [StructField(f"feat_{nm}", DoubleType()) for nm in cfg.features]
    fields += [
        StructField("ts_gorilla", BinaryType()),
        StructField("val_gorilla", BinaryType()),
        StructField("fill_method", StringType()),
    ]
    return StructType(fields)


def _empty_flat(cfg: RollupConfig) -> pd.DataFrame:
    cols = [f.name for f in flat_schema(cfg)]
    return pd.DataFrame({c: [] for c in cols})


def rollup_sequences(df: DataFrame, cfg: RollupConfig | None = None) -> DataFrame:
    """Shuffle-free tier-ladder rollup of the sequences table.

    Returns the flat (un-nested) tier frame; use ``assemble`` to get the
    FIXTURES.md F4 schema with the `feat` struct and timestamp column.
    """
    cfg = cfg or RollupConfig()
    schema = flat_schema(cfg)

    def run(batches):
        for pdf in batches:
            if len(pdf):
                yield rollup_sequences_pdf(pdf, cfg)

    return df.mapInPandas(run, schema)


def assemble(flat_df: DataFrame, cfg: RollupConfig | None = None) -> DataFrame:
    """Flat tier frame -> FIXTURES.md F4 schema (feat struct + timestamp)."""
    cfg = cfg or RollupConfig()
    feat = F.struct(
        *[F.col(f"feat_{nm}").alias(nm) for nm in cfg.features]
    ).alias("feat")
    return flat_df.select(
        "source",
        "doc_id",
        "tier",
        F.timestamp_millis(F.col("window_start_ms")).alias("window_start"),
        "count",
        "sum",
        "min",
        "max",
        "mean",
        feat,
        "ts_gorilla",
        "val_gorilla",
        "fill_method",
    )


def tier_points(
    tier_df: DataFrame,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Decode a (flat) tier frame's Gorilla blocks back into points —
    the read path of the compressed tier tables. Uses the batched
    SIMD-across-blocks decoders (functions/gorilla.py): one vectorized
    step per value index advances EVERY block in the Arrow batch, so
    decode cost is O(points) numpy work, not per-bit Python.
    Output: key cols + tier + (ts_ms, value) per point."""
    key_cols = key_cols if key_cols is not None else ["doc_id"]
    from ..functions.gorilla import decode_ts_blocks, decode_val_blocks

    sel = tier_df.where(
        F.col("ts_gorilla").isNotNull() & F.col("val_gorilla").isNotNull()
    ).select(*key_cols, "tier", "count", "ts_gorilla", "val_gorilla")
    fields = [tier_df.schema[c] for c in key_cols] + [
        StructField("tier", StringType()),
        StructField("ts_ms", LongType()),
        StructField("value", DoubleType()),
    ]
    schema = StructType(fields)

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            counts = pdf["count"].to_numpy().astype(np.int64)
            mt = decode_ts_blocks(
                [bytes(b) for b in pdf["ts_gorilla"]], counts
            )
            mv = decode_val_blocks(
                [bytes(b) for b in pdf["val_gorilla"]], counts
            )
            row_of = np.repeat(np.arange(len(pdf)), counts)
            offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
            j = np.arange(int(counts.sum())) - np.repeat(offs, counts)
            res = {c: pdf[c].to_numpy()[row_of] for c in key_cols}
            res["tier"] = pdf["tier"].to_numpy()[row_of]
            res["ts_ms"] = mt[row_of, j]
            res["value"] = mv[row_of, j]
            yield pd.DataFrame(res)

    return sel.mapInPandas(run, schema)


# ------------------------------------------------------------------- points

def rollup_points_pdf(
    pdf: pd.DataFrame,
    cfg: RollupConfig,
    key_cols: list[str],
    ts_col: str,
    val_col: str,
) -> pd.DataFrame:
    """Roll MANY (key, chunk) groups at once — one vectorized pass over a
    whole partition (no per-group Python dispatch). Points are sorted by
    (group, ts, value); every tier's windows are contiguous slices of the
    sorted flat arrays, so the same stats_ragged/gorilla machinery as the
    sequences path applies.

    Requires a `_chunk` column (coarsest-tier id) so groups co-located by
    the repartition are whole; rows of one (key, _chunk) must all be
    present (guaranteed by rollup_points's repartition)."""
    if len(pdf) == 0:
        return _empty_points_flat(cfg, key_cols)

    ts_raw = pdf[ts_col].to_numpy()
    if np.issubdtype(ts_raw.dtype, np.datetime64):
        ts_ms = ts_raw.astype("datetime64[ms]").astype(np.int64)
    else:
        ts_ms = ts_raw.astype(np.int64)
    vals = pdf[val_col].to_numpy().astype(np.float64, copy=False)
    grp = pdf.groupby(key_cols, sort=False).ngroup().to_numpy()

    # deterministic order even under duplicate timestamps: (grp, ts, value)
    order = np.lexsort((vals, ts_ms, grp))
    grp, ts_ms, vals = grp[order], ts_ms[order], vals[order]
    key_row = order  # row index carrying the key columns of each point

    fill_method = "none"
    if cfg.gapfill is not None:
        from ..functions.gapfill import gapfill_grid

        fill_method, step_ms = cfg.gapfill
        gb = np.nonzero(np.diff(grp))[0] + 1
        g_starts = np.concatenate(([0], gb))
        g_ends = np.concatenate((gb, [len(grp)]))
        parts_t, parts_v, parts_g, parts_r = [], [], [], []
        for s, e in zip(g_starts, g_ends):
            gt, gv = gapfill_grid(ts_ms[s:e], vals[s:e], step_ms, fill_method)
            if len(gt):
                parts_t.append(gt)
                parts_v.append(gv)
                parts_g.append(np.full(len(gt), grp[s]))
                parts_r.append(np.full(len(gt), key_row[s]))
        if not parts_t:
            return _empty_points_flat(cfg, key_cols)
        ts_ms = np.concatenate(parts_t)
        vals = np.concatenate(parts_v)
        grp = np.concatenate(parts_g)
        key_row = np.concatenate(parts_r)

    n = len(vals)
    frames = []
    for tier_name, tier_sec in cfg.tiers:
        ms = tier_sec * 1000
        wid = ts_ms // ms
        change = (np.diff(grp) != 0) | (np.diff(wid) != 0)
        boundaries = np.nonzero(change)[0] + 1
        w_starts = np.concatenate(([0], boundaries))
        w_ends = np.concatenate((boundaries, [n]))
        st = stats_ragged(vals, w_starts, w_ends, cfg.features)
        k = len(w_starts)
        res = {
            c: pdf[c].to_numpy()[key_row[w_starts]] for c in key_cols
        }
        res["tier"] = np.full(k, tier_name, dtype=object)
        res["window_start_ms"] = wid[w_starts] * ms
        res["count"] = st["count"].astype(np.int64)
        for nm in ("sum", "min", "max", "mean"):
            res[nm] = st[nm]
        for nm in cfg.features:
            res[f"feat_{nm}"] = st[nm]
        if cfg.compress:
            boffs = np.append(w_starts, n)
            res["ts_gorilla"] = encode_ts_blocks(ts_ms, boffs)
            res["val_gorilla"] = encode_val_blocks(vals, boffs)
        else:
            res["ts_gorilla"] = None
            res["val_gorilla"] = None
        res["fill_method"] = np.full(k, fill_method, dtype=object)
        frames.append(pd.DataFrame(res))
    return pd.concat(frames, ignore_index=True)


def points_flat_schema(cfg: RollupConfig, key_fields: list[StructField]) -> StructType:
    fields = list(key_fields) + [
        StructField("tier", StringType()),
        StructField("window_start_ms", LongType()),
        StructField("count", LongType()),
        StructField("sum", DoubleType()),
        StructField("min", DoubleType()),
        StructField("max", DoubleType()),
        StructField("mean", DoubleType()),
    ]
    fields += [StructField(f"feat_{nm}", DoubleType()) for nm in cfg.features]
    fields += [
        StructField("ts_gorilla", BinaryType()),
        StructField("val_gorilla", BinaryType()),
        StructField("fill_method", StringType()),
    ]
    return StructType(fields)


def _empty_points_flat(cfg: RollupConfig, key_cols: list[str]) -> pd.DataFrame:
    names = key_cols + [
        "tier", "window_start_ms", "count", "sum", "min", "max", "mean",
    ] + [f"feat_{nm}" for nm in cfg.features] + [
        "ts_gorilla", "val_gorilla", "fill_method",
    ]
    return pd.DataFrame({c: [] for c in names})


def rollup_points(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    val_col: str,
    cfg: RollupConfig | None = None,
    num_partitions: int | None = None,
    bytes_per_task: int = 256 << 20,
    flush_rows: int = 65_536,
) -> DataFrame:
    """Tier-ladder rollup over long-format points.

    One shuffle on (key, coarsest-tier chunk): chunking bounds the data
    any task must hold for a hot key (skew relief) while windows of every
    tier nest inside the chunk, so holistic stats stay exact.

    Scale posture (100 TB): the shuffle partition count is sized from the
    optimizer's scan-size statistics (`bytes_per_task`, no extra pass —
    file-listing stats Catalyst already has) rather than the static
    `spark.sql.shuffle.partitions`, and the kernel stage streams — rows
    are sorted within partitions by group key, so completed (key, chunk)
    groups flush as soon as a later group appears in the Arrow stream.
    Peak task memory is O(one chunk group + flush buffer), NOT O(whole
    partition), so a 100x data growth widens the shuffle instead of
    OOMing the executor. Tier values stay bit-identical regardless of
    which flush a group lands in (pow2-bucket kernels, SURVEY.md §7.5).
    """
    cfg = cfg or RollupConfig(include_raw=False)
    coarsest_ms = max(sec for _, sec in cfg.tiers) * 1000
    key_fields = [df.schema[c] for c in key_cols]
    schema = points_flat_schema(cfg, key_fields)

    # project FIRST: only the grouping keys, timestamp, and value reach
    # the scan/shuffle (without this the exchange would carry every
    # column of the source — e.g. events.props — through the shuffle)
    df = df.select(*key_cols, ts_col, val_col)
    # null/NaN points carry no information for any statistic — drop them
    # scan-side (predicate pushdown) so kernels see only real samples
    df = df.where(
        F.col(ts_col).isNotNull()
        & F.col(val_col).isNotNull()
        & ~F.isnan(F.col(val_col).cast("double"))
    )
    # cast handles TIMESTAMP_NTZ inputs; session TZ is UTC so the instant
    # is the naive wall time, matching DuckDB's naive timestamps.
    # F.floor (not a truncating cast): floors toward -inf like the
    # kernel-side `ts_ms // ms` window ids, so pre-1970 timestamps can't
    # straddle two chunk groups and split a window.
    chunked = df.withColumn(
        "_chunk",
        F.floor(
            F.unix_millis(F.col(ts_col).cast("timestamp")) / F.lit(coarsest_ms)
        ).cast("long"),
    )
    if num_partitions is None:
        default_p = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        try:
            size_bytes = int(
                chunked._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .sizeInBytes()
                .toString()
            )
        except Exception:
            size_bytes = 0
        num_partitions = max(default_p, -(-size_bytes // bytes_per_task))
    group_cols = key_cols + ["_chunk"]
    parted = chunked.repartition(num_partitions, *group_cols)
    parted = parted.sortWithinPartitions(*group_cols)

    def run(batches):
        # Arrow batches can be tiny (maxRecordsPerBatch is tuned for
        # token-ARRAY inputs; point rows are scalars), so per-batch
        # Python work must be O(1): batches are buffered RAW, and the
        # group-boundary detection runs ONCE per flush over the whole
        # ~flush_rows buffer (one vectorized pass), not once per batch.
        buf: list[pd.DataFrame] = []
        buf_rows = 0
        # key tuple of the group known to fill the tail of the buffer.
        # While the newest batch still ends on this key, the sorted order
        # guarantees the WHOLE batch belongs to it, so a flush attempt
        # would find cut == 0 — skip the concat + key scan entirely.
        # Without this, one group of size G >> flush_rows costs
        # O(G^2 / batch) re-concatenation; with it, O(G).
        open_key = None

        def concat(frames):
            return frames[0] if len(frames) == 1 else pd.concat(
                frames, ignore_index=True
            )

        def roll(pdf):
            return rollup_points_pdf(
                pdf, cfg, group_cols, ts_col, val_col
            ).drop(columns=["_chunk"])

        for pdf in batches:
            if not len(pdf):
                continue
            last = tuple(pdf[c].iloc[-1] for c in group_cols)
            buf.append(pdf)
            buf_rows += len(pdf)
            if buf_rows >= flush_rows:
                if open_key is not None and last == open_key:
                    continue
                whole = concat(buf)
                # rows are sorted by group key, so the (possibly still
                # open) trailing group is the run equal to the last
                # row's key; everything before it is complete
                eq = np.ones(len(whole), dtype=bool)
                for c in group_cols:
                    v = whole[c].to_numpy()
                    eq &= v == v[-1]
                not_eq = np.nonzero(~eq)[0]
                cut = int(not_eq[-1]) + 1 if len(not_eq) else 0
                tail = whole.iloc[cut:]
                buf, buf_rows = [tail], len(tail)
                open_key = last
                if cut > 0:
                    yield roll(whole.iloc[:cut])
        if buf_rows:
            yield roll(concat(buf))

    return parted.mapInPandas(run, schema)
