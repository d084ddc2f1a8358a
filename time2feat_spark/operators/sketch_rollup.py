"""Sketch-based tier cascade: coarse tiers maintained from FINE-TIER
SKETCHES, never re-reading raw points.

The exact ladder (operators/rollup.py) recomputes holistic stats from
raw per chunk — bit-exact, the correctness baseline. This operator is
the scale-path alternative for continuous aggregates: each 1m window
carries a fixed-size mergeable histogram sketch
(functions/sketch.py), 1h folds 1m sketches, 1d folds 1h sketches.
Updating a coarse window after late data costs O(affected fine
sketches), independent of raw point count — the property that matters
when a 1d window covers billions of points.

Error bound: one bin width per fold level —
|q_est - q_exact| <= levels * (window range) / nbins; tested.

Plan shape: identical to the exact ladder — shuffle-free mapInPandas
over whole sequence rows; the cascade happens inside the kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.kernels import pad_windows
from ..functions.sketch import build_sketches, merge_sketches, sketch_quantile

DEFAULT_TIERS = [("1m", 60), ("1h", 3600), ("1d", 86400)]
T0_MS = 1704067200000


def sketch_schema() -> StructType:
    return StructType(
        [
            StructField("doc_id", StringType()),
            StructField("tier", StringType()),
            StructField("window_start_ms", LongType()),
            StructField("count", LongType()),
            StructField("q10_est", DoubleType()),
            StructField("q50_est", DoubleType()),
            StructField("q90_est", DoubleType()),
            StructField("sketch", ArrayType(DoubleType())),
        ]
    )


def _tier_windows(n_tok: np.ndarray, tt: int):
    """Per-doc window bookkeeping for a tier of tt ticks."""
    nw = (n_tok + tt - 1) // tt
    nw_off = np.zeros(len(n_tok) + 1, dtype=np.int64)
    np.cumsum(nw, out=nw_off[1:])
    k = int(nw_off[-1])
    doc_of = np.repeat(np.arange(len(n_tok)), nw)
    j = np.arange(k, dtype=np.int64) - np.repeat(nw_off[:-1], nw)
    return nw, nw_off, doc_of, j


def sketch_cascade_pdf(
    pdf: pd.DataFrame,
    tiers: list[tuple[str, int]] | None = None,
    nbins: int = 64,
    t0_ms: int = T0_MS,
    tick_ms: int = 1000,
) -> pd.DataFrame:
    tiers = sorted(tiers or DEFAULT_TIERS, key=lambda t: t[1])
    n_tok = pdf["n_tok"].to_numpy().astype(np.int64)
    n_docs = len(pdf)
    if n_docs == 0:
        return pd.DataFrame({f.name: [] for f in sketch_schema()})
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    flat = np.concatenate(
        [np.asarray(t, dtype=np.float64) for t in pdf["tokens"]]
    )
    doc_ids = pdf["doc_id"].to_numpy()

    frames = []
    prev_sk = None
    prev_doc_of = None
    prev_j = None
    prev_tt = None
    for tier_name, tier_sec in tiers:
        tt = tier_sec * 1000 // tick_ms
        nw, nw_off, doc_of, j = _tier_windows(n_tok, tt)
        if prev_sk is None:
            # finest tier: sketches built from the raw points, windowed
            w_starts = offsets[:-1][doc_of] + j * tt
            w_ends = np.minimum(w_starts + tt, offsets[1:][doc_of])
            mat, counts = pad_windows(flat, w_starts, w_ends)
            sk = build_sketches(mat, counts, nbins)
        else:
            # coarser tier: FOLD the previous tier's sketches — raw is
            # never touched again
            ratio = tt // prev_tt
            group_of = nw_off[:-1][prev_doc_of] + prev_j // ratio
            sk = merge_sketches(prev_sk, group_of, int(nw_off[-1]))
        frames.append(
            pd.DataFrame(
                {
                    "doc_id": doc_ids[doc_of],
                    "tier": tier_name,
                    "window_start_ms": t0_ms + j * tt * tick_ms,
                    "count": sk[:, 0].astype(np.int64),
                    "q10_est": sketch_quantile(sk, 0.1),
                    "q50_est": sketch_quantile(sk, 0.5),
                    "q90_est": sketch_quantile(sk, 0.9),
                    "sketch": list(sk),
                }
            )
        )
        prev_sk, prev_doc_of, prev_j, prev_tt = sk, doc_of, j, tt
    return pd.concat(frames, ignore_index=True)


def sketch_cascade(
    df: DataFrame,
    tiers: list[tuple[str, int]] | None = None,
    nbins: int = 64,
) -> DataFrame:
    """Shuffle-free sketch ladder over the sequences table."""
    schema = sketch_schema()

    def run(batches):
        for pdf in batches:
            if len(pdf):
                yield sketch_cascade_pdf(pdf, tiers, nbins)

    return df.mapInPandas(run, schema)


def quantile_buckets_approx(
    sketch_df: DataFrame,
    start_ms: int,
    end_ms: int,
    resolution_sec: int,
    qs: tuple[float, ...] = (0.5, 0.9),
    tiers: list[tuple[str, int]] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Approximate quantiles of [start_ms, end_ms) on a resolution
    bucket grid, answered by MERGING materialized window sketches —
    O(windows in range) work, independent of raw point count: the
    100 TB quantile fast path next to the exact-but-O(points)
    `plans/router.quantile_range`. Uses the coarsest tier whose width
    evenly divides the resolution (windows nest in buckets). Error
    bound: one extra fold on top of the cascade's —
    |est - exact| <= (levels + 1) * bucket_range / nbins.

    Shape: one shuffle on (id, bucket), then whole-batch numpy merges
    (merge_sketches handles every group in a batch at once; groups are
    partition-local by the repartition and each holds
    resolution/tier_width sketches, so a mapInPandas call buffers at
    most its partition's window rows, never raw points)."""
    import pandas as pd

    from pyspark.sql import functions as F

    tiers_sorted = sorted(tiers or DEFAULT_TIERS, key=lambda t: t[1])
    tier = None
    for name, sec in tiers_sorted:
        if sec <= resolution_sec and resolution_sec % sec == 0:
            tier = name
    if tier is None:
        raise ValueError(
            f"no sketch tier evenly divides resolution={resolution_sec}s "
            f"(tiers: {tiers_sorted})"
        )
    res_ms = resolution_sec * 1000
    if start_ms % res_ms or end_ms % res_ms:
        raise ValueError("start/end must be multiples of resolution")
    sel = (
        sketch_df.where(
            (F.col("tier") == tier)
            & (F.col("window_start_ms") >= start_ms)
            & (F.col("window_start_ms") < end_ms)
        )
        .select(
            id_col,
            (F.floor(F.col("window_start_ms") / F.lit(res_ms)) * res_ms)
            .cast("long")
            .alias("bucket_start_ms"),
            "sketch",
        )
    )
    group_cols = [id_col, "bucket_start_ms"]
    parted = sel.repartition(*group_cols).sortWithinPartitions(*group_cols)
    q_names = [f"q_{str(q).replace('.', '_')}" for q in qs]
    out_schema = StructType(
        [
            StructField(id_col, sketch_df.schema[id_col].dataType),
            StructField("bucket_start_ms", LongType()),
            StructField("count", LongType()),
        ]
        + [StructField(n, DoubleType()) for n in q_names]
    )

    def run(batches):
        # groups are partition-local (repartition on the group key), so
        # buffering the partition's WINDOW rows (not raw points) bounds
        # memory at O(windows per partition)
        parts = [pdf for pdf in batches if len(pdf)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        # vectorized multi-column group codes (no per-row Python —
        # .apply(tuple, axis=1) would call Python once per window row)
        midx = pd.MultiIndex.from_frame(pdf[group_cols])
        codes, uniq = midx.factorize()
        sk = np.vstack([np.asarray(s, dtype=np.float64) for s in pdf["sketch"]])
        merged = merge_sketches(sk, codes, len(uniq))
        res = {
            id_col: uniq.get_level_values(0).to_numpy(),
            "bucket_start_ms": uniq.get_level_values(1).to_numpy().astype(
                np.int64
            ),
            "count": merged[:, 0].astype(np.int64),
        }
        for q, n in zip(qs, q_names):
            res[n] = sketch_quantile(merged, q)
        yield pd.DataFrame(res)

    return parted.mapInPandas(run, out_schema)
