"""Visualization downsampling: Largest-Triangle-Three-Buckets (LTTB).

The rollup ladder answers aggregate/statistic reads; dashboards also
need SHAPE-preserving raw-series thinning — the standard algorithm is
LTTB (Steinarsson 2013, public thesis/reference implementation): split
the series into `n_out - 2` equal-count buckets and, walking left to
right, keep from each bucket the point forming the largest triangle
with the previously kept point and the NEXT bucket's centroid. First
and last points are always kept; spikes survive because they dominate
the triangle area.

Scale posture: one shuffle on the series key, then per-series work.
LTTB is inherently sequential in its selection (each choice depends on
the previous), so the per-series bucket walk is a Python loop of
`n_out` steps with vectorized numpy inside each bucket — n_out is a
plot width (hundreds to a few thousand), not a data size; the O(points)
work (bucketing, centroids, areas) is whole-array numpy. Series are
partition-local (repartition on key) and only the series being thinned
is buffered."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def lttb_numpy(ts: np.ndarray, vals: np.ndarray, n_out: int) -> np.ndarray:
    """Indices of the LTTB selection of (ts, vals), ts ascending.
    Returns all indices when n_out >= len(ts); n_out >= 3 otherwise."""
    n = len(ts)
    if n_out >= n:
        return np.arange(n)
    if n_out < 3:
        raise ValueError("n_out must be >= 3 (first, last, one bucket)")
    # equal-count bucket edges over the interior points [1, n-1)
    edges = 1 + ((np.arange(n_out - 1) * (n - 2)) // (n_out - 2))
    edges = np.append(edges, n - 1)
    x = ts.astype(np.float64)
    y = vals.astype(np.float64)
    out = np.empty(n_out, dtype=np.int64)
    out[0] = 0
    prev = 0
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        nlo, nhi = edges[i + 1], edges[i + 2] if i + 2 < len(edges) else n
        # next bucket centroid (last "bucket" is the final point)
        ax = x[nlo:nhi].mean() if nhi > nlo else x[n - 1]
        ay = y[nlo:nhi].mean() if nhi > nlo else y[n - 1]
        px, py = x[prev], y[prev]
        bx, by = x[lo:hi], y[lo:hi]
        area = np.abs((px - ax) * (by - py) - (px - bx) * (ay - py))
        prev = lo + int(np.argmax(area))
        out[i + 1] = prev
    out[n_out - 1] = n - 1
    return out


def lttb(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    val_col: str,
    n_out: int,
) -> DataFrame:
    """Per-series LTTB downsample to <= n_out points. Output: key cols +
    (ts_ms, value) of the kept points, series-order preserved."""
    key_fields = [df.schema[c] for c in key_cols]
    schema = StructType(
        key_fields
        + [StructField("ts_ms", LongType()), StructField("value", DoubleType())]
    )
    sel = df.select(
        *key_cols,
        F.unix_millis(F.col(ts_col).cast("timestamp")).alias("_ts"),
        F.col(val_col).cast("double").alias("_v"),
    ).where(F.col("_ts").isNotNull() & F.col("_v").isNotNull())
    parted = sel.repartition(*key_cols).sortWithinPartitions(
        *key_cols, "_ts"
    )

    def run(batches):
        # streamed buffered flush (same shape as rollup_points): rows
        # arrive sorted by (key, ts), so only the CURRENT series is ever
        # buffered — worker memory is O(largest single series + one
        # Arrow batch), never O(partition raw points)
        buf: list[pd.DataFrame] = []
        cur = None

        def flush():
            g = pd.concat(buf, ignore_index=True) if len(buf) > 1 else buf[0]
            ts = g["_ts"].to_numpy()
            vals = g["_v"].to_numpy()
            idx = lttb_numpy(ts, vals, n_out)
            res = {c: g[c].to_numpy()[idx] for c in key_cols}
            res["ts_ms"] = ts[idx]
            res["value"] = vals[idx]
            return pd.DataFrame(res)

        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            # vectorized series boundaries within the batch (no per-row
            # Python): a row starts a new slice when any key col changes
            kcols = [pdf[c].to_numpy() for c in key_cols]
            change = np.zeros(n, dtype=bool)
            for arr in kcols:
                change[1:] |= arr[1:] != arr[:-1]
            bounds = np.concatenate(
                ([0], np.flatnonzero(change), [n])
            )
            for s, e in zip(bounds[:-1], bounds[1:]):
                key = tuple(arr[s] for arr in kcols)
                if cur is not None and key != cur:
                    yield flush()
                    buf = []
                cur = key
                buf.append(pdf.iloc[s:e])
        if buf:
            yield flush()

    return parted.mapInPandas(run, schema)
