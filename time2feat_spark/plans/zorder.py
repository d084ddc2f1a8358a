"""Z-order (Morton-curve) data layout for multi-dimensional scan pruning.

Partition columns (`window_day`, IVF `cell`) give directory-level
pruning on ONE dimension. Queries that bound TWO dimensions at once
(user AND time, doc AND window) still read every file of the surviving
partitions under a linear sort, because sorting by x scatters y across
all files. Interleaving the bits of both columns (the Morton / Z-curve,
Morton 1966; the layout behind Delta/Iceberg OPTIMIZE ZORDER) makes
file-level min/max statistics selective in BOTH dimensions: each file
covers a small square of the (x, y) plane instead of a full-width
stripe, so a box predicate intersects ~sqrt of the files a linear sort
would.

Everything is JVM bit arithmetic inside whole-stage codegen (the
classic 5-op shift/mask spread per column, no Python), one driver-side
min/max agg row per column to normalize values to 16-bit grid cells
(equal-width quantization — the right default for the timestamp/id
columns this engine z-orders; swap in quantile boundaries for heavily
skewed columns), and one range-repartition on the z value so files tile
the curve contiguously.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SPREAD_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(c: Column) -> Column:
    """Interleave zeros between the 16 low bits: abcd -> 0a0b0c0d."""
    x = c.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_MASKS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton2(a: Column, b: Column) -> Column:
    """Morton code of two 16-bit cell indices (a in even bits, b odd)."""
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1))


def _grid16(c: Column, lo: float, hi: float) -> Column:
    """Equal-width 16-bit cell index of a numeric column over [lo, hi]."""
    if hi <= lo:  # constant column: everything in cell 0
        return F.lit(0)
    scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    return F.least(
        F.greatest(F.floor(scaled * 65536).cast("long"), F.lit(0)),
        F.lit(65535),
    )


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 64,
) -> None:
    """Write `df` as `n_files` parquet files tiling the Z-curve over two
    numeric columns. Column min/max come from ONE bounded agg row
    (driver-side scalars, same posture as the IVF centroid sample); the
    z value drives a range repartition + within-partition sort and is
    DROPPED from the stored schema — the layout, not the data, changes.
    Readers need no code change: parquet min/max file statistics do the
    pruning for any engine."""
    if len(cols) != 2:
        raise ValueError("zorder_write interleaves exactly 2 columns")
    a, b = cols
    stats = df.agg(
        F.min(F.col(a).cast("double")), F.max(F.col(a).cast("double")),
        F.min(F.col(b).cast("double")), F.max(F.col(b).cast("double")),
    ).first()
    if any(x is None for x in stats):
        raise ValueError(
            f"zorder_write needs numeric, non-all-NULL values in {cols}; "
            f"min/max came back {tuple(stats)} (empty input or all-NULL "
            "column)"
        )
    lo_a, hi_a, lo_b, hi_b = (float(x) for x in stats)
    z = morton2(
        _grid16(F.col(a), lo_a, hi_a), _grid16(F.col(b), lo_b, hi_b)
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_intersecting(
    path: str, col: str, lo, hi
) -> tuple[int, int]:
    """(files whose [min, max] for `col` intersects [lo, hi], total
    files) from parquet FOOTER statistics only — what a scan planner
    prunes with, measured without reading data pages."""
    import glob

    import pyarrow.parquet as pq

    touched = total = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        fmin = fmax = None
        stats_missing = False
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or st.min is None or st.max is None:
                # a stats-less row group is non-prunable: the planner
                # must treat the whole file as touched
                stats_missing = True
                break
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        total += 1
        if stats_missing or (
            fmin is not None and not (fmax < lo or fmin > hi)
        ):
            touched += 1
    return touched, total
