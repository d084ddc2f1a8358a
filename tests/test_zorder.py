"""Z-order layout: Morton-code correctness vs a plain-python reference,
and footer-statistics pruning evidence vs a linear sort."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from time2feat_spark.plans.zorder import (
    files_intersecting,
    morton2,
    zorder_write,
)


def _morton_ref(a: int, b: int) -> int:
    out = 0
    for i in range(16):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_morton2_matches_bit_interleave_reference(spark):
    rng = np.random.default_rng(2)
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, 65536, (200, 2))]
    pairs += [(0, 0), (65535, 65535), (65535, 0), (0, 65535)]
    df = spark.createDataFrame(pairs, ["a", "b"])
    got = df.select(morton2(F.col("a"), F.col("b")).alias("z")).collect()
    for (a, b), r in zip(pairs, got):
        assert r["z"] == _morton_ref(a, b), (a, b)


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    """1M uniform 2-D rows written (a) sorted by x, (b) z-ordered."""
    base = tmp_path_factory.mktemp("zorder")
    rng = np.random.default_rng(7)
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "x": rng.integers(0, 1_000_000, 200_000),
            "y": rng.integers(0, 1_000_000, 200_000),
        }
    )
    df = spark.createDataFrame(pdf)
    xsorted = str(base / "xsorted")
    (
        df.repartitionByRange(64, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xsorted)
    )
    zpath = str(base / "zorder")
    zorder_write(df, ["x", "y"], zpath, n_files=64)
    return xsorted, zpath


def test_zorder_preserves_rows(spark, layouts):
    _, zpath = layouts
    out = spark.read.parquet(zpath)
    assert out.count() == 200_000
    assert set(out.columns) == {"x", "y"}  # the z key is layout-only


def test_zorder_prunes_second_dimension(spark, layouts):
    """A y-only range covering 1/8 of the domain: the x-sorted layout
    cannot prune at all (y is scattered everywhere); the z-ordered
    layout's files each cover a small y-band."""
    xsorted, zpath = layouts
    lo, hi = 437_500, 562_500
    x_touch, x_total = files_intersecting(xsorted, "y", lo, hi)
    z_touch, z_total = files_intersecting(zpath, "y", lo, hi)
    assert x_total == 64 and z_total == 64
    assert x_touch == 64                      # linear sort: no pruning
    assert z_touch <= 32, z_touch             # z-order: at most half


def test_zorder_prunes_boxes_better_than_linear_sort(spark, layouts):
    """1/8 x 1/8 box predicates: z-order must beat the x-sort on files
    intersecting BOTH bounds (x-sort already prunes x to ~1/8)."""
    xsorted, zpath = layouts

    def box_files(path, xlo, xhi, ylo, yhi):
        import glob

        import pyarrow.parquet as pq

        touched = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i
                   for i in range(md.num_columns)}
            mins, maxs = {}, {}
            for col in ("x", "y"):
                m = M = None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx[col]).statistics
                    m = st.min if m is None else min(m, st.min)
                    M = st.max if M is None else max(M, st.max)
                mins[col], maxs[col] = m, M
            if not (maxs["x"] < xlo or mins["x"] > xhi
                    or maxs["y"] < ylo or mins["y"] > yhi):
                touched += 1
        return touched

    rng = np.random.default_rng(3)
    z_sum = x_sum = 0
    for _ in range(8):
        x0 = int(rng.integers(0, 875_000))
        y0 = int(rng.integers(0, 875_000))
        x_sum += box_files(xsorted, x0, x0 + 125_000, y0, y0 + 125_000)
        z_sum += box_files(zpath, x0, x0 + 125_000, y0, y0 + 125_000)
    assert z_sum < x_sum, (z_sum, x_sum)
