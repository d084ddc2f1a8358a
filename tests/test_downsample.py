"""LTTB visualization downsampling: selection properties (endpoints,
count, order, spike retention), agreement between the Spark operator
and the numpy kernel, and exactness when n_out >= series length."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from time2feat_spark.operators.downsample import lttb, lttb_numpy


def test_lttb_numpy_properties():
    rng = np.random.default_rng(0)
    n = 5000
    ts = np.arange(n, dtype=np.int64) * 1000
    vals = np.cumsum(rng.standard_normal(n))
    vals[3210] += 400.0  # a spike LTTB must keep
    idx = lttb_numpy(ts, vals, 200)
    assert len(idx) == 200
    assert idx[0] == 0 and idx[-1] == n - 1
    assert (np.diff(idx) > 0).all()  # strictly increasing selection
    assert 3210 in idx  # the spike dominates its bucket's triangle
    # small series pass through untouched
    assert list(lttb_numpy(ts[:50], vals[:50], 200)) == list(range(50))
    with pytest.raises(ValueError, match="n_out"):
        lttb_numpy(ts, vals, 2)


def test_lttb_keeps_visual_extremes():
    """LTTB's guarantee is SHAPE retention: isolated spikes dominate
    their bucket's triangle area and overwhelmingly survive the 10:1
    thinning, where naive every-k-th sampling keeps ~10% by chance.
    (It does NOT minimize mean interpolation error — keeping extremes is
    the point.)"""
    rng = np.random.default_rng(7)
    n = 4000
    ts = np.arange(n, dtype=np.int64)
    vals = np.sin(ts / 150) * 10 + rng.standard_normal(n) * 0.1
    spikes = rng.choice(n - 2, 25, replace=False) + 1
    vals[spikes] += rng.uniform(5, 30, 25)
    lttb_idx = lttb_numpy(ts, vals, 400)
    kept = np.isin(spikes, lttb_idx).mean()
    assert kept >= 0.8, kept
    # and the thinned envelope still spans the signal's range
    assert vals[lttb_idx].max() == vals.max()
    assert abs(vals[lttb_idx].min() - vals.min()) < 1.0


def test_lttb_spark_matches_numpy_per_series(spark):
    rng = np.random.default_rng(1)
    rows = []
    truth = {}
    for key in ("a", "b", "c"):
        n = int(rng.integers(500, 900))
        ts = np.cumsum(rng.integers(1, 5, n)) * 1000
        vals = np.round(np.cumsum(rng.standard_normal(n)), 3)
        truth[key] = (ts, vals)
        rows.append(
            pd.DataFrame(
                {
                    "key": key,
                    "ts": pd.to_datetime(ts, unit="ms"),
                    "value": vals,
                }
            )
        )
    df = spark.createDataFrame(pd.concat(rows, ignore_index=True))
    out = (
        lttb(df, ["key"], "ts", "value", 100)
        .toPandas()
        .sort_values(["key", "ts_ms"])
    )
    for key, (ts, vals) in truth.items():
        idx = lttb_numpy(ts.astype(np.int64), vals, 100)
        g = out[out.key == key]
        assert (g.ts_ms.to_numpy() == ts[idx]).all()
        assert (g.value.to_numpy() == vals[idx]).all()


def test_detect_gaps(spark):
    """Gap monitoring over a two-series fixture with known silences."""
    import pandas as pd

    from time2feat_spark.operators.asof import detect_gaps

    def s(key, secs):
        return pd.DataFrame(
            {"key": key, "ts": pd.to_datetime(np.array(secs) * 1000, unit="ms")}
        )

    # a: points at 0,10,20, 100, 110, 500 -> gaps 20->100 and 110->500
    # b: regular 0..50 step 10 -> no gaps
    df = spark.createDataFrame(
        pd.concat(
            [s("a", [0, 10, 20, 100, 110, 500]), s("b", range(0, 60, 10))],
            ignore_index=True,
        )
    )
    out = (
        detect_gaps(df, ["key"], "ts", threshold_sec=30)
        .toPandas()
        .sort_values("gap_start_ms")
        .reset_index(drop=True)
    )
    assert list(out.key) == ["a", "a"]
    assert list(out.gap_start_ms) == [20_000, 110_000]
    assert list(out.gap_end_ms) == [100_000, 500_000]
    assert list(out.gap_ms) == [80_000, 390_000]


def test_interval_join_matches_naive_and_avoids_nested_loop(spark):
    """Bucketized range join == the naive cross-join filter, and the
    physical plan is a hash/sort-merge join on (key, bucket), NOT a
    BroadcastNestedLoopJoin."""
    import pandas as pd

    from pyspark.sql import functions as F

    from time2feat_spark.operators.asof import interval_join

    rng = np.random.default_rng(5)
    n_ev, n_iv = 2000, 60
    ev = pd.DataFrame(
        {
            "key": rng.choice(["a", "b"], n_ev),
            "ts": pd.to_datetime(
                rng.integers(0, 10**7, n_ev) * 1000, unit="ms"
            ),
            "v": np.arange(n_ev),
        }
    )
    lo = rng.integers(0, 10**7, n_iv)
    ln = rng.integers(1, 300_000, n_iv)
    iv = pd.DataFrame(
        {
            "key": rng.choice(["a", "b"], n_iv),
            "start": pd.to_datetime(lo * 1000, unit="ms"),
            "end": pd.to_datetime((lo + ln) * 1000, unit="ms"),
            "iv_id": np.arange(n_iv),
        }
    )
    E, I = spark.createDataFrame(ev), spark.createDataFrame(iv)
    got = (
        interval_join(E, I, key_cols=["key"])
        .select("v", "iv_id")
        .toPandas()
        .sort_values(["v", "iv_id"])
        .reset_index(drop=True)
    )
    naive = (
        E.alias("e")
        .join(I.alias("i"), F.col("e.key") == F.col("i.key"))
        .where(
            (F.col("e.ts") >= F.col("i.start")) & (F.col("e.ts") < F.col("i.end"))
        )
        .select("v", "iv_id")
        .toPandas()
        .sort_values(["v", "iv_id"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    assert got.equals(naive)
    plan = interval_join(E, I, key_cols=["key"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_interval_join_empty_and_inverted_intervals_are_safe(spark):
    """Regression (r4 review): end <= start intervals match nothing and
    must NOT build a descending bucket sequence (F.sequence(1,0) is
    [1,0]) or explode into span/bucket junk rows."""
    import pandas as pd

    from time2feat_spark.operators.asof import interval_join

    ev = spark.createDataFrame(
        pd.DataFrame(
            {"ts": pd.to_datetime([1_000_000, 2_000_000], unit="ms"),
             "v": [1, 2]}
        )
    )
    iv = spark.createDataFrame(
        pd.DataFrame(
            {
                # empty (end == start) and inverted (end << start)
                "start": pd.to_datetime([1_000_000, 9_000_000], unit="ms"),
                "end": pd.to_datetime([1_000_000, 0], unit="ms"),
                "iv_id": [0, 1],
            }
        )
    )
    out = interval_join(ev, iv, bucket_ms=1000)
    assert out.count() == 0


def test_lttb_property():
    """Property: arbitrary monotone-ts series — selection keeps
    endpoints, is strictly increasing, has the requested size, and
    includes the global max's bucket-dominating point."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
            min_size=3, max_size=600,
        ),
        st.integers(min_value=3, max_value=100),
    )
    def check(vals, n_out):
        v = np.asarray(vals, dtype=np.float64)
        ts = np.arange(len(v), dtype=np.int64)
        idx = lttb_numpy(ts, v, n_out)
        assert len(idx) == min(n_out, len(v))
        assert idx[0] == 0 and idx[-1] == len(v) - 1
        assert (np.diff(idx) > 0).all()

    check()


def test_lttb_streamed_flush_across_arrow_batches(spark):
    """r5 memory fix: series are flushed as the sorted key advances, so
    a series spanning MANY Arrow batches (maxRecordsPerBatch=64 here)
    still reproduces the numpy kernel exactly — and the worker never
    buffers more than one series."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        rng = np.random.default_rng(9)
        rows, truth = [], {}
        for key in ("k1", "k2"):
            n = 700
            ts = np.cumsum(rng.integers(1, 4, n)) * 1000
            vals = np.round(np.cumsum(rng.standard_normal(n)), 3)
            truth[key] = (ts, vals)
            rows.append(pd.DataFrame(
                {"key": key, "ts": pd.to_datetime(ts, unit="ms"),
                 "value": vals}))
        df = spark.createDataFrame(
            pd.concat(rows, ignore_index=True)).coalesce(1)
        out = (lttb(df, ["key"], "ts", "value", 120)
               .toPandas().sort_values(["key", "ts_ms"]))
        for key, (ts, vals) in truth.items():
            idx = lttb_numpy(ts.astype(np.int64), vals, 120)
            g = out[out.key == key]
            assert (g.ts_ms.to_numpy() == ts[idx]).all()
            assert (g.value.to_numpy() == vals[idx]).all()
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old)
