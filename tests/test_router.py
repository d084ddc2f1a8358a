"""Tier-aware query routing (plans/router.py): the read-side dispatch
over the materialized ladder — coarsest sufficient tier for a
resolution, day-pruned reads, and raw-fidelity point decode from the
finest tier's Gorilla blocks (truth: independently decoded `raw`-tier
whole-series blocks)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from time2feat_spark.generator import gen_pandas
from time2feat_spark.operators.rollup import RollupConfig, tier_points
from time2feat_spark.plans.ladder_job import LadderJob
from time2feat_spark.plans.router import choose_tier, route_points, route_range

CFG = RollupConfig()  # raw + 1m/1h/1d, compressed


def test_choose_tier_rule():
    assert choose_tier(CFG, 86400) == "1d"
    assert choose_tier(CFG, 7 * 86400) == "1d"
    assert choose_tier(CFG, 7200) == "1h"
    assert choose_tier(CFG, 3600) == "1h"
    assert choose_tier(CFG, 90) == "1m"
    assert choose_tier(CFG, 30) is None  # finer than every windowed tier


def _ladder(spark, tmp_path, n=80):
    inp = str(tmp_path / "seq")
    spark.createDataFrame(gen_pandas(0, n)).write.mode("overwrite").parquet(inp)
    job = LadderJob(spark, inp, str(tmp_path / "out"), CFG)
    job.run()
    return job


def test_route_range_picks_tier_and_prunes(spark, tmp_path):
    job = _ladder(spark, tmp_path)
    full = job.read_output()
    t_lo = full.where("tier = '1h'").agg(
        F.min(F.unix_millis("window_start"))
    ).first()[0]
    start, end = t_lo, t_lo + 6 * 3600 * 1000

    tier, df = route_range(job, start, end, resolution_sec=7200)
    assert tier == "1h"
    got = df.select("source", "doc_id", "window_start", "count").toPandas()
    want = (
        full.where(
            (F.col("tier") == "1h")
            & (F.unix_millis("window_start") >= start)
            & (F.unix_millis("window_start") < end)
        )
        .select("source", "doc_id", "window_start", "count")
        .toPandas()
    )
    key = ["source", "doc_id", "window_start"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
    )
    # day-resolution request routes to 1d, week-long range
    tier2, df2 = route_range(job, start, start + 7 * 86_400_000, 86_400)
    assert tier2 == "1d" and df2.count() > 0
    # pruning evidence on the routed plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "window_day" in plan.split("PartitionFilters")[1][:300]


def test_route_points_matches_raw_tier_decode(spark, tmp_path):
    """Points routed from 1m Gorilla windows == the same range decoded
    from the INDEPENDENT raw-tier whole-series blocks."""
    job = _ladder(spark, tmp_path)
    full = job.read_output()
    t_lo = full.where("tier = '1m'").agg(
        F.min(F.unix_millis("window_start"))
    ).first()[0]
    # deliberately unaligned range (30 s into a minute, 150 s long)
    start, end = t_lo + 30_000, t_lo + 180_000

    tier, got_df = route_range(job, start, end, resolution_sec=1)
    assert tier == "points"
    got = got_df.toPandas()
    raw = tier_points(
        full.where("tier = 'raw'"), key_cols=["source", "doc_id"]
    ).where(
        (F.col("ts_ms") >= start) & (F.col("ts_ms") < end)
    ).drop("tier").toPandas()
    key = ["source", "doc_id", "ts_ms"]
    g = got.sort_values(key).reset_index(drop=True)
    w = raw.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w) > 0
    pd.testing.assert_frame_equal(g, w)
    # exact range bounds honored
    assert g.ts_ms.min() >= start and g.ts_ms.max() < end


def test_route_points_empty_range(spark, tmp_path):
    job = _ladder(spark, tmp_path, n=30)
    assert route_points(job, 0, 1000).count() == 0


def test_aggregate_range_reagg_exact_vs_direct_rollup(spark, tmp_path):
    """6h buckets answered from the 1h tier must equal a DIRECT rollup
    of the same input at a 6h tier: count/sum/min/max exactly (token
    values are small ints — double sums are exact), mean to 1 ulp."""
    import pytest

    from time2feat_spark.operators.rollup import assemble, rollup_sequences
    from time2feat_spark.plans.router import aggregate_range

    job = _ladder(spark, tmp_path, n=60)
    full = job.read_output()
    t_lo = full.where("tier = '1d'").agg(
        F.min(F.unix_millis("window_start"))
    ).first()[0]
    res = 6 * 3600
    start = (t_lo // (res * 1000)) * (res * 1000)
    end = start + 2 * 86_400_000

    tier, got_df = aggregate_range(job, start, end, res)
    assert tier == "1h"  # coarsest divisor of 6h among 1m/1h/1d
    got = got_df.toPandas()

    seq = spark.read.parquet(str(tmp_path / "seq"))
    direct_cfg = RollupConfig(
        tiers=[("6h", res)], include_raw=False, compress=False, features=[]
    )
    want = (
        assemble(rollup_sequences(seq, direct_cfg), direct_cfg)
        .where(
            (F.unix_millis("window_start") >= start)
            & (F.unix_millis("window_start") < end)
        )
        .select(
            "source", "doc_id",
            F.unix_millis("window_start").alias("bucket_start_ms"),
            "count", "sum", "min", "max", "mean",
        )
        .toPandas()
    )
    key = ["source", "doc_id", "bucket_start_ms"]
    g = got[want.columns].sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w) > 0
    for c in ("count", "sum", "min", "max"):
        assert (g[c].to_numpy() == w[c].to_numpy()).all(), c
    assert np.allclose(g["mean"], w["mean"], rtol=1e-12, atol=0)

    # misaligned bounds are loud
    with pytest.raises(ValueError, match="multiples of resolution"):
        aggregate_range(job, start + 1, end, res)

    # a resolution no tier divides falls back to bucketed points
    tier2, df2 = aggregate_range(job, start, start + 180_000, 90)
    assert tier2 == "points" and df2.count() > 0


def test_quantile_range_exact_vs_numpy(spark, tmp_path):
    """quantile_range decodes the 1h tier's Gorilla blocks and must
    reproduce numpy's linear-interpolation percentiles of the raw input
    samples per 6h bucket, exactly."""
    import numpy as np

    from time2feat_spark.operators.rollup import tier_points
    from time2feat_spark.plans.router import quantile_range

    job = _ladder(spark, tmp_path, n=40)
    full = job.read_output()
    t_lo = full.where("tier = '1d'").agg(
        F.min(F.unix_millis("window_start"))
    ).first()[0]
    res = 6 * 3600
    start = (t_lo // (res * 1000)) * (res * 1000)
    end = start + 86_400_000

    got = quantile_range(job, start, end, res, qs=(0.5, 0.9)).toPandas()
    assert len(got) > 0

    # independent truth: decode the RAW whole-series tier, bucket with
    # pandas, numpy percentiles
    raw = tier_points(
        full.where("tier = 'raw'"), key_cols=["source", "doc_id"]
    ).where(
        (F.col("ts_ms") >= start) & (F.col("ts_ms") < end)
    ).toPandas()
    raw["bucket_start_ms"] = (raw.ts_ms // (res * 1000)) * (res * 1000)
    want = (
        raw.groupby(["source", "doc_id", "bucket_start_ms"])["value"]
        .agg(
            count="count",
            q_0_5=lambda v: np.percentile(v, 50),
            q_0_9=lambda v: np.percentile(v, 90),
        )
        .reset_index()
    )
    key = ["source", "doc_id", "bucket_start_ms"]
    g = got.sort_values(key).reset_index(drop=True)[want.columns]
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w)
    assert (g["count"].to_numpy() == w["count"].to_numpy()).all()
    # Spark computes (1-f)*lo + f*hi, numpy lo + f*(hi-lo): same linear
    # interpolation, last-ulp float difference
    for c in ("q_0_5", "q_0_9"):
        assert np.allclose(g[c], w[c], rtol=1e-12, atol=1e-12), c
