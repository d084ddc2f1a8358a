"""Mergeable histogram-sketch cascade: error bounds hold per fold level
and the Spark plan stays shuffle-free."""

from __future__ import annotations

import numpy as np
import pytest

from time2feat_spark.functions.sketch import (
    build_sketches,
    merge_sketches,
    sketch_quantile,
)
from time2feat_spark.generator import gen_pandas
from time2feat_spark.operators.sketch_rollup import (
    sketch_cascade,
    sketch_cascade_pdf,
)

NBINS = 64


def test_single_sketch_quantile_error_bound():
    rng = np.random.default_rng(0)
    k, w = 50, 500
    mat = rng.uniform(-5, 20, (k, w))
    counts = np.full(k, w)
    sk = build_sketches(mat, counts, NBINS)
    for q in (0.1, 0.5, 0.9):
        est = sketch_quantile(sk, q)
        exact = np.quantile(mat, q, axis=1)
        bound = (mat.max(axis=1) - mat.min(axis=1)) / NBINS + 1e-12
        assert (np.abs(est - exact) <= bound).all(), q


def test_merge_error_one_extra_bin_per_level():
    rng = np.random.default_rng(1)
    # 60 fine windows of 60 points -> one merged window of 3600 points
    fine = rng.standard_normal((60, 60)) * rng.uniform(0.5, 2, (60, 1)) + rng.uniform(-3, 3, (60, 1))
    sk_fine = build_sketches(fine, np.full(60, 60), NBINS)
    merged = merge_sketches(sk_fine, np.zeros(60, dtype=np.int64), 1)
    allv = fine.ravel()
    assert merged[0, 0] == allv.size
    assert merged[0, 1] == allv.min() and merged[0, 2] == allv.max()
    bound = 2.5 * (allv.max() - allv.min()) / NBINS
    for q in (0.1, 0.5, 0.9):
        est = sketch_quantile(merged, q)[0]
        assert abs(est - np.quantile(allv, q)) <= bound, q


def test_cascade_rank_error_bounds():
    """1m from raw, 1h folded from 1m, 1d folded from 1h. The histogram
    guarantee is a RANK bound (estimate's empirical rank off by at most
    its containing bin's mass): with 60-point 1m windows a bin can hold
    ~10% of the window; the big folded windows (3600/86400 points) must
    be within 1% relative rank despite one/two extra rebin levels."""
    pdf = gen_pandas(0, 25)
    out = sketch_cascade_pdf(pdf)
    toks = {r.doc_id: np.asarray(r.tokens, dtype=np.float64)
            for r in pdf.itertuples(index=False)}
    rel_bound = {"1m": 0.13, "1h": 0.01, "1d": 0.01}
    tt = {"1m": 60, "1h": 3600, "1d": 86400}
    checked = 0
    for r in out.sample(min(len(out), 500), random_state=0).itertuples(index=False):
        x = toks[r.doc_id]
        t = tt[r.tier]
        j = (r.window_start_ms - 1704067200000) // (t * 1000)
        win = x[j * t : (j + 1) * t]
        assert len(win) == r.count
        n = len(win)
        if n < 8:
            continue
        for q, est in ((0.1, r.q10_est), (0.5, r.q50_est), (0.9, r.q90_est)):
            rank = (win <= est).sum()
            assert abs(rank - q * n) / n <= rel_bound[r.tier], (r.tier, q)
        checked += 1
    assert checked > 100


def test_cascade_spark_plan_is_shuffle_free(spark):
    sdf = spark.createDataFrame(gen_pandas(0, 30))
    out = sketch_cascade(sdf)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = out.where("tier = '1d'").count()
    assert rows == 30  # one 1d window per ~1056-tick doc


def test_quantile_buckets_approx_from_materialized_sketches(spark):
    """quantile_buckets_approx answers a (range, resolution) quantile by
    MERGING materialized 1m sketches into 5m buckets (O(windows), raw
    never read). Truth: numpy quantiles of the raw token slice per
    bucket; value bound = 2.5 * bucket range / nbins (build + one merge
    level, same factor test_merge_error_one_extra_bin_per_level pins)."""
    from time2feat_spark.operators.sketch_rollup import (
        T0_MS,
        quantile_buckets_approx,
    )

    pdf = gen_pandas(0, 20)
    sk = sketch_cascade(spark.createDataFrame(pdf))
    res = 300  # 5 minutes: only the 1m tier divides it -> real merging
    out = quantile_buckets_approx(
        sk, T0_MS, T0_MS + 86_400_000, res, qs=(0.1, 0.5, 0.9)
    ).toPandas()
    toks = {
        r.doc_id: np.asarray(r.tokens, dtype=np.float64)
        for r in pdf.itertuples(index=False)
    }
    assert len(out) > 20
    checked = 0
    for r in out.itertuples(index=False):
        x = toks[r.doc_id]
        b = (r.bucket_start_ms - T0_MS) // (res * 1000)
        win = x[b * res : (b + 1) * res]
        assert len(win) == r.count
        if len(win) < 8:
            continue
        bound = 2.5 * (win.max() - win.min()) / NBINS
        for q, est in ((0.1, r.q_0_1), (0.5, r.q_0_5), (0.9, r.q_0_9)):
            assert abs(est - np.quantile(win, q)) <= bound, (q, b)
        checked += 1
    assert checked > 20
    # misuse is loud: no tier divides 90s; misaligned bounds raise
    with pytest.raises(ValueError, match="evenly divides"):
        quantile_buckets_approx(sk, T0_MS, T0_MS + 86_400_000, 90)
    with pytest.raises(ValueError, match="multiples of resolution"):
        quantile_buckets_approx(sk, T0_MS + 1, T0_MS + 86_400_000, res)
