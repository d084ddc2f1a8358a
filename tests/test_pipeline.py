"""End-to-end pipeline() parity with the reference's demo.py entry:
read .ts -> extract -> select -> cluster -> AMI, in all three
model_type modes and both supervision modes."""

from __future__ import annotations

import pytest

from time2feat_spark.pipeline import pipeline

BM_TRAIN = "/root/reference/data/BasicMotions/BasicMotions_TRAIN.txt"


def test_pipeline_unsupervised_kmeans(spark):
    res = pipeline(spark, [BM_TRAIN], transform_type="std",
                   model_type="KMeans")
    assert len(res["y_pred"]) == 40
    assert res["n_features_extracted"] > 400
    assert 1 <= len(res["selected"]) <= res["n_features_extracted"]
    assert res["ami"] >= 0.7, res["ami"]


def test_pipeline_semi_supervised_spectral(spark):
    res = pipeline(spark, [BM_TRAIN], transform_type="minmax",
                   model_type="Spectral", train_size=0.3)
    assert res["ami"] >= 0.7, res["ami"]


def test_pipeline_validates_inputs(spark):
    with pytest.raises(ValueError, match="doesn't exist"):
        pipeline(spark, ["/nosuch.ts"])
    with pytest.raises(ValueError, match="between 0 and 1"):
        pipeline(spark, [BM_TRAIN], train_size=2.0)


def test_reference_feature_name_grammar():
    """reference_names=True emits the reference's exact intra grammar
    (extractor.py:28,65: single__{signal}__{tsfresh column}) with
    tsfresh-canonical inner names from the checked-in grid."""
    from time2feat_spark.pipeline import reference_feature_name as r

    assert r("feat_autocorr_lag1") == "autocorrelation__lag_1"
    assert r("feat_count") == "length"
    assert r("feat_sum") == "sum_values"
    assert r("feat_std") == "standard_deviation"
    assert r("feat_q10") == "quantile__q_0.1"
    assert (
        r("feat_change_q_0_2_1_mean")
        == 'change_quantiles__f_agg_"mean"__isabs_True__qh_0.2__ql_0.0'
    )
    assert r("feat_cid_ce_norm") == "cid_ce__normalize_True"
    assert r("feat_fft_centroid") == 'fft_aggregated__aggtype_"centroid"'
    assert r("feat_binned_entropy_10") == "binned_entropy__max_bins_10"


def test_pipeline_reference_names(spark):
    res = pipeline(
        spark, [BM_TRAIN], transform_type="std", model_type="KMeans",
        reference_names=True,
    )
    sel = res["selected"]
    assert sel and all(
        c.startswith("single__") or c.startswith("pair__") for c in sel
    )
    singles = [c for c in sel if c.startswith("single__")]
    if singles:
        # single__{signal}__{calculator...}
        assert all(len(c.split("__", 2)) == 3 for c in singles)
    assert res["ami"] >= 0.7
