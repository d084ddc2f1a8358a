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
