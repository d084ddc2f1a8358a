"""Hash-deterministic sampling/splitting: stability across runs and
data growth, proportion accuracy, exact per-group caps, mixture
shaping."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from time2feat_spark.operators.sampling import (
    deterministic_split,
    mixture_sample,
    sample_fraction,
    sample_per_group,
)


def _docs(spark, n, sources=("web", "code", "wiki")):
    rng = np.random.default_rng(0)
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [f"d{i}" for i in range(n)],
                "source": rng.choice(sources, n, p=[0.6, 0.3, 0.1]),
            }
        )
    )


def test_split_proportions_and_stability(spark):
    df = _docs(spark, 20_000)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = deterministic_split(df, w).groupBy("split").count().toPandas()
    props = dict(zip(a["split"], a["count"] / 20_000))
    for name, wgt in w.items():
        assert abs(props[name] - wgt) < 0.01, (name, props)
    # stability: identical assignment on a re-run AND after data growth
    one = deterministic_split(df, w).where("doc_id = 'd123'").first()["split"]
    bigger = _docs(spark, 30_000)
    two = deterministic_split(bigger, w).where("doc_id = 'd123'").first()["split"]
    assert one == two
    with pytest.raises(ValueError, match="sum to 1"):
        deterministic_split(df, {"a": 0.5, "b": 0.2})


def test_sample_fraction_deterministic_superset(spark):
    df = _docs(spark, 10_000)
    kept = sample_fraction(df, 0.25).toPandas()
    assert abs(len(kept) / 10_000 - 0.25) < 0.02
    # kept rows stay kept when more data arrives
    kept_big = sample_fraction(_docs(spark, 15_000), 0.25).toPandas()
    assert set(kept.doc_id) <= set(kept_big.doc_id)
    # different seed -> different (but valid) selection
    other = sample_fraction(df, 0.25, seed=7).toPandas()
    assert set(other.doc_id) != set(kept.doc_id)


def test_sample_per_group_exact_caps(spark):
    df = _docs(spark, 5_000)
    out = sample_per_group(df, ["source"], 100).toPandas()
    sizes = out.groupby("source").size()
    full = df.groupBy("source").count().toPandas().set_index("source")["count"]
    for src, n in full.items():
        assert sizes[src] == min(100, n), src
    # deterministic: same selection both runs
    again = sample_per_group(df, ["source"], 100).toPandas()
    assert set(out.doc_id) == set(again.doc_id)


def test_mixture_sample_shapes_distribution(spark):
    df = _docs(spark, 30_000)  # ~60/30/10 web/code/wiki
    out = mixture_sample(
        df, "source", {"web": 0.4, "code": 0.4, "wiki": 0.2}, total_rows=8_000
    ).toPandas()
    got = out.groupby("source").size()
    # web/code quotas (3200 each) are subsampled ~binomially; wiki quota
    # (1600) is below its ~3000 available, also subsampled
    for src, want in (("web", 3200), ("code", 3200), ("wiki", 1600)):
        assert abs(got[src] - want) / want < 0.1, (src, got[src])
    # a source too small for its quota is kept whole, not repeated
    tiny = mixture_sample(
        df, "source", {"wiki": 1.0}, total_rows=100_000
    ).toPandas()
    assert len(tiny) == (df.where("source = 'wiki'").count())


def test_md5_family_null_id_matches_sql_replay(spark):
    """A NULL id must hash to NULL under the md5 family (the DuckDB
    replay's `md5(CAST(id AS VARCHAR) || '|s')` is NULL), falling to
    the ELSE split label — never to a concrete hash bucket the oracle
    can't see."""
    import duckdb

    from pyspark.sql import functions as F
    from time2feat_spark.operators.sampling import deterministic_split

    df = spark.createDataFrame(
        [(1,), (2,), (None,)], "doc_id: bigint"
    )
    out = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(
            df, {"train": 0.5, "test": 0.5}, seed=7, hash_family="md5"
        ).collect()
    }
    want = dict(
        duckdb.sql(
            """
            SELECT doc_id,
                   CASE WHEN CAST(('0x' || substr(md5(
                            CAST(doc_id AS VARCHAR) || '|7'), 1, 15))
                            AS BIGINT) % 1000000 < 500000
                        THEN 'train' ELSE 'test' END AS split
            FROM (VALUES (1), (2), (NULL)) t(doc_id)
            """
        ).fetchall()
    )
    assert out == want
