"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k with the dot product as a JVM
expression (F.aggregate over zip_with — stays in whole-stage codegen, no
Python). Scale path: random-hyperplane LSH bucketing so candidate
generation is a bucket-equijoin instead of a cross join, with exact
cosine re-ranking inside buckets.

100 TB posture: queries are broadcast (small side); the corpus scan is
embarrassingly parallel. For LSH, bucket cardinality is the shuffle key —
hyperplane count tunes bucket size; multi-probe (flipping low-margin
bits) would raise recall without growing the corpus-side shuffle.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.rounding import round2


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. Queries are broadcast; ties broken by
    corpus id so results are deterministic."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(vec_col).alias("_qvec")
        )
    )
    sim = (
        corpus.select(F.col(id_col), F.col(vec_col).alias("_cvec"))
        .crossJoin(q)
        .withColumn(
            "cos_sim",
            round2(cosine(F.col("_cvec"), F.col("_qvec")).cast("double"), 9, 6),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def hyperplane_signatures(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Add `lsh_bucket` (int64): sign bits of projections onto seeded
    random hyperplanes. Projections are JVM dot products against literal
    plane arrays (no Python, no shuffle)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0).cast("long")
    for b in range(n_planes):
        plane = F.array(*[F.lit(float(v)) for v in planes[b]])
        bit = (dot(F.col(vec_col).cast("array<double>"), plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, b)
    return df.withColumn("lsh_bucket", bucket)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket;
    exact cosine re-rank inside the bucket."""
    c = hyperplane_signatures(corpus, vec_col, dim, n_planes, seed).select(
        F.col(id_col), F.col(vec_col).alias("_cvec"), "lsh_bucket"
    )
    q = hyperplane_signatures(queries, vec_col, dim, n_planes, seed).select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec"), "lsh_bucket"
    )
    sim = (
        c.join(F.broadcast(q), "lsh_bucket")
        .withColumn(
            "cos_sim",
            round2(cosine(F.col("_cvec"), F.col("_qvec")).cast("double"), 9, 6),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.95,
    dim: int = 64,
    n_planes: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH buckets + exact verify."""
    sig = hyperplane_signatures(df, vec_col, dim, n_planes, seed).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "lsh_bucket"
    )
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(b, (F.col("a.lsh_bucket") == F.col("b.lsh_bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .withColumn(
            "cos_sim",
            round2(cosine(F.col("a.v"), F.col("b.v")).cast("double"), 9, 6),
        )
        .where(F.col("cos_sim") >= min_cosine)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cos_sim")
    )
