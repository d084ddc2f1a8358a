"""Deduplication operators for large-scale training-data pipelines.

All hot-path expressions are JVM-side built-ins (whole-stage codegen):
shingling via substring/transform, hashing via xxhash64, MinHash via
array_min over transform — no Python in the per-row path. The only Python
is driver-side plan construction.

Scale notes (100 TB posture):
- exact_dedup: one shuffle on the content hash; map-side partial agg
  collapses duplicates before the exchange.
- minhash_lsh: signatures are computed scan-side; the only shuffle is the
  (band_id, band_hash) self-group. Band count tunes recall/cost. Candidate
  verification joins only within buckets (skew-safe: bucket sizes are
  bounded by near-dup cluster sizes, and AQE splits stragglers).
- simhash: one aggregate-free scan; near-dup = hamming distance on int64.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.rounding import round2

MERSENNE = (1 << 61) - 1


def _shingles(text: Column, k: int) -> Column:
    """Character k-shingles as an array of xxhash64 values (JVM-side)."""
    n = F.greatest(F.length(text) - F.lit(k - 1), F.lit(0))
    idx = F.sequence(F.lit(1), n)  # empty when text shorter than k
    return F.transform(idx, lambda i: F.xxhash64(text.substr(i, F.lit(k))))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: group by content hash, keep the smallest id.
    Returns (text_hash, keeper_id, dup_count)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    num_perm: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Add a `minhash` array<long> column: per permutation j, min over
    shingle hashes h of xxhash64(seed, j, h) — a seeded hash family in
    place of the classic (a*h+b) mod p, entirely JVM-side."""
    sh = _shingles(F.col(text_col), shingle_k)
    df = df.withColumn("_sh", sh)

    def perm(j: int):
        return lambda h: F.xxhash64(F.lit(seed), F.lit(j), h)

    sig = F.array(
        *[F.array_min(F.transform(F.col("_sh"), perm(j))) for j in range(num_perm)]
    )
    return df.withColumn("minhash", sig).drop("_sh")


def minhash_lsh_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """LSH banding: rows (band_id, band_hash, id). Docs sharing a
    (band_id, band_hash) are near-dup candidates."""
    assert num_perm % bands == 0
    r = num_perm // bands
    sig = minhash_signature(df, text_col, num_perm, shingle_k, seed)
    rows = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band_id"),
                F.xxhash64(
                    F.slice(F.col("minhash"), bi * r + 1, r).cast("string")
                ).alias("band_hash"),
            )
            for bi in range(bands)
        ]
    )
    return (
        sig.select(F.col(id_col).alias("id"), F.explode(rows).alias("b"))
        .select("id", "b.band_id", "b.band_hash")
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    min_jaccard: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Candidate pairs from LSH buckets, verified with exact shingle-set
    Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b."""
    buckets = minhash_lsh_buckets(df, text_col, id_col, num_perm, bands, shingle_k, seed)
    pairs = (
        buckets.alias("x")
        .join(
            buckets.alias("y"),
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_hash") == F.col("y.band_hash"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    sh = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(_shingles(F.col(text_col), shingle_k)).alias("shset"),
    )
    return (
        pairs.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("shset", "sa"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("shset", "sb"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sa", "sb"))
            / F.size(F.array_union("sa", "sb")),
        )
        .where(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", round2(F.col("jaccard"), 7, 4).alias("jaccard"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    min_jaccard: float = 0.8,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard above a threshold (for modest inputs
    or as the verify stage after LSH pruning at scale)."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(_shingles(F.col(text_col), shingle_k)).alias("shset"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (
                F.size(F.array_intersect("a.shset", "b.shset"))
                / F.size(F.array_union("a.shset", "b.shset"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", round2(F.col("jaccard"), 7, 4).alias("jaccard"))
    )


def simhash(df: DataFrame, text_col: str = "text", bits: int = 64) -> DataFrame:
    """Add a `simhash` int64 column: sign of per-bit votes over whitespace
    token hashes. Pure JVM expressions (aggregate over the token array)."""
    toks = F.transform(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.xxhash64(t)
    )
    def bit_vote(b: int):
        return F.aggregate(
            toks,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    sim = F.aggregate(
        F.array(*[
            F.when(bit_vote(b) > 0, F.lit(1).cast("long") * (2 ** b) if b < 63
                   else F.lit(-(2 ** 63)).cast("long")).otherwise(F.lit(0).cast("long"))
            for b in range(bits)
        ]),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseXOR(x),
    )
    return df.withColumn("simhash", sim)


def hamming64(a: Column, b: Column) -> Column:
    """Popcount of a XOR b via bit_count (Spark 3.3+)."""
    return F.bit_count(a.bitwiseXOR(b))
