"""Deterministic sampling and splitting for training-data curation.

Every operator here is HASH-deterministic, not RNG-based: a row's fate
depends only on its id (plus an explicit seed), never on partitioning,
task retries, or engine version — the property training pipelines
actually need (re-running the pipeline reproduces the identical split;
adding data never reshuffles old rows between splits; an audit can
recompute any row's assignment by hand). Spark's `rand()` guarantees
none of that under retries/repartitioning.

Default hashing is `xxhash64(id, seed)` taken `pmod` a fixed resolution
— one JVM expression, no shuffle for split/mixture; `sample_per_group`
needs the one shuffle its per-group top-k inherently requires.
`hash_family='md5'` switches every operator to the cross-engine
`functions/hashing.py::md5_64` family (~3x the CPU of xxhash64) so an
external SQL engine can replay the exact assignment:

  Spark : pmod(md5_64(concat_ws('|', id, seed)), 1000000)
  DuckDB: CAST(('0x' || substr(md5(id || '|' || seed), 1, 15)) AS
          BIGINT) % 1000000          (md5_64 is 60-bit, always >= 0)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.hashing import md5_64

#: hash-bucket resolution for split/sampling thresholds (1 ppm grain)
_RES = 1_000_000


def _hash(id_col: str, seed: int, hash_family: str) -> Column:
    if hash_family == "md5":
        # F.concat (null-propagating), NOT concat_ws (which skips NULLs):
        # the documented DuckDB replay `md5(CAST(id AS VARCHAR) || '|s')`
        # yields NULL for a NULL id, and the Spark side must agree —
        # concat_ws would silently hash the bare seed instead and assign
        # the row a concrete bucket the oracle never sees
        return md5_64(
            F.concat(F.col(id_col).cast("string"), F.lit(f"|{seed}"))
        )
    return F.xxhash64(F.col(id_col), F.lit(seed))


def _bucket(id_col: str, seed: int, hash_family: str = "xxhash64"):
    return F.pmod(_hash(id_col, seed, hash_family), F.lit(_RES))


def deterministic_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
    out_col: str = "split",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Assign every row a split label ("train"/"val"/...) with the given
    proportions by hashing its id into [0, 1) — stable across runs,
    partitionings, and data growth (new rows never move old rows).
    Weights must sum to ~1; label order follows dict insertion order so
    the cut points are reproducible."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = _bucket(id_col, seed, hash_family)
    expr = None
    acc = 0.0
    labels = list(weights)
    for name in labels[:-1]:
        acc += weights[name]
        cut = int(round(acc * _RES))
        case = F.when(b < cut, F.lit(name))
        expr = case if expr is None else expr.when(b < cut, F.lit(name))
    expr = (
        F.lit(labels[0]) if expr is None else expr.otherwise(F.lit(labels[-1]))
    )
    return df.withColumn(out_col, expr)


def sample_fraction(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: int = 0,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Keep ~fraction of rows, hash-deterministically (a row is kept in
    EVERY run with the same seed, and a kept row stays kept when other
    rows are added — unlike df.sample). No shuffle."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.where(
        _bucket(id_col, seed, hash_family) < int(round(fraction * _RES))
    )


def sample_per_group(
    df: DataFrame,
    key_cols: list[str],
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """EXACTLY min(k, group size) rows per group, chosen by hash order —
    a deterministic reservoir ('give me 1000 docs per language'). One
    shuffle on the group key; `WindowGroupLimit` caps the per-group sort
    at k rows, so no group is fully sorted."""
    w = Window.partitionBy(*key_cols).orderBy(
        _hash(id_col, seed, hash_family), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def mixture_sample(
    df: DataFrame,
    source_col: str,
    target_weights: dict[str, float],
    total_rows: int,
    id_col: str = "doc_id",
    seed: int = 0,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Down-sample each source so the result approximates `total_rows`
    rows distributed per `target_weights` — training-mixture shaping
    ('20% code, 30% web, ...'). Per-source fractions come from one
    count pass; the keep decision is the hash threshold (no shuffle on
    the data path, row counts binomial around the target). Sources
    missing from the weights are dropped; a source too small for its
    quota is kept whole (fraction capped at 1 — the standard epoch-
    repeat decision is left upstream)."""
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    b = _bucket(id_col, seed, hash_family)
    keep = None
    for src, cut in mixture_thresholds(
        counts, target_weights, total_rows
    ).items():
        cond = (F.col(source_col) == src) & (b < cut)
        keep = cond if keep is None else keep | cond
    return df.where(keep if keep is not None else F.lit(False))


def mixture_thresholds(
    counts: dict[str, int],
    target_weights: dict[str, float],
    total_rows: int,
) -> dict[str, int]:
    """The keep-threshold arithmetic of `mixture_sample`, exposed so an
    external replay (e.g. a SQL oracle embedding the cuts as literals)
    shares the EXACT float ops and Python half-even int(round()) by
    construction — SQL round() is half-away-from-zero, so re-deriving
    the cuts engine-side would drift on exact .5 boundaries."""
    total_w = sum(target_weights.values())
    out = {}
    for src, wgt in target_weights.items():
        want = total_rows * (wgt / total_w)
        have = counts.get(src, 0)
        frac = min(want / have, 1.0) if have else 0.0
        out[src] = int(round(frac * _RES))
    return out
