"""Approximate distinct counting: a deterministic, mergeable
HyperLogLog built from cross-engine-replayable primitives.

Why in-repo instead of `F.approx_count_distinct`: Spark's builtin HLL++
state is opaque (no stable cross-engine definition, no partial you can
persist next to tier tables), while a training-data pipeline wants
distinct-user / distinct-token cardinalities maintained INCREMENTALLY
alongside the rollup ladder — i.e. a register table you can merge with
`max` per bucket, exactly like the sketch cascade in
`operators/sketch_rollup.py` merges histograms (SURVEY.md §2.4
"aggregations maintained under appends").

Construction (Flajolet et al., "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm", AofA 2007):

- hash each value with the md5_64 family (`functions/hashing.py` — the
  only hash DuckDB replays bit-identically, CLAUDE.md invariant) into
  60 positive bits;
- bucket = low 6 bits (m = 64 registers), w = the remaining 54 bits;
- rho(w) = position of the highest set bit from the top of the 54-bit
  window = 55 - bitlength(w) (so rho in [1, 55], rho = 55 for w = 0) —
  bitlength is `length(bin(w))` in BOTH Spark and DuckDB, no
  float log2 (whose ulp errors would flip floor() across engines);
- register M_j = max rho over the bucket, estimate
  alpha_64 * m^2 / sum_j 2^(-M_j) with the standard small-range
  linear-counting correction E <= 2.5m -> m * ln(m / V).

Every step is integer/exact-dyadic arithmetic except the final ln/
divide, which gets the repo's round_bin double-rounding — so the DuckDB
oracle reproduces the ESTIMATE value-exactly, not just approximately.

Scale shape: one map-side-combinable groupBy to (keys, bucket) — 64
rows per key regardless of input size — then a 64-row-per-key final
agg. The partial (`hll_partial`) is a persistable register table;
appending a day of data = partial over the new rows + `hll_merge` —
no rescan of history. This is the sketch-cascade posture the tier
ladder uses for quantiles, applied to cardinality.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.hashing import md5_64, sql_md5_64
from ..functions.rounding import round2

M = 64          # registers (b = 6 bucket bits)
ALPHA = 0.709   # alpha_m for m = 64 (HLL paper, Fig. 3)
RHO_MAX = 55    # 54 payload bits -> rho in [1, 55]


def _rho(w: Column) -> Column:
    """Leading-zero rank of the 54-bit payload via bitlength — exact
    integer arithmetic on both engines (F.bin / DuckDB bin)."""
    return F.when(w == 0, F.lit(RHO_MAX)).otherwise(
        F.lit(RHO_MAX) - F.length(F.bin(w))
    )


def hll_partial(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    seed: int = 0,
) -> DataFrame:
    """Register table: (keys..., bucket, m) with m = max rho per bucket.
    <= 64 rows per key group; partials from disjoint inputs merge with
    `hll_merge` (register max is associative/commutative/idempotent, so
    re-processing a chunk is harmless — same crash-safety argument as
    the ladder's overwrite-per-unit sink)."""
    h = md5_64(F.concat(F.col(value_col).cast("string"), F.lit(f"|{seed}")))
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*key_cols, h.alias("_h"))
        .groupBy(*key_cols, F.col("_h").bitwiseAND(F.lit(M - 1)).alias("bucket"))
        .agg(F.max(_rho(F.shiftright(F.col("_h"), 6))).alias("m"))
    )


def hll_merge(*partials: DataFrame) -> DataFrame:
    """Union register tables and re-max — the append path."""
    out = partials[0]
    for p in partials[1:]:
        out = out.unionByName(p)
    keys = [c for c in out.columns if c not in ("m",)]
    return out.groupBy(*keys).agg(F.max("m").alias("m"))


def hll_estimate(registers: DataFrame, key_cols: list[str]) -> DataFrame:
    """Cardinality estimate per key group from a register table.

    sum_j 2^(-M_j) over ALL m=64 registers: absent buckets contribute
    2^0 = 1 each (V of them), which is also the linear-counting V."""
    agg = registers.groupBy(*key_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("_s_used"),
        F.count(F.lit(1)).alias("_nb"),
    )
    v = F.lit(M) - F.col("_nb")                      # empty registers
    s = F.col("_s_used") + v.cast("double")          # exact dyadic sum
    raw = F.lit(ALPHA * M * M) / s
    est = F.when(
        (raw <= F.lit(2.5 * M)) & (v > 0),
        F.lit(float(M)) * F.log(F.lit(float(M)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *key_cols, round2(est, 7, 4).alias("hll_estimate")
    )


def hll_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    seed: int = 0,
) -> DataFrame:
    """One-shot approx distinct per key group: partial -> estimate."""
    return hll_estimate(hll_partial(df, key_cols, value_col, seed), key_cols)


def sql_hll_distinct(
    table: str, key_cols: list[str], value_col: str, seed: int = 0
) -> str:
    """The DuckDB replay of `hll_distinct` — register-for-register."""
    keys = ", ".join(key_cols)
    h = sql_md5_64(f"CAST({value_col} AS VARCHAR) || '|{seed}'")
    return f"""
WITH hv AS (SELECT {keys}, {h} AS h FROM {table}
            WHERE {value_col} IS NOT NULL),
reg AS (SELECT {keys}, h & {M - 1} AS bucket,
               max(CASE WHEN (h >> 6) = 0 THEN {RHO_MAX}
                        ELSE {RHO_MAX} - length(bin(h >> 6)) END) AS m
        FROM hv GROUP BY ALL),
agg AS (SELECT {keys}, sum(power(2.0, -m)) AS s_used,
               count(*) AS nb FROM reg GROUP BY ALL)
SELECT {keys},
       round(round(CASE WHEN {ALPHA * M * M} / (s_used + ({M} - nb))
                             <= {2.5 * M} AND nb < {M}
                        THEN {float(M)} * ln({float(M)} / ({M} - nb))
                        ELSE {ALPHA * M * M} / (s_used + ({M} - nb))
                   END, 7), 4) AS hll_estimate
FROM agg
""".strip()


def hll_error_bound(m: int = M) -> float:
    """Theoretical relative standard error 1.04/sqrt(m) (paper Thm 1)."""
    return 1.04 / math.sqrt(m)
