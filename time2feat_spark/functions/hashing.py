"""Cross-engine hash family.

The engine's default shingle/token hash is Spark's xxhash64 (fastest
JVM built-in, whole-stage codegen) — but it has no DuckDB equivalent,
so operators hashed with it can only get rows-only driver checks.
`md5_64` is the oracle-able alternative: a 60-bit integer from the md5
hex prefix, bit-identical in both engines:

  Spark : conv(substring(md5(x), 1, 15), 16, 10)::long
  DuckDB: CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)

60 bits (15 hex digits) keeps the value positive in a signed int64 on
both sides. Hash-quality-wise md5 is a fine LSH family; it is ~3x the
CPU of xxhash64, so it is opt-in via hash_family='md5' where an
external SQL oracle must replicate the computation.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def md5_64(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_md5_64(expr: str) -> str:
    """The DuckDB-side rendering of the same hash."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
