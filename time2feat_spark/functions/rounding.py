"""Binary-exact rounding expression.

Spark's F.round rounds the shortest decimal representation of a double
(BigDecimal.valueOf), while DuckDB/numpy round the exact binary value —
the two disagree whenever the true value ends exactly in ...5 at the
target digit. Cross-engine comparisons (the driver's DuckDB oracle) need
the binary behavior, so every user-facing rounded column in this engine
uses sign(x) * floor(|x| * 10^d + 0.5) / 10^d, which is bit-identical to
DuckDB's round (std::round(x*10^d)/10^d).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def round_bin(c: Column, d: int) -> Column:
    s = F.lit(float(10**d))
    scaled = c * s
    return F.floor(F.abs(scaled) + F.lit(0.5)) * F.signum(scaled) / s


def round2(c: Column, inner: int, outer: int) -> Column:
    """Double rounding: inner round collapses float noise from differing
    summation orders before the outer round decides the boundary."""
    return round_bin(round_bin(c, inner), outer)
