"""Tier-aware query routing: answer from the coarsest sufficient tier.

The classic continuous-aggregate read mechanic (TimescaleDB continuous
aggregates / Druid query granularity): a dashboard asks for a time
range at a target resolution, and the engine picks the COARSEST
materialized tier whose window width still satisfies that resolution —
at 100 TB the difference between scanning raw points and reading 1d
rollup windows is 4-5 orders of magnitude of IO, and the choice must be
automatic so zooming never needs query rewrites. Reference scope: the
tier ladder (north_rule) exists exactly so reads can be answered from
rollups; this module is the read-side dispatch over
`LadderJob.read_tier_range` (window_day partition pruning on every
path).

Raw fidelity comes from the compressed store itself: when the request
is finer than the finest windowed tier, the finest tier's Gorilla
blocks are decoded back to points (`operators/rollup.tier_points`) and
filtered exactly — still partition-pruned to the requested days, never
a raw-table scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.rollup import RollupConfig, tier_points

MS_PER_DAY = 86_400_000


def windowed_tiers(cfg: RollupConfig) -> list[tuple[str, int]]:
    """(name, seconds) of the time-windowed tiers, finest first. The
    `raw` tier is whole-series blocks (windows all start at the series
    epoch), so it is not a routing candidate — point-resolution requests
    decode the finest windowed tier instead, which holds the identical
    samples and prunes by day."""
    return sorted(cfg.tiers, key=lambda t: t[1])


def choose_tier(cfg: RollupConfig, resolution_sec: float) -> str | None:
    """Coarsest tier whose window width <= the requested resolution;
    None when the request is finer than every windowed tier (caller
    routes to points)."""
    best = None
    for name, sec in windowed_tiers(cfg):
        if sec <= resolution_sec:
            best = name
    return best


def route_range(
    job,
    start_ms: int,
    end_ms: int,
    resolution_sec: float,
    sources: list[str] | None = None,
    cfg: RollupConfig | None = None,
) -> tuple[str, DataFrame]:
    """Windows of the coarsest sufficient tier for [start_ms, end_ms),
    day-partition-pruned. Returns (tier_name, DataFrame); tier_name is
    "points" when the request is finer than the finest windowed tier
    (the DataFrame is then decoded points: key cols + ts_ms + value)."""
    cfg = cfg or job.cfg
    tier = choose_tier(cfg, resolution_sec)
    if tier is None:
        return "points", route_points(job, start_ms, end_ms, sources, cfg)
    return tier, job.read_tier_range(tier, start_ms, end_ms, sources)


def route_points(
    job,
    start_ms: int,
    end_ms: int,
    sources: list[str] | None = None,
    cfg: RollupConfig | None = None,
) -> DataFrame:
    """Exact raw points in [start_ms, end_ms) decoded from the FINEST
    windowed tier's Gorilla blocks. The day bound prunes partitions; the
    window bound is widened to whole windows of that tier (a point lives
    in exactly one window, so decoding the covering windows and
    filtering ts exactly loses nothing and reads no raw table)."""
    cfg = cfg or job.cfg
    name, sec = windowed_tiers(cfg)[0]
    w_ms = sec * 1000
    lo = (start_ms // w_ms) * w_ms
    hi = -(-end_ms // w_ms) * w_ms
    windows = job.read_tier_range(name, lo, hi, sources)
    pts = tier_points(windows, key_cols=["source", "doc_id"])
    return pts.where(
        (F.col("ts_ms") >= start_ms) & (F.col("ts_ms") < end_ms)
    ).drop("tier")
