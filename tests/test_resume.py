"""T-resume (SURVEY.md §5): kill the ladder job after k units, resume,
and verify the output table is identical to an uninterrupted run, with
checkpoint lineage populated. Also exercises incremental watermark runs
(append-only input -> only new docs processed) and the skew-salted
write path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from time2feat_spark.generator import gen_pandas
from time2feat_spark.operators.rollup import RollupConfig
from time2feat_spark.plans.checkpoint import Manifest, snapshot_id
from time2feat_spark.plans.ladder_job import LadderJob

CFG = RollupConfig(tiers=[("1m", 60), ("1h", 3600)], include_raw=False)


def _write_input(spark, path, n):
    spark.createDataFrame(gen_pandas(0, n)).write.mode("overwrite").parquet(path)


def _table(spark, root) -> pd.DataFrame:
    df = (
        spark.read.option("basePath", root)
        .parquet(root)
        .select("source", "doc_id", "tier", "window_start", "count", "mean",
                "feat.variance", "feat.median")
        .toPandas()
    )
    return df.sort_values(["source", "doc_id", "tier", "window_start"]).reset_index(
        drop=True
    )


def test_resume_after_partial_run(spark, tmp_path):
    inp = str(tmp_path / "seq")
    _write_input(spark, inp, 400)

    full = LadderJob(spark, inp, str(tmp_path / "full"), CFG)
    r = full.run()
    assert r["pending"] == 0 and not r["skipped"]

    part = LadderJob(spark, inp, str(tmp_path / "partial"), CFG)
    r1 = part.run(max_units=3)  # simulate a crash after 3 units
    assert len(r1["processed"]) == 3 and r1["pending"] > 0
    r2 = part.run()  # resume
    assert set(r2["skipped"]) == set(r1["processed"])
    assert r2["pending"] == 0

    a = _table(spark, str(tmp_path / "full"))
    b = _table(spark, str(tmp_path / "partial"))
    pd.testing.assert_frame_equal(a, b)


def test_manifest_lineage_and_metrics(spark, tmp_path):
    inp = str(tmp_path / "seq")
    _write_input(spark, inp, 200)
    job = LadderJob(spark, inp, str(tmp_path / "out"), CFG)
    job.run()
    recs = Manifest(str(tmp_path / "out")).records()
    assert recs
    snap = snapshot_id(inp)
    done = [r for r in recs if r.status == "done"]
    started = [r for r in recs if r.status == "started"]
    # write-ahead protocol: every unit logs intent before mutating output
    assert {r.unit for r in started} == {r.unit for r in done}
    for rec in done:
        assert rec.input_snapshot_id == snap
        assert rec.rollup_watermark.startswith("doc_")
        assert rec.rows_in > 0 and rec.windows_out > 0 and rec.points > 0
        assert rec.bytes_compressed > 0 and rec.wall_ms >= 0


def test_rerun_is_noop_until_snapshot_changes(spark, tmp_path):
    inp = str(tmp_path / "seq")
    _write_input(spark, inp, 150)
    job = LadderJob(spark, inp, str(tmp_path / "out"), CFG)
    r1 = job.run()
    r2 = job.run()
    assert not r2["processed"] and len(r2["skipped"]) == len(r1["processed"])


def test_incremental_watermark_appends_only_new_docs(spark, tmp_path):
    inp = str(tmp_path / "seq")
    _write_input(spark, inp, 150)
    out = str(tmp_path / "out")
    job = LadderJob(spark, inp, out, CFG)
    job.run(incremental=True)

    # append 50 new docs (same generator => append-only, increasing doc_id)
    spark.createDataFrame(gen_pandas(150, 200)).write.mode("append").parquet(inp)
    r = LadderJob(spark, inp, out, CFG).run(incremental=True)
    assert r["processed"]  # changed units re-ran (snapshot moved)

    got = _table(spark, out)
    ref_job = LadderJob(spark, inp, str(tmp_path / "ref"), CFG)
    ref_job.run()
    want = _table(spark, str(tmp_path / "ref"))
    pd.testing.assert_frame_equal(got, want)


def test_incremental_crash_between_write_and_manifest(spark, tmp_path):
    """Kill-and-resume identity for the WORST crash window: after an
    incremental increment is appended to the output but before its 'done'
    manifest record lands. Without the started-tombstone protocol the
    resume re-appends the same doc_id > watermark slice (duplicate
    windows); with it, the dangling unit is rebuilt by full overwrite."""
    inp = str(tmp_path / "seq")
    _write_input(spark, inp, 150)
    out = str(tmp_path / "out")
    LadderJob(spark, inp, out, CFG).run(incremental=True)

    spark.createDataFrame(gen_pandas(150, 200)).write.mode("append").parquet(inp)

    class CrashAfterFirstWrite(Exception):
        pass

    job = LadderJob(spark, inp, out, CFG)
    orig_append = job.manifest.append
    state = {"writes": 0}

    def crashing_append(rec):
        if rec.status == "done":
            state["writes"] += 1
            if state["writes"] == 1:
                raise CrashAfterFirstWrite()  # data written, record lost
        orig_append(rec)

    job.manifest.append = crashing_append
    with pytest.raises(CrashAfterFirstWrite):
        job.run(incremental=True)

    r = LadderJob(spark, inp, out, CFG).run(incremental=True)  # resume
    assert r["pending"] == 0

    got = _table(spark, out)
    ref_job = LadderJob(spark, inp, str(tmp_path / "ref"), CFG)
    ref_job.run()
    want = _table(spark, str(tmp_path / "ref"))
    pd.testing.assert_frame_equal(got, want)


def test_salted_write_spreads_hot_source(spark, tmp_path):
    """The Zipf-heavy source must be written by multiple salted tasks."""
    import glob

    inp = str(tmp_path / "seq")
    _write_input(spark, inp, 600)
    out = str(tmp_path / "out")
    LadderJob(spark, inp, out, CFG, rows_per_task=50).run()
    hot_files = glob.glob(f"{out}/source=src_0/tier=1m/window_day=*/part-*.parquet")
    assert len(hot_files) >= 3, f"expected salted parallel files, got {len(hot_files)}"


def test_compaction_shrinks_files_preserves_data(spark, tmp_path):
    """plans/compaction: after a salted run plus an incremental append,
    leaves hold many small files; compact_all must reduce to
    files_per_partition per leaf and leave the table contents
    bit-identical."""
    from time2feat_spark.plans.compaction import _parquet_files, compact_all

    inp = str(tmp_path / "seq")
    out = str(tmp_path / "out")
    _write_input(spark, inp, 300)
    job = LadderJob(spark, inp, out, CFG, rows_per_task=40)  # heavy salting
    job.run()
    # incremental append piles more files into the same leaves
    spark.createDataFrame(gen_pandas(300, 420)).write.mode("append").parquet(inp)
    job.run(incremental=True)

    before_files = len(_parquet_files(out))
    before = _table(spark, out)
    res = compact_all(spark, out, files_per_partition=1)
    after_files = len(_parquet_files(out))
    assert after_files < before_files, (before_files, after_files)
    assert all(r["files_after"] <= r["files_before"] for r in res.values())
    after = _table(spark, out)
    pd.testing.assert_frame_equal(before, after)
    # idempotent: second pass is a no-op
    res2 = compact_all(spark, out, files_per_partition=1)
    assert all(r["rows"] is None for r in res2.values())


def test_run_compact_postpass(spark, tmp_path):
    """run(compact=True) owns the small-file fix at the production entry
    point: after an incremental append, every leaf of each processed
    source holds <= files_per_partition files, the data is unchanged,
    and the rewrite is recorded in the manifest (status='compacted',
    namespaced unit key so unit state/watermarks are untouched)."""
    import glob
    import os

    inp = str(tmp_path / "seq")
    out = str(tmp_path / "out")
    _write_input(spark, inp, 300)
    job = LadderJob(spark, inp, out, CFG, rows_per_task=40)  # heavy salting
    job.run(incremental=True)
    before = _table(spark, out)
    spark.createDataFrame(gen_pandas(300, 420)).write.mode("append").parquet(inp)
    r = LadderJob(spark, inp, out, CFG, rows_per_task=40).run(
        incremental=True, compact=True, files_per_partition=1
    )
    assert r["processed"] and "compaction" in r
    # every leaf of every processed source is at the target file count
    for unit in r["processed"]:
        for leaf in glob.glob(f"{out}/{unit}/tier=*/window_day=*"):
            files = [f for f in os.listdir(leaf) if f.endswith(".parquet")]
            assert len(files) <= 1, (leaf, files)
    # data identical to an uninterrupted non-compacted rebuild
    ref = LadderJob(spark, inp, str(tmp_path / "ref"), CFG)
    ref.run()
    pd.testing.assert_frame_equal(_table(spark, out), _table(spark, str(tmp_path / "ref")))
    assert len(_table(spark, out)) > len(before)
    # manifest records the rewrite without disturbing unit state
    recs = Manifest(out).records()
    crec = [r2 for r2 in recs if r2.status == "compacted"]
    assert crec and all(r2.unit.startswith("compaction:source=") for r2 in crec)
    # unit state intact: a rerun still skips everything
    r3 = LadderJob(spark, inp, out, CFG).run(incremental=True)
    assert not r3["processed"] and r3["pending"] == 0


def test_read_tier_range_prunes_partitions(spark, tmp_path):
    """read_tier_range must equal a full-scan filter AND carry the
    window_day bound as a partition filter (pruned at planning time)."""
    inp = str(tmp_path / "seq")
    out = str(tmp_path / "out")
    _write_input(spark, inp, 200)
    job = LadderJob(spark, inp, out, CFG)
    job.run()

    import pyspark.sql.functions as SF2

    full = job.read_output()
    lo = full.where(SF2.col("tier") == "1m").agg(
        SF2.min(SF2.unix_millis("window_start"))
    ).first()[0]
    t0 = int(lo) + 60_000  # one minute past the earliest window
    t1 = t0 + 7_200_000
    got = job.read_tier_range("1m", t0, t1).select(
        "source", "doc_id", "window_start", "count"
    ).toPandas().sort_values(["source", "doc_id", "window_start"])
    import pyspark.sql.functions as SF

    want = full.where(
        (SF.col("tier") == "1m")
        & (SF.unix_millis("window_start") >= t0)
        & (SF.unix_millis("window_start") < t1)
    ).select("source", "doc_id", "window_start", "count").toPandas(
    ).sort_values(["source", "doc_id", "window_start"])
    assert len(got) == len(want) and len(got) > 0
    assert (got.reset_index(drop=True) == want.reset_index(drop=True)).all().all()
    plan = job.read_tier_range("1m", t0, t1)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "PartitionFilters" in plan and "window_day" in plan.split(
        "PartitionFilters"
    )[1][:300]
