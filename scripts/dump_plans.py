#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans of the headline
queries, trimmed to the operator tree + per-scan pushdown evidence."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def fmt(spark, df):
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    tree, _, details = p.partition("\n\n")
    keep = []
    for block in details.split("\n\n"):
        block = block.strip("\n")
        head = block.split("\n")[0]
        if "Scan parquet" in head:
            lines = [
                l
                for l in block.split("\n")
                if re.match(
                    r"\(\d+\) Scan|ReadSchema|PushedFilters|DataFilters"
                    r"|PartitionFilters",
                    l.strip(),
                )
            ]
            keep.append("\n".join(lines))
    return tree.strip() + ("\n\n" + "\n\n".join(keep) if keep else "")


def main() -> None:
    from time2feat_spark.generator import write_sequences
    from time2feat_spark.operators.rollup import rollup_sequences
    from time2feat_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark("plans", master="local[8]",
                      extra={"spark.ui.enabled": "false"})
    seq_path = "/tmp/t2f_plans/sequences"
    if not os.path.exists(seq_path):
        write_sequences(spark, seq_path, 500)
    lad = rollup_sequences(spark.read.parquet(seq_path))

    from time2feat_spark.plans.ladder_job import LadderJob
    from time2feat_spark.plans.router import aggregate_range

    ladder_out = "/tmp/t2f_plans/ladder_out"
    job = LadderJob(spark, seq_path, ladder_out)
    job.run()  # resumable: done units are skipped on re-invocation
    t_lo = job.read_output().where("tier = '1d'").agg(
        {"window_start": "min"}
    ).first()[0]
    start = (int(t_lo.timestamp() * 1000) // 21_600_000) * 21_600_000
    _, routed = aggregate_range(job, start, start + 86_400_000, 21_600)

    sections = [
        ("Sequences tier ladder (`rollup_sequences`) — the flagship",
         "Zero exchanges: every tier is emitted from one pass over the "
         "token arrays.", fmt(spark, lad)),
        ("Events rollup (`rollup_points` via rollup_1h_basic)",
         "ONE exchange on (key, coarsest-chunk); scan reads only "
         "(ts, event_type, value) with null/NaN filters pushed down; "
         "kernel stage streams sorted groups.",
         fmt(spark, E.q_rollup_1h_basic(spark, SF))),
        ("MinHash near-duplicates (`minhash_near_dups`)",
         "Banding self-join on (band_id, band_hash) — candidates only; "
         "signature pipeline cached.",
         fmt(spark, E.q_minhash_near_dups(spark, SF))),
        ("Banded-LSH top-k (`lsh_topk`)",
         "Corpus scan + broadcast query bands; candidate dedup is the "
         "only shuffle.", fmt(spark, E.q_lsh_topk(spark, SF))),
        ("Broadcast join chain (`revenue_by_nation`)",
         "Dimension tables broadcast; no shuffle on the fact side before "
         "partial agg.", fmt(spark, E.q_revenue_by_nation(spark, SF))),
        ("Routed 6h aggregate (`plans/router.aggregate_range`)",
         "Continuous-aggregate dispatch (r4): a 6h-resolution range is "
         "answered from the 1h tier — the scan carries BOTH the tier and "
         "the window_day bounds as PartitionFilters (planning-time "
         "directory pruning), re-aggregation is one partial+final "
         "HashAggregate over 6 windows per bucket; raw points are never "
         "read.", fmt(spark, routed)),
        ("IVF top-k at rest (`ivf_topk_at_rest`)",
         "The 100 TB ANN read path (r4): corpus laid out "
         "`partitionBy(cell)`; the probed cells are a LITERAL "
         "`cell IN (...)` resolved against the directory listing at "
         "planning time — see PartitionFilters on the scan; unprobed "
         "cells are never opened.",
         fmt(spark, E.q_ivf_topk_at_rest(spark, SF))),
        ("Embedding near-duplicates (`embedding_near_dups`)",
         "Verify-once (r3): the candidate-pair aggregate "
         "(HashAggregate/dedup on id_a,id_b) sits BELOW the exact-cosine "
         "projection, so a pair colliding in m bands pays the verify "
         "once; banded rows are localCheckpoint-ed (auto-reclaimed).",
         fmt(spark, E.q_embedding_near_dups(spark, SF))),
        ("Bucketized interval join (`interval_join`)",
         "Range join WITHOUT the BroadcastNestedLoopJoin cliff (r5 "
         "driver-gated): intervals explode to their covered coarse "
         "buckets, events join their single bucket — look for a hash "
         "join on (user_id, _bucket) and NO NestedLoop operator; the "
         "exact range predicate filters inside the bucket.",
         fmt(spark, E.q_interval_join(spark, SF))),
        ("Misra-Gries heavy hitters (`heavy_hitters_tokens`)",
         "Two-pass top-k (r5 driver-gated): pass 1 is a MapInPandas "
         "candidate summary per partition (bounded O(c) state, no "
         "shuffle), pass 2 recounts ONLY the candidates via "
         "BroadcastHashJoin LeftSemi — the full token key space is "
         "never shuffled.",
         fmt(spark, E.q_heavy_hitters_tokens(spark, SF))),
        ("Deterministic split (`deterministic_split`)",
         "Hash-bucketed train/val/test assignment (r5 driver-gated, "
         "md5_64 family): a pure projection over the scan — zero "
         "exchanges, trivially scale-free.",
         fmt(spark, E.q_deterministic_split(spark, SF))),
        ("Repetition features (`repetition_features`)",
         "Gopher signals (r5 driver-gated): line stats are pure array "
         "expressions in the scan's projection (duplicate lines via "
         "array_sort, O(L log L) per doc — linearized in r5); the "
         "n-gram coverage is explode -> two-level HashAggregate keyed "
         "on (doc, n, gram) with map-side partials.",
         fmt(spark, E.q_repetition_features(spark, SF))),
        ("Benchmark decontamination (`decontaminate`)",
         "Eval-set n-gram flagging (r5): the eval gram set is DISTINCT-"
         "collapsed and BROADCAST — look for BroadcastHashJoin LeftOuter "
         "on the gram key; the corpus is never exchanged on grams, its "
         "only shuffle is the per-doc de-dup aggregate keyed on doc_id.",
         fmt(spark, E.q_decontaminate(spark, SF))),
        ("HyperLogLog distinct (`hll_distinct_users`)",
         "Mergeable sketch shape (r5): partial HashAggregate to (key, "
         "bucket) registers — <= 64 rows per key survive the exchange "
         "regardless of input size — then a 64-row final agg; the exact "
         "count_distinct rides the same scan for comparison.",
         fmt(spark, E.q_hll_distinct_users(spark, SF))),
        ("BM25 retrieval (`bm25_dbterms`)",
         "Query-term filter lives INSIDE the explode projection (only "
         "candidate postings are aggregated); (N, avgdl) corpus stats "
         "and the per-term df are broadcast; final top-k is "
         "TakeOrderedAndProject, no global sort.",
         fmt(spark, E.q_bm25_dbterms(spark, SF))),
        ("ExactSubstr token-window dedup (`token_window_dups`)",
         "Runs hashed scan-side; ONE exchange on the run hash where a "
         "count window tags global multiplicity (look for a single "
         "Exchange + Window, no self-join re-scan of the lineage), "
         "then the doc-keyed summary.",
         fmt(spark, E.q_token_window_dups(spark, SF))),
        ("Count-Min estimates (`cms_token_estimates`)",
         "Sketch built in one map-side-combined exchange (d cells per "
         "value exploded in the scan projection); lookup broadcasts the "
         "bounded d*w cell table against the probes.",
         fmt(spark, E.q_cms_token_estimates(spark, SF))),
        ("Curation pipeline (`curation_pipeline`)",
         "Four chained stages in ONE plan: quality rules ride the scan "
         "projection; dedup keepers and the split are hash-side "
         "aggregates/projections; decontamination contributes its "
         "broadcast gram join — stages fuse instead of materializing "
         "between steps.",
         fmt(spark, E.q_curation_pipeline(spark, SF))),
        ("SemDeDup (`semantic_dedup`)",
         "Within-cell self-join (r5): cell assignment is a scan-side "
         "Arrow matmul (ArrowEvalPython below the scan, no shuffle); "
         "the pair join exchanges on `cell` only, bounding candidates "
         "at sum(cell^2) — the SemDeDup argument.",
         fmt(spark, E.q_semantic_dedup(spark, SF))),
    ]
    out = [
        "# PLANS — physical plans of the headline queries (generated)",
        "",
        "Regenerate with `python scripts/dump_plans.py`. What to look for:",
        "`Exchange` count (shuffles), `PushedFilters`/`ReadSchema` on scans",
        "(pushdown + pruning), `WholeStageCodegen` spans (JVM-side exprs).",
        "",
    ]
    for title, note, plan in sections:
        out += [f"## {title}", "", note, "", "```", plan, "```", ""]
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md regenerated")
    spark.stop()


if __name__ == "__main__":
    main()
