"""Custom stateful streaming operators (applyInPandasWithState).

`streaming_sessionize` is the canonical arbitrary-state operator the
built-in streaming aggregations can't express: gap-based sessions whose
CLOSE depends on what does NOT arrive. Per key, the open session lives
in the state store; sessions close either when a later event in the
same micro-batch exceeds the gap (emitted immediately) or when the
event-time watermark passes session_end + gap (event-time timeout).

Batch parity: the same gap rule as operators/asof.py::sessionize — a
closed session here equals one session group there (verified in
tests/test_streaming_stateful.py against the batch operator, including
a 200-case random-arrival-order fuzz). Parity is EXACT for every event
the watermark admits (r5 redesign): a session is emitted only once the
event-time watermark passes its end + gap — until then it stays in the
state store as a pending run, so an out-of-order event arriving in a
later micro-batch still merges/bridges pending runs exactly like the
batch rule (append-mode emissions never need retraction because nothing
is emitted while the watermark still allows a merge). The only
divergence from batch output is the inherent watermark contract: an
event older than the watermark is dropped by Spark before the state
function sees it. (The pre-r5 design emitted gap-closed sessions
immediately, which was final and could split sessions that bounded
disorder would later have bridged.)

Scale posture: state per key is the list of UNCONFIRMED session runs —
bounded by the watermark horizon (every run older than watermark - gap
is flushed on the next invocation), not by event count; the shuffle is
the standard streaming groupBy(key) exchange; Arrow batches stream
through the Python worker without materializing a partition, and new
events are run-compressed vectorized (numpy reduceat) before the
per-run merge sweep.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("session_start_ms", LongType()),
        StructField("session_end_ms", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_v", DoubleType()),
        StructField("closed_by", StringType()),  # gap | timeout
    ]
)

#: pending (watermark-unconfirmed) session runs, parallel arrays
STATE_SCHEMA = StructType(
    [
        StructField("starts", ArrayType(LongType())),
        StructField("ends", ArrayType(LongType())),
        StructField("ns", ArrayType(LongType())),
        StructField("sums", ArrayType(DoubleType())),
    ]
)


def _make_sessionize_fn(ts_col: str, val_col: str, gap_ms: int):
    """The applyInPandasWithState transition function, exposed as a
    factory so the order-fuzzing parity test can drive it through a
    simulated micro-batch/watermark harness without a streaming query
    per case (tests/test_streaming_stateful.py)."""

    def fn(key, pdf_iter, state: GroupState):
        # watermark-confirmed emission: every pending run lives in state
        # until wm passes its end + gap; until then ANY admitted event
        # can still merge into it, so nothing emitted ever needs
        # retraction and parity with the batch gap rule is exact
        wm = state.getCurrentWatermarkMs()
        pending = list(zip(*state.get)) if state.exists else []

        rows = []
        if not state.hasTimedOut:
            for pdf in pdf_iter:
                if len(pdf):
                    rows.append(pdf[[ts_col, val_col]])
        if rows:
            ev = pd.concat(rows, ignore_index=True).sort_values(ts_col)
            ts_ms = (
                ev[ts_col].astype("datetime64[ms]").astype("int64").to_numpy()
            )
            vals = ev[val_col].to_numpy(dtype=np.float64)
            # vectorized run-compression of the new events (no per-event
            # Python): split where the sorted gap exceeds gap_ms, then
            # per-run aggregates via reduceat
            cut = np.flatnonzero(np.diff(ts_ms) > gap_ms) + 1
            lo = np.concatenate(([0], cut))
            hi = np.concatenate((cut, [len(ts_ms)]))
            sums = np.add.reduceat(vals, lo)
            pending.extend(
                (int(ts_ms[a]), int(ts_ms[b - 1]), int(b - a), float(sv))
                for a, b, sv in zip(lo, hi, sums)
            )
        if not pending:
            if state.exists:
                state.remove()
            return

        # merge sweep over runs sorted by start (runs, not events): two
        # adjacent runs belong to one session iff start - prev_end <= gap
        pending.sort()
        merged = [pending[0]]
        for st, en, n, s in pending[1:]:
            pst, pen, pn, ps = merged[-1]
            if st - pen <= gap_ms:
                merged[-1] = (pst, max(pen, en), pn + n, ps + s)
            else:
                merged.append((st, en, n, s))

        label = "timeout" if state.hasTimedOut else "gap"
        out = [m for m in merged if m[1] + gap_ms < wm]
        keep = [m for m in merged if m[1] + gap_ms >= wm]
        if keep:
            state.update(tuple([list(c) for c in zip(*keep)]))
            # must be strictly above the current watermark or Spark
            # rejects it; the earliest pending confirmation otherwise
            state.setTimeoutTimestamp(
                max(wm + 1, min(m[1] + gap_ms for m in keep))
            )
        elif state.exists:
            state.remove()
        if out:
            yield pd.DataFrame(
                [
                    {
                        "key": key[0],
                        "session_start_ms": st,
                        "session_end_ms": en,
                        "n_events": n,
                        "sum_v": s,
                        "closed_by": label,
                    }
                    for st, en, n, s in out
                ]
            )

    return fn


def streaming_sessionize(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    gap_seconds: int,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Gap-based sessions over a stream; emits one row per CLOSED
    session (append mode). The open session per key persists in the
    state store with an event-time timeout at end + gap."""
    fn = _make_sessionize_fn(ts_col, val_col, gap_seconds * 1000)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


DEDUP_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def streaming_dedup(
    stream,
    id_col: str = "doc_id",
    text_col: str = "text",
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming exact deduplication: emit only the FIRST document ever
    seen for each content hash, across micro-batches and restarts (the
    state store persists seen-hashes in the checkpoint). The streaming
    face of `operators/dedup.dedup_resolve` — an ingestion pipeline
    drops repeats at arrival time instead of re-scanning the corpus.

    State is one long per DISTINCT content hash. Unbounded corpora need
    a bound: pass `ttl_minutes` to expire idle hashes via processing-
    time timeout (late repeats past the TTL are then re-admitted — the
    standard at-least-once dedup window trade-off); None keeps state
    forever (exact, state grows with distinct content).

    Emits (content_hash, doc_id of first occurrence, n_dups_in_batch =
    additional copies collapsed from the same micro-batch)."""
    from pyspark.sql import functions as F

    # keep the id's NATIVE type: min() below must agree with the batch
    # dedup_resolve rule (F.min on the typed column) — a string cast
    # would rank numeric ids lexicographically ('10' < '9')
    hashed = stream.select(
        F.xxhash64(F.col(text_col)).alias("content_hash"),
        F.col(id_col).alias("doc_id"),
    )
    output_schema = StructType(
        [
            StructField("content_hash", LongType()),
            StructField("doc_id", stream.schema[id_col].dataType),
            StructField("n_dups_in_batch", LongType()),
        ]
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n = 0
        first_id = None
        for pdf in pdf_iter:
            if len(pdf):
                # min over the batch, NOT first-row-of-first-chunk:
                # Arrow chunk order is shuffle-timing-dependent, and the
                # batch operator (dedup_resolve) keeps min(doc_id) — the
                # surviving id must be reproducible across replays
                m = pdf["doc_id"].min()
                first_id = m if first_id is None else min(first_id, m)
                n += len(pdf)
        already = state.exists
        if not already:
            state.update((1,))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60_000)
        if already or first_id is None:
            return
        yield pd.DataFrame(
            {
                "content_hash": [key[0]],
                "doc_id": [first_id],
                "n_dups_in_batch": [n - 1],
            }
        )

    return hashed.groupBy("content_hash").applyInPandasWithState(
        fn,
        output_schema,
        DEDUP_STATE_SCHEMA,
        "append",
        timeout,
    )
