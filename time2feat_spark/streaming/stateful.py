"""Custom stateful streaming operators (applyInPandasWithState).

`streaming_sessionize` is the canonical arbitrary-state operator the
built-in streaming aggregations can't express: gap-based sessions whose
CLOSE depends on what does NOT arrive. Per key, the open session lives
in the state store; sessions close either when a later event in the
same micro-batch exceeds the gap (emitted immediately) or when the
event-time watermark passes session_end + gap (event-time timeout).

Batch parity: the same gap rule as operators/asof.py::sessionize — a
closed session here equals one session group there (verified in
tests/test_streaming_stateful.py against the batch operator). Exact
parity under out-of-order arrival additionally requires a watermark
delay >= the true disorder bound: an event older than the watermark is
dropped by Spark before the state function sees it, and a gap-closed
session cannot reopen. Events inside the watermark are handled exactly:
ones within the gap of the open session merge (lowering
session_start_ms when they predate it), and ones MORE than the gap
before the open session's start form their own earlier session(s) —
gap-split among themselves, bridged into the open session only when the
run actually reaches within the gap — matching the batch rule instead
of silently widening the open session past its gap bound. One residual
divergence is inherent to append mode: a gap-closed early session is
emitted immediately and is FINAL, so if a subsequent micro-batch (still
inside the watermark) delivers an event that would bridge it to the
open session, batch sessionize merges them but the stream has already
split — emitted output cannot be retracted. Exactness therefore needs
the disorder bound to hold WITHIN the early-event runs too, not just
against the watermark.

Scale posture: state is one tiny tuple per ACTIVE key (not per event);
the shuffle is the standard streaming groupBy(key) exchange; Arrow
batches stream through the Python worker without materializing a
partition.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
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

STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("n", LongType()),
        StructField("s", DoubleType()),
    ]
)


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
    gap_ms = gap_seconds * 1000

    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            start, end, n, s = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "key": key[0],
                        "session_start_ms": start,
                        "session_end_ms": end,
                        "n_events": n,
                        "sum_v": s,
                        "closed_by": "timeout",
                    }
                ]
            )
            return

        rows = []
        for pdf in pdf_iter:
            if len(pdf):
                rows.append(pdf[[ts_col, val_col]])
        if not rows:
            return
        ev = pd.concat(rows, ignore_index=True).sort_values(ts_col)
        ts_ms = (
            ev[ts_col].astype("datetime64[ms]").astype("int64").to_numpy()
        )
        vals = ev[val_col].to_numpy()

        if state.exists:
            start, end, n, s = state.get
        else:
            start, end, n, s = int(ts_ms[0]), int(ts_ms[0]) - 1, 0, 0.0
        closed = []

        # Out-of-order events (inside the watermark) that predate the
        # open session's start must NOT be blindly min()-merged: an event
        # with t + gap < start belongs to an EARLIER session under the
        # batch gap rule. Build the early sessions first (gap-splitting
        # among themselves), then merge the stored open session with the
        # last early session only if they are within the gap — exact
        # batch parity for everything the watermark lets through.
        k = 0
        if n > 0:
            e_start = e_end = None
            e_n, e_s = 0, 0.0
            while k < len(ts_ms) and int(ts_ms[k]) < start:
                t = int(ts_ms[k])
                if e_n > 0 and t - e_end > gap_ms:
                    closed.append((key[0], e_start, e_end, e_n, e_s, "gap"))
                    e_n, e_s = 0, 0.0
                e_start = t if e_n == 0 else e_start
                e_end = t
                e_n += 1
                e_s += float(vals[k])
                k += 1
            if e_n > 0:
                if start - e_end <= gap_ms:
                    # bridge: the early run reaches the open session
                    start, n, s = e_start, n + e_n, s + e_s
                else:
                    closed.append((key[0], e_start, e_end, e_n, e_s, "gap"))

        for t, v in zip(ts_ms[k:], vals[k:]):
            t = int(t)
            if n > 0 and t - end > gap_ms:
                closed.append((key[0], start, end, n, s, "gap"))
                n, s = 0, 0.0
            start = t if n == 0 else start
            end = max(end, t)
            n += 1
            s += float(v)
        state.update((start, end, n, s))
        state.setTimeoutTimestamp(end + gap_ms)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "key", "session_start_ms", "session_end_ms",
                    "n_events", "sum_v", "closed_by",
                ],
            )

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
