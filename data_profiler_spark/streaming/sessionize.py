"""Stateful streaming sessionization (applyInPandasWithState).

Streaming counterpart of the batch ``sessionize_events`` corpus entry
(operators/corpus_relational.py — gap > ``gap_s`` starts a new session):
per-user state (last event epoch, session count, event count) carries
across micro-batches, so a session spanning two batches is counted once —
something no per-batch batch job can get right without re-reading history.

The reference has no streaming at all (SURVEY.md §2.9); this is the
custom-stateful-operator surface Spark mandates for such semantics
(``applyInPandasWithState``: Arrow-batched per-group pandas with explicit
GroupState, the UD5 discipline — no per-row Python outside the vectorized
callback).

Scale notes: state is per-user and O(1) (three scalars); the shuffle is
keyed by user_id exactly once per batch; skewed users cost state-store
lookups, not recompute. Event-time ordering inside a batch is enforced by
an explicit sort per group (file source gives no order guarantee).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id string, ts timestamp, user_id string, event_type string, "
    "value double, props string"
)
OUT_SCHEMA = "user_id string, n_sessions int, n_events long"
STATE_SCHEMA = "last_epoch long, n_sessions int, n_events long"


def _make_fn(gap_s: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_epoch, n_sessions, n_events = (
            state.get if state.exists else (None, 0, 0)
        )
        parts = [pdf for pdf in pdfs if len(pdf)]
        if parts:
            batch = pd.concat(parts).sort_values(["ts", "event_id"])
            epochs = (batch["ts"].astype("int64") // 1_000_000_000).to_numpy()
            for e in epochs:
                if last_epoch is None or e - last_epoch > gap_s:
                    n_sessions += 1
                last_epoch = int(e)
                n_events += 1
            state.update((last_epoch, n_sessions, n_events))
        yield pd.DataFrame(
            [{"user_id": key[0], "n_sessions": n_sessions, "n_events": n_events}]
        )

    return fn


def sessionize_stream(
    spark: SparkSession,
    input_path: str,
    checkpoint_dir: str,
    gap_s: int = 1800,
    timeout_sec: float | None = None,
) -> dict[str, Any]:
    """Drain all pending event files; returns {user_id: (n_sessions,
    n_events)} reflecting total state after this run."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_path)
    updated: dict[str, Any] = {}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        for r in batch_df.collect():
            updated[r["user_id"]] = (r["n_sessions"], r["n_events"])

    counts = events.groupBy("user_id").applyInPandasWithState(
        _make_fn(gap_s),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    q = (
        counts.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec) if timeout_sec else q.awaitTermination()
    return updated
