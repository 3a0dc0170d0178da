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

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from data_profiler_spark.sources.tableio import ParquetTableIO, TableIO

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
    io: TableIO | None = None,
    table: str = "sessions",
) -> DataFrame:
    """Drain all pending event files; each micro-batch's per-user session
    state is UPSERTED into ``table`` through the TableIO seam (keyed by
    user_id — update mode emits only users touched by the batch), and the
    table is returned as a DataFrame.

    No driver-side collect anywhere: r2 shipped a dict-accumulating
    foreachBatch sink, which funnels every batch's per-user aggregate
    through the driver — a driver-OOM at 10^9 users. The sink now writes
    distributed; callers that want a small dict use :func:`sessions_dict`,
    which is guarded. Replayed batches re-upsert the same rows —
    idempotent, matching the engine's batch-id discipline
    (stream_validate.py)."""
    if io is None:
        io = ParquetTableIO(os.path.join(checkpoint_dir, "_tables"))
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_path)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        io.upsert(batch_df, table, key="user_id")

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
    if not io.exists(spark, table):  # zero batches drained → typed empty frame
        return spark.createDataFrame([], OUT_SCHEMA)
    return io.read(spark, table)


def sessions_dict(sessions: DataFrame, max_rows: int = 100_000) -> dict[str, tuple]:
    """{user_id: (n_sessions, n_events)} for metadata-sized session tables.
    Bounded like sinks/report.py's cell guard: one limit(max_rows+1).collect()
    (single action — no count-then-collect race) that refuses oversized
    frames instead of flattening the driver."""
    rows = sessions.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"session table exceeds {max_rows} rows; read it as a DataFrame "
            "instead of collecting a dict"
        )
    return {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in rows}
