"""Event-time windowed profiling with late-data handling.

The reference is batch-only (SURVEY.md §2.9); its Describer summarizes a
whole file at once (data_profiler.py:503-601). On a lake where clips/events
land continuously, the same per-column summary becomes a *windowed
streaming aggregation*:

    readStream ──withWatermark(ts, delay)──► groupBy(window(ts, size))
               ──► count / mean / stddev / min / max / null-count per column

Semantics (all from Structured Streaming's native stateful agg — no custom
state):
- the watermark bounds state: a window's accumulator is dropped once the
  watermark (max event time − delay) passes its end, so state is
  O(open windows × columns), never O(events);
- rows later than the watermark are EXCLUDED (the documented trade: a
  bounded-state stream cannot wait forever; pick ``delay`` ≥ the real
  pipeline's tail latency);
- in append output mode a window emits exactly once, when it closes —
  downstream sinks get final, immutable per-window profile rows (the same
  shape as the batch profile, plus window_start/window_end).

This composes with the drift operators: each emitted window row set is a
current histogram/profile to compare against the persisted baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_profile(
    stream_df: DataFrame,
    ts_col: str,
    value_cols: list[str],
    window_size: str = "1 minute",
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """Per-window column stats over an event-time stream (works identically
    on a batch DataFrame, where it degenerates to a plain window groupBy —
    pytest exercises both and asserts they agree for on-time data)."""
    aggs = []
    for c in value_cols:
        aggs += [
            F.count(c).alias(f"{c}_n"),
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}_nulls"),
            F.round(F.avg(c), 6).alias(f"{c}_mean"),
            F.round(F.stddev_pop(c), 6).alias(f"{c}_std"),
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
        ]
    src = stream_df
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark_delay)
    return (
        src.groupBy(F.window(F.col(ts_col), window_size).alias("w"))
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *[F.col(f) for f in (f"{c}_{m}" for c in value_cols for m in ("n", "nulls", "mean", "std", "min", "max"))],
        )
    )
