"""Scalable ordered-window building blocks.

`Window.orderBy(...)` with no `partitionBy` moves the ENTIRE dataset into a
single task — fine for a 20-row ladder, fatal for a 10^9-row Pareto ranking.
`distributed_cumsum` is the scale-safe replacement: a classic two-phase
parallel prefix sum expressed purely in the DataFrame API.

  phase 1  range-partition on the sort key (`repartitionByRange`) so every
           partition holds a contiguous, ordered slice of the key space;
           compute the running total WITHIN each partition via a window
           partitioned by `spark_partition_id()` (P parallel tasks).
  phase 2  per-partition grand totals form a P-row frame; an exclusive
           prefix over those P rows (trivial single-task window over P
           rows, P = O(cluster size)) yields each partition's offset,
           broadcast-joined back and added to the local running totals.

The range-partitioned frame is persisted (MEMORY_AND_DISK) before fanning
out to the two phases. This is load-bearing for correctness, not a cache
nicety: column pruning gives the two consumers *different* pruned schemas,
so Catalyst materializes two separate range exchanges rather than a
ReusedExchange — and each RangePartitioner samples its child independently.
Hash-aggregate output order is not deterministic across executions (shuffle
fetch order), so two samplings could pick different boundaries and misalign
the partition ids between the local-cumsum side and the offsets side.
Persisting pins both consumers to one materialized partitioning (one
partitioner, one boundary array). No rand() anywhere → resume-stable.

Reference analog: the hand-rolled sort+cumsum Pareto/velocity analysis in
apex-companies/data-profiler `services/transform_service.py:843-850` — which
is single-threaded pandas; this is its cluster-scale re-expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

_PID = "__dps_pid"


def distributed_cumsum(
    df: DataFrame,
    order_by: list[Column],
    values: list[str],
    num_partitions: int | None = None,
    include_total: bool = False,
) -> DataFrame:
    """Append `cum_<v>` running-total columns (and optionally `total_<v>`
    grand-total columns) for each v in `values`, ordered by `order_by`.

    `order_by` must be a TOTAL order (include a unique tie-breaker column):
    with ties straddling a range boundary the running total at the tied rows
    would otherwise depend on which side of the boundary they landed.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(n, *order_by)
        .withColumn(_PID, F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parted.select(
        "*", *[F.sum(v).over(w_local).alias(f"__local_{v}") for v in values]
    )

    totals = parted.groupBy(_PID).agg(
        *[F.sum(v).alias(f"__tot_{v}") for v in values]
    )
    # exclusive prefix over the P-row totals frame: single task over O(P)
    # rows by construction — this is the one place a global window is safe.
    w_prefix = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    off_cols = [
        F.coalesce(F.sum(f"__tot_{v}").over(w_prefix), F.lit(0)).alias(f"__off_{v}")
        for v in values
    ]
    if include_total:
        w_all = Window.partitionBy()  # still the P-row frame
        off_cols += [
            F.sum(f"__tot_{v}").over(w_all).alias(f"total_{v}") for v in values
        ]
    offsets = totals.select(_PID, *off_cols)

    out_cols = [F.col(c) for c in df.columns] + [
        (F.col(f"__local_{v}") + F.col(f"__off_{v}")).alias(f"cum_{v}")
        for v in values
    ]
    if include_total:
        out_cols += [F.col(f"total_{v}") for v in values]
    return local.join(F.broadcast(offsets), _PID).select(*out_cols)
