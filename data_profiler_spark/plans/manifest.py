"""Resumable per-partition manifest.

The reference only gestures at this: "keep track … pick up where it left
off. For now, just delete" (/root/reference/data_profiler/services/
transform_service.py:213-214) and instead runs a compensating delete on
failure (data_profiler.py:374-379). Here it is real: one manifest row per
completed logical partition — (partition_id, snapshot_id, status, rows,
metrics_json, wall_ms) — and a restart anti-joins pending partitions against
completed ones (the same J7 left_anti pattern the engine uses for
referential integrity, turned on ourselves; SURVEY.md §4.3).

Output tables written by an interrupted run carry its snapshot_id; since
the manifest row for a partition is committed only *after* its outputs, a
crash leaves orphan output rows that are filtered out at read time by
joining on manifest snapshot ids — i.e. reads are snapshot-consistent
without any compensating delete.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from data_profiler_spark.functions.frames import local_frame
from data_profiler_spark.schemas import MANIFEST_SCHEMA
from data_profiler_spark.sources.tableio import TableIO

MANIFEST_TABLE = "manifest"


class Manifest:
    def __init__(self, io: TableIO, spark: SparkSession, table: str = MANIFEST_TABLE):
        """``table`` namespaces the lineage: batch runs use the default
        'manifest'; the streaming path writes 'manifest_stream' so a later
        batch run's completed_partitions() never skips logical partitions
        that a micro-batch only ever validated for a subset of rows
        (streaming/stream_validate.py)."""
        self.io = io
        self.spark = spark
        self.table = table

    def completed_partitions(self) -> set[int]:
        if not self.io.exists(self.spark, self.table):
            return set()
        rows = (
            self.io.read(self.spark, self.table)
            .filter("status = 'done'")
            .select("partition_id")
            .distinct()
            .collect()
        )
        return {r[0] for r in rows}

    def completed_snapshot_ids(self) -> set[str]:
        if not self.io.exists(self.spark, self.table):
            return set()
        rows = (
            self.io.read(self.spark, self.table)
            .filter("status = 'done'")
            .select("snapshot_id")
            .distinct()
            .collect()
        )
        return {r[0] for r in rows}

    def completed_batch_ids(self) -> set[int]:
        """Stream idempotence: batch ids recorded in metrics_json by
        validate_stream — a micro-batch replayed after a crash that already
        committed its manifest rows is skipped instead of re-appended."""
        if not self.io.exists(self.spark, self.table):
            return set()
        rows = (
            self.io.read(self.spark, self.table)
            .filter("status = 'done'")
            .select("metrics_json")
            .collect()
        )
        out: set[int] = set()
        for r in rows:
            b = json.loads(r[0] or "{}").get("stream_batch_id")
            if b is not None:
                out.add(int(b))
        return out

    def commit(
        self,
        partition_stats: list[dict],
        snapshot_id: str,
        wall_ms: int,
    ) -> None:
        """Record completed partitions. ``partition_stats``: one dict per
        partition with keys partition_id / rows / metrics."""
        rows = [
            (
                int(p["partition_id"]),
                snapshot_id,
                "done",
                int(p.get("rows", 0)),
                json.dumps(p.get("metrics", {}), sort_keys=True),
                int(wall_ms),
            )
            for p in partition_stats
        ]
        df = local_frame(self.spark, rows, MANIFEST_SCHEMA)
        self.io.append(df, self.table)
