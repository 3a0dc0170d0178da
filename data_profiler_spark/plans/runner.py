"""ValidationRun — the end-to-end suite: profile + constraints + drift +
verdicts + manifest, as one lazy Spark DAG per run.

This is the distributed re-expression of the reference's upload pipeline
(`DataProfiler.transform_and_upload_data`, data_profiler.py:302-393 →
`DataDirectory.read_and_validate_file_contents`, data_directory.py:176-392):
the reference validates eagerly, file by file, fail-fast on the first FK
error; here every check is declared lazily over the clips table, verdicts
come back from one aggregated pass, and fail-fast is a driver decision on
the (tiny) verdict frame.

Dataflow (all checks share ONE decode pass and ONE persisted stats frame):

    clips ──filter(pending partitions)──► salt_repartition
          ──► decode_stats (mapInPandas, bytes dropped after)  [persist]
          ├─► constraint violations (union of anti-joins/filters)
          ├─► per-partition column profile (single fused agg)
          ├─► dur_ms histogram → PSI/KS vs baseline snapshot
          └─► verdicts (checks × partitions grid vs violation counts)

Key scale property: duplicate keys hash to the same partition_id
(pmod(xxhash64(key), n)), so per-partition uniqueness verdicts are exact
even under resume — a duplicate can never straddle a completed and a
pending partition undetected unless it was already detected when the first
partition completed.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from data_profiler_spark.audio import decode_stats, salt_repartition
from data_profiler_spark.checks import (
    check_decodable,
    check_dur_consistency,
    check_pk_not_null,
    check_referential,
    check_unique,
    verdicts,
    with_partition_id,
)
from data_profiler_spark.checks.constraints import check_not_null
from data_profiler_spark.drift import ks_binned, psi
from data_profiler_spark.plans.manifest import Manifest
from data_profiler_spark.profiling import column_profile, histogram
from data_profiler_spark.schemas import VERDICT_SCHEMA, VIOLATION_SCHEMA
from data_profiler_spark.sources.tableio import TableIO

PROFILE_COLUMNS = ["clip_id", "sr_hz", "dur_ms", "codec", "transcript"]
STATS_PROFILE_COLUMNS = ["decoded_ms", "rms", "peak", "clip_ratio", "zero_cross_rate"]
DUR_HIST_BINS = 40


@dataclass
class RunResult:
    snapshot_id: str
    partitions_processed: list[int]
    rows: int
    verdicts: DataFrame
    violations: DataFrame
    profile: DataFrame
    drift: DataFrame | None
    clips_per_sec: float
    wall_sec: float
    all_passed: bool = field(init=False)

    def __post_init__(self) -> None:
        self.all_passed = self.verdicts.filter(~F.col("passed")).isEmpty()


class ValidationRun:
    def __init__(
        self,
        spark: SparkSession,
        io: TableIO,
        n_partitions: int = 32,
        dur_tol_ms: float = 5.0,
        psi_threshold: float = 0.25,
        ks_threshold: float = 0.2,
    ):
        self.spark = spark
        self.io = io
        self.n_partitions = n_partitions
        self.dur_tol_ms = dur_tol_ms
        self.psi_threshold = psi_threshold
        self.ks_threshold = ks_threshold
        self.manifest = Manifest(io, spark)

    # -- baseline snapshot ---------------------------------------------------
    def write_baseline(self, clips: DataFrame) -> None:
        """Persist the drift baseline: dur_ms histogram with fixed edges."""
        hist = histogram(clips, "dur_ms", lo=0.0, hi=16000.0, nbins=DUR_HIST_BINS)
        self.io.overwrite(hist, "baseline_hist")

    # -- main entry ----------------------------------------------------------
    def run(
        self,
        clips: DataFrame,
        transcripts: DataFrame | None = None,
        limit_partitions: int | None = None,
    ) -> RunResult:
        """Validate all partitions not yet in the manifest.

        ``limit_partitions`` caps how many pending partitions this run
        processes — used by the resume test to simulate a killed job.
        """
        t0 = time.monotonic()
        clips = with_partition_id(clips, self.n_partitions)

        done = self.manifest.completed_partitions()
        pending = sorted(set(range(self.n_partitions)) - done)
        if limit_partitions is not None:
            pending = pending[:limit_partitions]
        if not pending:
            empty_v = self.spark.createDataFrame([], VIOLATION_SCHEMA)
            empty_verd = self.spark.createDataFrame([], VERDICT_SCHEMA)
            empty_prof = self.spark.createDataFrame([], "partition_id int, column string, metric string, value double")
            return RunResult("", [], 0, empty_verd, empty_v, empty_prof, None, 0.0, 0.0)

        # At 10^12 scale partition_id is the Iceberg partition column and this
        # filter is partition pruning; locally it's a pushed-down predicate.
        if done or limit_partitions is not None:
            clips = clips.filter(F.col("partition_id").isin(pending))

        # One decode pass, salted against dur/codec skew, bytes dropped after.
        salted = salt_repartition(
            clips.select("clip_id", "bytes", "sr_hz", "codec", "dur_ms", "partition_id"),
            self.spark.sparkContext.defaultParallelism * 2,
        )
        stats = decode_stats(salted, passthrough=["dur_ms", "partition_id"])
        stats.persist(StorageLevel.MEMORY_AND_DISK)

        narrow = clips.drop("bytes")

        # -- constraint checks (names drive the verdict grid) ----------------
        n = self.n_partitions
        checks: list[tuple[str, DataFrame]] = [
            ("pk_not_null", check_pk_not_null(narrow)),
            ("pk_unique", check_unique(narrow, n_partitions=n)),
            ("audio_decodable", check_decodable(stats)),
            ("dur_ms_consistent", check_dur_consistency(stats, tol_ms=self.dur_tol_ms)),
            ("transcript_not_null", check_not_null(narrow, "transcript")),
        ]
        if transcripts is not None:
            checks.append(
                ("clip_has_transcript",
                 check_referential(narrow, transcripts, key="clip_id",
                                   name="clip_has_transcript",
                                   detail="clip has no transcript row",
                                   n_partitions=n)))
            checks.append(
                ("transcript_has_clip",
                 check_referential(transcripts, narrow, key="clip_id",
                                   name="transcript_has_clip",
                                   detail="transcript row has no clip",
                                   n_partitions=n)))

        check_names = [n for n, _ in checks]
        all_violations = checks[0][1]
        for _, v in checks[1:]:
            all_violations = all_violations.unionByName(v)
        all_violations = all_violations.persist(StorageLevel.MEMORY_AND_DISK)

        totals = self._totals(narrow)
        verdict_df = verdicts(all_violations, totals, check_names)

        # -- per-partition profile (one fused agg over narrow columns) -------
        prof_clips = column_profile(narrow, PROFILE_COLUMNS, group_cols=["partition_id"])
        prof_stats = column_profile(
            stats.filter(F.col("decode_ok")), STATS_PROFILE_COLUMNS, group_cols=["partition_id"]
        )
        profile = prof_clips.unionByName(prof_stats)

        # -- drift vs persisted baseline -------------------------------------
        drift = None
        if self.io.exists(self.spark, "baseline_hist"):
            base = self.io.read(self.spark, "baseline_hist")
            cur = histogram(narrow, "dur_ms", lo=0.0, hi=16000.0, nbins=DUR_HIST_BINS)
            drift = (
                psi(cur, base)
                .join(ks_binned(cur, base), "column", "full_outer")
                .withColumn("psi_passed", F.col("psi") <= self.psi_threshold)
                .withColumn("ks_passed", F.col("ks_d") <= self.ks_threshold)
            )

        # -- commit outputs, then the manifest (crash-safe ordering): every
        # output row carries this run's snapshot id; a crash before the
        # manifest commit leaves orphan rows that reads filter out by
        # joining on manifest snapshot ids.
        snap = uuid.uuid4().hex[:16]
        tag = F.lit(snap).alias("snapshot_id")
        self.io.append(profile.select(tag, "*"), "profile")
        self.io.append(all_violations.select(tag, "*"), "violations")
        self.io.append(verdict_df.select(tag, "*"), "verdicts")
        if drift is not None:
            self.io.append(drift.select(tag, "*"), "drift")

        per_part = {r["partition_id"]: r["rows_checked"] for r in totals.collect()}
        viol_per_part = {
            r["partition_id"]: r["n"]
            for r in all_violations.groupBy("partition_id").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        rows = int(sum(per_part.values()))
        wall_ms = int((time.monotonic() - t0) * 1000)
        part_stats = [
            {
                "partition_id": p,
                "rows": per_part.get(p, 0),
                "metrics": {"violations": int(viol_per_part.get(p, 0))},
            }
            for p in pending
        ]
        self.manifest.commit(part_stats, snap, wall_ms)

        stats.unpersist()
        wall = time.monotonic() - t0
        return RunResult(
            snapshot_id=snap,
            partitions_processed=pending,
            rows=rows,
            verdicts=verdict_df,
            violations=all_violations,
            profile=profile,
            drift=drift,
            clips_per_sec=rows / wall if wall > 0 else 0.0,
            wall_sec=wall,
        )

    def _totals(self, narrow: DataFrame) -> DataFrame:
        return narrow.groupBy("partition_id").agg(F.count(F.lit(1)).alias("rows_checked"))


def summarize(result: RunResult) -> str:
    v = result.verdicts.groupBy("check_name").agg(
        F.min("passed").alias("passed"), F.sum("violation_count").alias("violations")
    )
    lines = [f"snapshot={result.snapshot_id} partitions={len(result.partitions_processed)} "
             f"rows={result.rows} clips/sec={result.clips_per_sec:.0f}"]
    for r in v.collect():
        lines.append(f"  {r['check_name']}: {'PASS' if r['passed'] else 'FAIL'} ({r['violations']} violations)")
    return "\n".join(lines)
