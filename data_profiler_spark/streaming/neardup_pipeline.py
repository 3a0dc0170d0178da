"""End-to-end streaming near-dup pipeline: mark → verify → drop.

``stream_neardup.mark_near_dups_stream`` emits banded CANDIDATE markings;
its design note promises verification before any drop decision. This module
is that promised composition, runnable (jobs/stream_neardup_docs.py wraps
it for spark-submit):

1. LAND: every arriving doc appends to the corpus landing table
   (``<out>/landing``) — the stream's raw record, nothing dropped here.
2. MARK: ``mark_near_dups_stream`` holds band-key state across
   micro-batches and emits (doc_id, matched_doc_id, band_id, ...) marking
   rows for banded collisions inside the watermark.
3. VERIFY (foreachBatch): each marking micro-batch is verified with exact
   Jaccard against the landing table (``stream_neardup.verify_markings`` →
   the candidate-bounded ``dedup.lsh_verified_near_dups``). Pairs at or
   above ``threshold`` append a DROP DECISION row to ``<out>/drops``:
   (drop_id = the unordered pair's GREATER id, kept_id, jaccard) — the
   same keep-the-minimum convention as the batch job's component-min
   canonicals. A banded false positive fails verification and appends
   NOTHING: marked, never dropped.
4. ``kept_docs`` = landing anti-join drops — the post-dedup corpus view.

Failure semantics (deliberately conservative): if a marked doc's text has
not landed yet when its marking batch verifies (the two queries are
independent; a race is possible under continuous triggers), the pair finds
no shingles and is NOT verified — the doc is KEPT. A lost drop is
recoverable by re-running verification at reconcile time (the markings are
persisted under ``<out>/markings``); a wrong drop would not be. With
``availableNow`` drains (the sandbox/test mode and the job default) the
land query is drained before the mark query, so the race cannot occur.

Scale: landing is a plain append sink; verification is bounded by
|markings in the batch| × shingles-per-doc (candidate-bounded, never
corpus-quadratic); drops is metadata-scale. The landing read inside
foreachBatch is column-pruned to (id, text) and filtered by a semi-join
against the batch's marked ids before shingling.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_profiler_spark.streaming.stream_neardup import (
    mark_near_dups_stream,
    verify_markings,
)

DOC_SCHEMA = "doc_id string, text string, event_time timestamp"


def _read_if_exists(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a parquet table that may legitimately not exist yet (no batch
    has written it). Only the missing-path condition maps to None; any
    other read failure (corrupt footer, transient FS error) re-raises —
    swallowing it would silently skip verification or resurrect dropped
    docs, against the engine's disclosed-never-silent contract."""
    try:
        return spark.read.parquet(path)
    except AnalysisException as exc:
        # 'no rows yet' has TWO Spark conditions: the dir doesn't exist
        # (no batch ever wrote), or a streaming file sink created the dir
        # + _spark_metadata at query start but no file has committed yet
        # (continuous-trigger race the module docstring documents) — that
        # reads as unable-to-infer-schema, not PATH_NOT_FOUND. Spark 4.1
        # still raises the latter under its legacy error template
        # (_LEGACY_ERROR_TEMP_1134); accept the named condition too for
        # when it graduates.
        if exc.getCondition() in (
            "PATH_NOT_FOUND",
            "UNABLE_TO_INFER_SCHEMA",
            "_LEGACY_ERROR_TEMP_1134",
        ):
            return None
        raise


def _await_drained(query, timeout_sec: int, what: str) -> None:
    """awaitTermination with the timeout treated as an ERROR, not a soft
    continue: each availableNow drain must fully land before the next
    query starts (the module docstring's no-race guarantee depends on it),
    and the job reads kept/dropped counts only after both queries finish."""
    if not query.awaitTermination(timeout_sec):
        query.stop()
        raise TimeoutError(
            f"{what} drain did not finish within {timeout_sec}s; outputs "
            "would be incomplete — raise timeout_sec or reduce the backlog"
        )


def _verify_and_record(
    out_root: str, threshold: float, shingle_k: int
):
    """foreachBatch body: verify one micro-batch of markings against the
    landing table; append verified drop decisions."""

    def fn(markings: DataFrame, batch_id: int) -> None:
        spark = markings.sparkSession
        markings.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            f"{out_root}/markings"
        )
        landing = _read_if_exists(spark, f"{out_root}/landing")
        if landing is None:  # no docs landed yet: nothing to verify against
            return
        marked_ids = (
            markings.select(F.col("doc_id").alias("doc_id"))
            .unionByName(markings.select(F.col("matched_doc_id").alias("doc_id")))
            .distinct()
        )
        docs = landing.select("doc_id", "text").join(marked_ids, "doc_id", "left_semi")
        verified = verify_markings(
            markings, docs, shingle_k=shingle_k, threshold=threshold
        )
        # unordered pair (id_a=least, id_b=greatest) → drop the greater,
        # keep the lesser (batch component-min convention)
        decisions = verified.select(
            F.col("id_b").alias("drop_id"),
            F.col("id_a").alias("kept_id"),
            "jaccard",
            F.lit(batch_id).alias("batch_id"),
        )
        decisions.write.mode("append").parquet(f"{out_root}/drops")

    return fn


def drain_once(
    spark: SparkSession,
    input_dir: str,
    out_root: str,
    watermark: str = "1 hour",
    threshold: float = 0.5,
    shingle_k: int = 3,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    timeout_sec: int = 300,
) -> None:
    """One availableNow drain cycle of both queries: land first (so the
    verifier can always see the batch's texts), then mark+verify."""
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(input_dir)
    land_q = (
        stream.writeStream.format("parquet")
        .option("path", f"{out_root}/landing")
        .option("checkpointLocation", f"{out_root}/_cp_land")
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(land_q, timeout_sec, "landing")

    marks = mark_near_dups_stream(
        spark.readStream.schema(DOC_SCHEMA).parquet(input_dir),
        watermark=watermark,
        num_hashes=num_hashes,
        rows_per_band=rows_per_band,
        shingle_k=shingle_k,
    )
    verify_q = (
        marks.writeStream.foreachBatch(
            _verify_and_record(out_root, threshold, shingle_k)
        )
        .option("checkpointLocation", f"{out_root}/_cp_mark")
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(verify_q, timeout_sec, "mark+verify")


def kept_docs(spark: SparkSession, out_root: str) -> DataFrame:
    """The post-dedup corpus view: landed docs minus verified drops."""
    landing = spark.read.parquet(f"{out_root}/landing")
    drops = _read_if_exists(spark, f"{out_root}/drops")
    if drops is None:  # nothing dropped yet
        return landing
    return landing.join(
        drops.select(F.col("drop_id").alias("doc_id")), "doc_id", "left_anti"
    )
