"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship query (per-partition verdict grid of the
                    validation engine) on /root/testdata/sf0.001.
queries()         — one entry per implemented operator family from
                    SURVEY.md §2 plus the training-data-pipeline operators
                    (dedup / similarity / text) — see
                    data_profiler_spark/operators/corpus*.py.
oracle_sql()      — matching DuckDB SQL for every entry except the three
                    binary-payload rows-only tails: audio_decode_stats
                    (PCM fidelity pytest-verified at SNR ≥ 30 dB,
                    tests/test_audio.py), media_decode_stats (r5: real
                    BMP encode→decode→stats through the multimodal
                    registry incl. seeded corruption violations;
                    pixel-exact round-trips pytest-verified in
                    tests/test_imagecodec.py), and video_frame_stats
                    (r5: real uncompressed-AVI encode→decode→frame-sample→
                    image-stats chain incl. seeded corruption;
                    bit-exact round-trips pytest-verified in
                    tests/test_videocodec.py). The HLL/GK sketch entries
                    are oracled since r3: exact counterpart values
                    hash-match DuckDB and the sketch error bounds are
                    verified in-plan (booleans pinned true by the oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_profiler_spark.operators import corpus


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: constraint verdict grid (per-partition pass/fail +
    violation counts) over sf0.001 — the engine's core output shape."""
    return corpus.CORPUS["verdict_grid"][0](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return corpus.queries()


def oracle_sql() -> dict[str, str]:
    return corpus.oracle_sql()
