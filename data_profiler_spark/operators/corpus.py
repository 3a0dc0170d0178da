"""Merged operator-parity corpus: name → (builder, oracle_sql | None).

Consumed by __spark_entry__.py (the driver contract) and
tools/parity_check.py (local pre-flight of the same comparison).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_profiler_spark.operators.corpus_engine import ENGINE_QUERIES
from data_profiler_spark.operators.corpus_relational import RELATIONAL_QUERIES
from data_profiler_spark.operators.corpus_reports import REPORT_QUERIES
from data_profiler_spark.operators.corpus_text import TEXT_QUERIES

CORPUS: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    **RELATIONAL_QUERIES,
    **REPORT_QUERIES,
    **TEXT_QUERIES,
    **ENGINE_QUERIES,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in CORPUS.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in CORPUS.items() if sql is not None}
