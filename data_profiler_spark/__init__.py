"""data_profiler_spark — a PySpark-native schema + constraint validation engine.

A from-scratch re-expression of the capabilities of the reference
``apex-companies/data-profiler`` (a single-process pandas ETL/profiling tool)
as an idiomatic Spark engine designed for 10^12-row Iceberg tables of audio
clip + transcript pairs:

- per-column statistics (count / null-rate / min / max / approx-quantiles /
  HyperLogLog distinct) — see :mod:`data_profiler_spark.profiling`
- constraint checks (uniqueness, PK null/empty, referential integrity,
  type/consistency conformance) — see :mod:`data_profiler_spark.checks`
- distribution-drift tests (PSI / KS vs a baseline profile snapshot) —
  see :mod:`data_profiler_spark.drift`
- vectorized audio decode + per-clip stats through ``mapInPandas`` (Arrow
  batches, zero per-row Python) — see :mod:`data_profiler_spark.audio`
- resumable per-partition manifest with lineage + metrics — see
  :mod:`data_profiler_spark.plans`

Everything is pure public PySpark DataFrame API + pandas/Arrow UDFs; no
custom Catalyst rules are required (SURVEY.md §4.3).
"""

__version__ = "0.1.0"

from data_profiler_spark.session import get_spark  # noqa: F401
