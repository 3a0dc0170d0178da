"""Driver-local metadata frames, Arrow-backed.

``spark.createDataFrame(list_of_rows, schema)`` parallelizes PICKLED Python
rows: every downstream job then evaluates the scan through Python workers
(EvaluatePython), costing ~3-5s per write of even a 448-row verdict grid on
this sandbox (measured; the range()-backed equivalent writes in 0.2s).
Routing through pandas takes the Arrow conversion path instead — the rows
become a JVM local relation and no Python worker ever touches them again.

Used for all metadata-sized outputs (verdict grids, profiles, manifests,
drift scores); never for data-sized frames, which should stay in Spark from
their source.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def local_frame(spark: SparkSession, rows: list, schema) -> DataFrame:
    """createDataFrame for small driver-side row lists via the Arrow path.

    ``rows``: list of dicts or tuples (pandas handles both); ``schema``: a
    StructType or DDL string, always explicit (no inference drift). Empty
    lists fall back to the plain path (no pandas dtype ambiguity).
    """
    if not rows:
        return spark.createDataFrame([], schema)
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    names = schema.fieldNames()
    if isinstance(rows[0], dict):
        pdf = pd.DataFrame(rows)[names]  # schema column order
    else:
        pdf = pd.DataFrame(rows, columns=names)
    return spark.createDataFrame(pdf, schema)
