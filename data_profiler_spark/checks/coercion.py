"""Type coercion + default fill with violation counting.

Reference: ``data_file_functions.py:90-103`` (/root/reference) coerces each
column to its declared dtype with ``errors='coerce'`` and **destroys** the
resulting nulls by filling type defaults, logging how many rows were
replaced. Here the same pass produces (a) the coerced+filled DataFrame and
(b) a per-column fill-count metrics DataFrame — the null-rate becomes a
first-class metric instead of a log line (SURVEY.md §1.2).

One fused agg computes every column's fill count; the coercion itself is
pure Catalyst expressions (cast + coalesce), fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_profiler_spark.functions.dates import parse_date_mixed
from data_profiler_spark.schemas import REF_DTYPE_DEFAULTS


def _coerce_expr(col: str, dtype: str):
    # try_cast / try_to_date = pandas errors='coerce' (null on malformed),
    # and they keep working under Spark 4's ANSI mode where plain cast throws.
    c = F.col(col)
    if dtype == "object":
        return c.cast("string")
    if dtype == "int64":
        return c.cast("string").try_cast("double").try_cast("long")
    if dtype == "float64":
        return c.cast("string").try_cast("double")
    if dtype == "date":
        # Ordered mixed-format try-chain (functions/dates.py) — the reference
        # parses dates with pd.to_datetime(dayfirst=True, format='mixed')
        # (transform_service.py:372-374); ISO %Y-%m-%d (data_file_functions
        # .py:91) is the chain's first format so strict inputs are unchanged.
        return parse_date_mixed(c)
    if dtype == "time":
        # %H:%M:%S — validate shape, keep as string (Spark has no TimeType)
        s = c.cast("string")
        return F.when(s.rlike(r"^\d{2}:\d{2}:\d{2}$"), s)
    raise ValueError(f"unknown ref dtype {dtype!r}")


def coerce_with_defaults(df: DataFrame, dtype_map: dict[str, str]) -> tuple[DataFrame, DataFrame]:
    """Returns (coerced_df, fill_counts_df).

    fill_counts_df: (column, metric='default_filled', value) — rows whose
    value was null/uncastable and got the type default
    (data_file_constants.py:163-169).
    """
    coerced_cols = {}
    for col, dtype in dtype_map.items():
        coerced_cols[col] = _coerce_expr(col, dtype)

    count_exprs = [
        F.count(F.when(coerced_cols[col].isNull(), 1)).cast("double").alias(col)
        for col in dtype_map
    ]
    counts_wide = df.agg(*count_exprs)
    pairs = []
    for col in dtype_map:
        pairs += [f"'{col}'", "'default_filled'", f"`{col}`"]
    counts = counts_wide.select(
        F.expr(f"stack({len(dtype_map)}, {', '.join(pairs)}) as (column, metric, value)")
    )

    out = df
    for col, dtype in dtype_map.items():
        default = REF_DTYPE_DEFAULTS[dtype][1]
        expr = coerced_cols[col]
        if dtype == "date":
            filled = F.coalesce(expr, F.to_date(F.lit(default)))
        else:
            filled = F.coalesce(expr, F.lit(default))
        out = out.withColumn(col, filled)
    return out, counts
