"""distributed_cumsum must equal the naive single-task global-window cumsum
bit-for-bit (same total order), at every partition count — including
num_partitions > distinct keys and heavy duplicate sort-key values broken
by a unique tie-breaker."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_profiler_spark.functions.windows import distributed_cumsum


def _naive(df, order_by, values, include_total):
    w = Window.orderBy(*order_by).rowsBetween(Window.unboundedPreceding, 0)
    cols = [F.col(c) for c in df.columns] + [
        F.sum(v).over(w).alias(f"cum_{v}") for v in values
    ]
    if include_total:
        w_all = Window.partitionBy()
        cols += [F.sum(v).over(w_all).alias(f"total_{v}") for v in values]
    return df.select(*cols)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_matches_naive_with_ties_and_totals(spark):
    # 500 rows, only 7 distinct sort-key values → ties straddle every
    # range boundary; id is the unique tie-breaker making the order total.
    df = (
        spark.range(500)
        .select(
            F.col("id"),
            (F.col("id") % 7).alias("k"),
            (F.col("id") * 3 + 1).alias("v"),
            (F.col("id") % 11).cast("double").alias("w"),
        )
        .repartition(8)
    )
    order = [F.desc("k"), F.asc("id")]
    expected = _rows(_naive(df, order, ["v", "w"], True))
    for n_parts in (1, 4, 16, 1000):
        got = _rows(
            distributed_cumsum(
                df, order, ["v", "w"], num_partitions=n_parts, include_total=True
            )
        )
        assert got == expected, f"mismatch at num_partitions={n_parts}"


def test_no_totals_column_shape(spark):
    df = spark.range(100).select(F.col("id"), (F.col("id") % 5).alias("v"))
    out = distributed_cumsum(df, [F.asc("id")], ["v"], num_partitions=4)
    assert out.columns == ["id", "v", "cum_v"]
    last = out.orderBy(F.desc("id")).first()
    assert last["cum_v"] == df.agg(F.sum("v")).first()[0]


def test_empty_input(spark):
    df = spark.range(0).select(F.col("id"), F.lit(1).alias("v"))
    out = distributed_cumsum(df, [F.asc("id")], ["v"], num_partitions=4)
    assert out.count() == 0


def test_distributed_cumsum_partition_by_matches_pandas(spark):  # noqa: F811
    """Grouped two-phase cumsum (partition_by): per-group running totals and
    per-group grand totals match a pandas groupby-cumsum, for groups that
    straddle many range partitions."""
    import pandas as pd

    import numpy as np

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "grp": rng.choice(["a", "b", "c"], size=500),
            "key": np.arange(500),
            "v": rng.integers(1, 100, size=500),
        }
    )
    df = spark.createDataFrame(pdf)
    out = distributed_cumsum(
        df,
        [F.desc("v"), F.asc("key")],
        ["v"],
        num_partitions=8,
        include_total=True,
        partition_by=["grp"],
    ).toPandas()

    expect = pdf.sort_values(["grp", "v", "key"], ascending=[True, False, True]).copy()
    expect["cum_v"] = expect.groupby("grp")["v"].cumsum()
    expect["total_v"] = expect.groupby("grp")["v"].transform("sum")
    got = out.set_index("key").sort_index()
    want = expect.set_index("key").sort_index()
    assert (got["cum_v"] == want["cum_v"]).all()
    assert (got["total_v"] == want["total_v"]).all()


def test_grouped_topk_matches_plain_window(spark):
    """Salted two-phase top-k is EXACT: identical to the plain per-group
    window on a frame whose groups straddle every salt bucket."""
    import numpy as np
    import pandas as pd

    from data_profiler_spark.functions.topk import grouped_topk

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "grp": rng.choice(["x", "y"], size=400),
            "key": np.arange(400),
            "score": rng.normal(size=400),
        }
    )
    df = spark.createDataFrame(pdf)
    order = [F.desc("score"), F.asc("key")]
    got = {
        (r["grp"], r["rank"]): r["key"]
        for r in grouped_topk(df, ["grp"], order, k=5, salt_col="key", salt_buckets=16).collect()
    }
    w = Window.partitionBy("grp").orderBy(*order)
    expect = {
        (r["grp"], r["rank"]): r["key"]
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .collect()
    }
    assert got == expect


def test_grouped_cumsum_keeps_null_group_rows(spark):
    """ADVICE r2 (medium): a NULL group value (e.g. a null shipdate's null
    month) must still find its offsets row — the group join is null-safe
    equality, so null-group rows flow through with their own running total
    instead of being silently dropped."""
    df = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "a", 20),
            (3, None, 5),
            (4, None, 7),
            (5, "b", 1),
        ],
        "id long, grp string, v long",
    ).repartition(4)
    out = distributed_cumsum(
        df,
        [F.asc("id")],
        ["v"],
        num_partitions=3,
        include_total=True,
        partition_by=["grp"],
    )
    got = {(r["grp"], r["id"]): (r["cum_v"], r["total_v"]) for r in out.collect()}
    assert len(got) == 5  # the two null-group rows are NOT dropped
    assert got[(None, 3)] == (5, 12) and got[(None, 4)] == (12, 12)
    assert got[("a", 1)] == (10, 30) and got[("a", 2)] == (30, 30)
    assert got[("b", 5)] == (1, 1)


def test_grouped_cumsum_nan_group_accumulates_across_partitions(spark):
    """Spark's groupBy unifies NaN into one group; the driver-side prefix
    must too (Python nan != nan would reset the offset per totals row,
    zeroing the NaN group's cross-partition running totals)."""
    import math

    rows = [(float("nan") if i % 3 == 0 else float(i % 2), i, 1) for i in range(240)]
    df = spark.createDataFrame(rows, "g double, k int, v int").repartition(8)
    out = distributed_cumsum(
        df, [F.asc("k")], ["v"], num_partitions=6, partition_by=["g"]
    ).collect()
    nan_rows = [r for r in out if math.isnan(r["g"])]
    assert len(nan_rows) == 80
    # one coherent running total 1..80 across all partitions of the group
    assert sorted(r["cum_v"] for r in nan_rows) == list(range(1, 81))
