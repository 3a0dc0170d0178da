"""Scalable per-group top-k.

``Window.partitionBy(group).orderBy(...)`` with FEW, LARGE groups (e.g. 5
market segments over 10^12 orders) funnels each group through one task.
``grouped_topk`` is the classic two-phase fix:

  phase 1  row_number within (group, salt) — the salt (deterministic hash
           of a tie-break column, never rand(): resume-stable) splits each
           group across ``salt_buckets`` parallel partitions; every bucket
           keeps its local top-k, so at most k·salt_buckets rows per group
           survive.
  phase 2  row_number within group over the survivors — bounded input
           (k·salt_buckets rows per group) so the single-task-per-group
           window is now safe at any scale.

Any row in the true global top-k is in its bucket's local top-k, so the
two-phase result is exact. Rank ties must be broken by a unique column in
``order_by`` (same total-order contract as distributed_cumsum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SALT = "__dps_topk_salt"


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    salt_col: str,
    salt_buckets: int = 64,
) -> DataFrame:
    """Top-k rows per group with a ``rank`` column (1-based).

    ``salt_col``: any high-cardinality column (a key) whose hash spreads
    rows uniformly; deterministic so resumed runs bucket identically.
    """
    salted = df.withColumn(
        _SALT, F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt_buckets))
    )
    w_local = Window.partitionBy(*group_cols, _SALT).orderBy(*order_by)
    survivors = (
        salted.withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= k)
        .drop("__lr", _SALT)
    )
    w_final = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        survivors.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
    )
