"""Distribution-drift tests vs a baseline profile snapshot: PSI and KS.

The reference's closest analog is the Data Describer's histogram + summary
stats (data_profiler.py:503-597 in /root/reference) — it renders them for a
human to eyeball; here the comparison is a first-class operator against a
persisted baseline histogram (HISTOGRAM_SCHEMA), producing drift scores and
verdict-ready booleans.

Scale design:
- PSI and binned-KS operate on *histograms* (≤ a few hundred rows per
  column) — the only pass over the data is the histogram aggregation
  itself; the drift math is windows + aggregation over those tiny frames
  (no self-join: a groupBy-totals + join-back shape would re-derive the
  histogram subtree and pay a second input scan).
- :func:`ks_exact_by_group` is the exact two-sample KS for *bounded* groups
  (e.g. per-codec within a partition) via applyInPandas — Arrow-batched,
  vectorized numpy inside, never applied to an unbounded global column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

EPS = 1e-6  # smoothing for empty buckets (standard PSI practice)


def psi(
    current_hist: DataFrame,
    baseline_hist: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Population Stability Index per column (and per extra group).

    PSI = Σ_buckets (p_i − q_i) · ln(p_i / q_i), p=current share, q=baseline
    share, ε-smoothed. Inputs are HISTOGRAM_SCHEMA frames with identical
    bucket edges (the current histogram must be built with the baseline's
    lo/hi — the engine persists those in the baseline snapshot).

    ``group_cols`` scores each group independently (one PSI per (column,
    *group)); BOTH frames must carry the columns — the windowed-drift
    stream replicates its baseline per event-time window this way.

    Rule of thumb: <0.1 stable, 0.1–0.25 moderate, >0.25 drifted.
    """
    g = group_cols or []
    keys = ["column", *g]
    cur = current_hist.groupBy(*keys, "bucket").agg(F.sum("count").alias("c_cnt"))
    base = baseline_hist.groupBy(*keys, "bucket").agg(F.sum("count").alias("b_cnt"))
    joined = cur.join(base, [*keys, "bucket"], "full_outer").fillna(
        0, subset=["c_cnt", "b_cnt"]
    )
    return _psi_of_joined(joined, keys)


def psi_paired(counts: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """PSI from a pre-paired per-bucket counts frame — the single-scan shape.

    ``counts`` carries (column, *group_cols, bucket, c_cnt, b_cnt): both
    populations' counts per bucket, typically produced by ONE conditional
    aggregation over a table that holds both (e.g. current vs. baseline
    segments of the same events table). :func:`psi` joins two separately
    built histograms — the right shape when the baseline is a persisted
    snapshot; when both populations live in one table, building the two
    histograms separately scans it twice and full-outer-joins what one
    ``sum(when(...))`` aggregation produces directly. Same math, same
    ε-smoothing, identical output (a bucket absent from one population is a
    0 count here exactly as the full-outer join + fillna(0) yields there —
    pinned by tests/test_drift.py).

    Precondition: ``counts`` must be at (column, *group_cols, bucket) grain —
    a bucket split across several rows gets the ε smoothing once per row and
    inflates the score (unlike :func:`ks_binned_paired`, whose RANGE-frame
    CDF absorbs duplicates). Re-aggregate first if the frame isn't grouped.
    """
    keys = ["column", *(group_cols or [])]
    return _psi_of_joined(counts, keys)


def _psi_of_joined(joined: DataFrame, keys: list[str]) -> DataFrame:
    """Shared PSI core over (keys..., bucket, c_cnt, b_cnt) rows.

    Totals come from a window over the counts frame, not a groupBy +
    self-join: the frame is ≤ nbins+2 rows per key (same bounded-window
    argument as :func:`ks_binned`), and the self-join shape would re-derive
    the counts subtree — at scan level, that's a SECOND pass over the input
    table for a sum the window gets in place."""
    w = Window.partitionBy(*keys)
    p = F.col("c_cnt") / F.sum("c_cnt").over(w) + EPS
    q = F.col("b_cnt") / F.sum("b_cnt").over(w) + EPS
    term = (p - q) * F.log(p / q)
    return (
        joined.select(*keys, term.alias("__psi_term"))
        .groupBy(*keys)
        .agg(F.sum("__psi_term").alias("psi"))
    )


def ks_binned_paired(
    counts: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Binned KS from a pre-paired per-bucket counts frame — the single-scan
    shape, exactly :func:`psi_paired`'s relationship to :func:`psi`.

    ``counts`` carries (column, *group_cols, bucket, c_cnt, b_cnt). When both
    populations' histograms come out of ONE conditional aggregation,
    :func:`ks_binned` would full-outer-join two projections of the same frame
    and broadcast-join totals back — four extra tiny stages per call. Here the
    CDFs and totals come from two windows over the same partitioning (one
    exchange), then a groupBy on the already-hash-partitioned keys. Identical
    output (a bucket absent from one population is a 0 count either way —
    pinned by tests/test_drift.py).

    The cumulative window uses a RANGE frame, so a bucket that appears on
    several input rows (e.g. two histograms stacked without re-grouping)
    contributes all its rows to every CDF point at or past it — the result
    is the same as pre-aggregating to (keys, bucket) grain, with no extra
    shuffle and no order-dependence on tied buckets (a ROWS frame would
    evaluate shuffle-dependent mid-bucket CDF points; pinned by
    tests/test_drift.py)."""
    keys = ["column", *(group_cols or [])]
    tot_w = Window.partitionBy(*keys)
    cum_w = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    d = F.abs(
        F.sum("c_cnt").over(cum_w) / F.sum("c_cnt").over(tot_w)
        - F.sum("b_cnt").over(cum_w) / F.sum("b_cnt").over(tot_w)
    )
    return (
        counts.select(*keys, d.alias("__d"))
        .groupBy(*keys)
        .agg(F.max("__d").alias("ks_d"))
    )


def ks_binned(
    current_hist: DataFrame,
    baseline_hist: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """KS D-statistic approximated from binned CDFs.

    D = max_b |CDF_cur(b) − CDF_base(b)|, cumulative sums over bucket order.
    Error vs exact KS ≤ max bucket probability mass — acceptable for drift
    gating, and it never touches row data. The per-(column, *group) window
    is over ≤ nbins+2 rows, so the single-task window is irrelevant.
    """
    g = group_cols or []
    keys = ["column", *g]
    cur = current_hist.groupBy(*keys, "bucket").agg(F.sum("count").alias("c_cnt"))
    base = baseline_hist.groupBy(*keys, "bucket").agg(F.sum("count").alias("b_cnt"))
    joined = cur.join(base, [*keys, "bucket"], "full_outer").fillna(
        0, subset=["c_cnt", "b_cnt"]
    )
    tot = joined.groupBy(*keys).agg(
        F.sum("c_cnt").alias("c_tot"), F.sum("b_cnt").alias("b_tot")
    )
    j = joined.join(F.broadcast(tot), keys)
    w = Window.partitionBy(*keys).orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cdf_diff = F.abs(
        F.sum("c_cnt").over(w) / F.col("c_tot") - F.sum("b_cnt").over(w) / F.col("b_tot")
    )
    return (
        j.withColumn("__d", cdf_diff)
        .groupBy(*keys)
        .agg(F.max("__d").alias("ks_d"))
    )


def drift_from_hist_rows(cur_rows: list, base_rows: list) -> list[dict]:
    """PSI + binned-KS per column from two collected histogram row sets.

    Same math as :func:`psi` / :func:`ks_binned`, but in plain Python: a
    histogram is ≤ nbins+2 rows per column *by construction at any data
    scale*, so once the (distributed) histogram aggregation has run, the
    drift comparison is metadata — doing it driver-side removes two join
    DAGs per run. The Spark versions remain for composing drift into larger
    lazy pipelines (and for the oracle-checked corpus entry).
    """
    def acc(rows):
        d: dict[str, dict[int, int]] = {}
        for r in rows:
            col = r["column"]
            d.setdefault(col, {})
            d[col][r["bucket"]] = d[col].get(r["bucket"], 0) + r["count"]
        return d

    cur, base = acc(cur_rows), acc(base_rows)
    out = []
    for col in sorted(set(cur) | set(base)):
        c = cur.get(col, {})
        b = base.get(col, {})
        buckets = sorted(set(c) | set(b))
        c_tot = sum(c.values()) or 1
        b_tot = sum(b.values()) or 1
        psi_v = 0.0
        cdf_c = cdf_b = 0.0
        ks = 0.0
        for k in buckets:
            p = c.get(k, 0) / c_tot + EPS
            q = b.get(k, 0) / b_tot + EPS
            psi_v += (p - q) * float(np.log(p / q))
            cdf_c += c.get(k, 0) / c_tot
            cdf_b += b.get(k, 0) / b_tot
            ks = max(ks, abs(cdf_c - cdf_b))
        out.append({"column": col, "psi": psi_v, "ks_d": ks})
    return out


def ks_exact_by_group(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    baseline_sample: pd.DataFrame,
) -> DataFrame:
    """Exact two-sample KS D per group vs a driver-small baseline sample.

    ``baseline_sample`` is a pandas frame with column ``value_col`` (e.g. the
    persisted baseline's reservoir sample). Shipped once per task via the
    closure (small by contract). Groups are bounded (codec × partition), so
    applyInPandas holds one group in memory — the supported Spark contract.
    """
    base = np.sort(baseline_sample[value_col].dropna().to_numpy(dtype=np.float64))
    out_schema = ", ".join(f"{g} string" for g in group_cols) + ", ks_d double, n long"

    def ks(pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.sort(pdf[value_col].dropna().to_numpy(dtype=np.float64))
        keys = {g: [str(pdf[g].iloc[0])] for g in group_cols}
        if len(x) == 0 or len(base) == 0:
            return pd.DataFrame({**keys, "ks_d": [None], "n": [len(x)]})
        # D = sup_t |F1(t) − F2(t)| evaluated at all sample points.
        allv = np.concatenate([x, base])
        cdf_x = np.searchsorted(x, allv, side="right") / len(x)
        cdf_b = np.searchsorted(base, allv, side="right") / len(base)
        d = float(np.max(np.abs(cdf_x - cdf_b)))
        return pd.DataFrame({**keys, "ks_d": [d], "n": [len(x)]})

    return (
        df.select(*group_cols, value_col)
        .groupBy(*group_cols)
        .applyInPandas(ks, schema=out_schema)
    )
