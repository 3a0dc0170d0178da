"""PSI / KS drift tests vs hand-computed oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_profiler_spark.drift import ks_binned, ks_exact_by_group, psi, psi_paired
from data_profiler_spark.profiling import histogram


def _hist(spark, values, lo, hi, nb, col="v"):
    df = spark.createDataFrame(pd.DataFrame({col: values}))
    return histogram(df, col, lo, hi, nb)


def test_psi_zero_for_identical(spark):
    rng = np.random.default_rng(1)
    x = rng.normal(50, 10, 4000)
    h = _hist(spark, x, 0, 100, 20)
    r = psi(h, h).collect()[0]
    assert r["psi"] == pytest.approx(0.0, abs=1e-9)


def test_psi_detects_shift(spark):
    rng = np.random.default_rng(2)
    base = _hist(spark, rng.normal(50, 10, 4000), 0, 100, 20)
    cur = _hist(spark, rng.normal(65, 10, 4000), 0, 100, 20)
    r = psi(cur, base).collect()[0]
    assert r["psi"] > 0.25  # standard "drifted" threshold


def test_psi_paired_equals_two_frame_psi(spark):
    """Single-scan shape == two-histogram shape, including one-sided buckets
    (present in only one population → the other side is a 0 count, exactly
    what psi()'s full-outer join + fillna(0) produces)."""
    rng = np.random.default_rng(7)
    a = rng.normal(35, 6, 3000)  # leaves high buckets empty
    b = rng.normal(65, 6, 3000)  # leaves low buckets empty
    lo, hi, nb = 0.0, 100.0, 20
    cur, base = _hist(spark, a, lo, hi, nb), _hist(spark, b, lo, hi, nb)
    want = psi(cur, base).collect()[0]["psi"]

    counts = (
        cur.selectExpr("column", "bucket", "count AS c_cnt", "CAST(0 AS LONG) AS b_cnt")
        .unionByName(
            base.selectExpr(
                "column", "bucket", "CAST(0 AS LONG) AS c_cnt", "count AS b_cnt"
            )
        )
        .groupBy("column", "bucket")
        .agg(F.sum("c_cnt").alias("c_cnt"), F.sum("b_cnt").alias("b_cnt"))
    )
    got = psi_paired(counts).collect()[0]["psi"]
    assert got == pytest.approx(want, rel=1e-12)


def test_psi_window_core_matches_joined_oracle_grouped(spark):
    """The r5 window-totals core against a hand-computed per-group oracle,
    through the GROUPED path windowed_drift uses (group_cols): random
    per-(group, bucket) count pairs incl. zero-count buckets, PSI computed
    independently in numpy per group."""
    rng = np.random.default_rng(11)
    rows = []
    for g in ("w1", "w2", "w3"):
        for b in range(8):
            c, base = int(rng.integers(0, 50)), int(rng.integers(0, 50))
            if c or base:
                rows.append(("v", g, b, c, base))
    counts = spark.createDataFrame(
        pd.DataFrame(rows, columns=["column", "grp", "bucket", "c_cnt", "b_cnt"])
    )
    got = {
        r["grp"]: r["psi"]
        for r in psi_paired(counts, group_cols=["grp"]).collect()
    }
    for g in ("w1", "w2", "w3"):
        sub = [(c, b) for (_, gg, _, c, b) in rows if gg == g]
        ca = np.array([c for c, _ in sub], dtype=float)
        cb = np.array([b for _, b in sub], dtype=float)
        p = ca / ca.sum() + 1e-6
        q = cb / cb.sum() + 1e-6
        want = float(((p - q) * np.log(p / q)).sum())
        assert got[g] == pytest.approx(want, rel=1e-12), g


def test_psi_matches_numpy_oracle(spark):
    rng = np.random.default_rng(3)
    a, b = rng.normal(48, 9, 3000), rng.normal(52, 11, 3000)
    lo, hi, nb = 0.0, 100.0, 10
    cur, base = _hist(spark, a, lo, hi, nb), _hist(spark, b, lo, hi, nb)
    got = psi(cur, base).collect()[0]["psi"]
    edges = np.linspace(lo, hi, nb + 1)
    ca = np.histogram(a, bins=edges)[0].astype(float)
    cb = np.histogram(b, bins=edges)[0].astype(float)
    # align to width_bucket buckets incl. under/overflow (none here)
    p = ca / ca.sum() + 1e-6
    q = cb / cb.sum() + 1e-6
    exp = float(((p - q) * np.log(p / q)).sum())
    assert got == pytest.approx(exp, rel=1e-6)


def test_ks_binned_approximates_exact(spark):
    rng = np.random.default_rng(4)
    a, b = rng.normal(50, 10, 5000), rng.normal(56, 10, 5000)
    cur, base = _hist(spark, a, 0, 100, 50), _hist(spark, b, 0, 100, 50)
    got = ks_binned(cur, base).collect()[0]["ks_d"]
    sa, sb = np.sort(a), np.sort(b)
    allv = np.concatenate([sa, sb])
    exact = np.max(
        np.abs(
            np.searchsorted(sa, allv, side="right") / len(sa)
            - np.searchsorted(sb, allv, side="right") / len(sb)
        )
    )
    assert got == pytest.approx(exact, abs=0.03)  # ≤ max bucket mass


def test_ks_exact_by_group(spark):
    rng = np.random.default_rng(5)
    base = pd.DataFrame({"v": rng.normal(0, 1, 2000)})
    same = rng.normal(0, 1, 1500)
    shifted = rng.normal(1.0, 1, 1500)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"g": ["same"] * len(same) + ["shift"] * len(shifted), "v": np.concatenate([same, shifted])}
        )
    )
    got = {r["g"]: r["ks_d"] for r in ks_exact_by_group(df, "v", ["g"], base).collect()}
    assert got["same"] < 0.05
    assert got["shift"] > 0.3


def test_drift_scores_global_row_matches_psi_drift(spark):
    """The r5 drift_scores fusion derives the global 'psi:value' row by
    re-aggregating the pinned (day, bucket)-grain counts across days; that
    must stay bit-identical (at the entry's 6-dp rounding) to psi_drift's
    direct bucket-grain aggregation, and the grouped rows must cover every
    event day exactly once."""
    from data_profiler_spark.operators.corpus_engine import drift_scores, psi_drift

    sf = "/root/testdata/sf0.001"
    rows = {r["metric"]: r["value"] for r in drift_scores(spark, sf).collect()}
    direct = psi_drift(spark, sf).collect()[0]["psi"]
    assert rows["psi:value"] == direct
    days = sorted(m.split(":")[2] for m in rows if m.startswith("psi:value:"))
    expected = sorted(
        r[0]
        for r in spark.read.parquet(f"{sf}/events.parquet")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin("purchase", "view", "click")
        )
        .select(F.date_format("ts", "yyyy-MM-dd"))
        .distinct()
        .collect()
    )
    assert days == expected and len(days) > 1


def test_ks_binned_paired_equals_two_frame_ks(spark):
    """ks_binned_paired (single-scan paired-counts shape) == ks_binned
    (two-histogram full-outer-join shape), including one-sided buckets —
    the same contract psi_paired holds vs psi."""
    from data_profiler_spark.drift import ks_binned_paired

    rng = np.random.default_rng(11)
    a = rng.normal(35, 6, 3000)
    b = rng.normal(58, 9, 3000)
    lo, hi, nb = 0.0, 100.0, 20
    cur, base = _hist(spark, a, lo, hi, nb), _hist(spark, b, lo, hi, nb)
    want = ks_binned(cur, base).collect()[0]["ks_d"]

    counts = (
        cur.selectExpr("column", "bucket", "count AS c_cnt", "CAST(0 AS LONG) AS b_cnt")
        .unionByName(
            base.selectExpr(
                "column", "bucket", "CAST(0 AS LONG) AS c_cnt", "count AS b_cnt"
            )
        )
        .groupBy("column", "bucket")
        .agg(F.sum("c_cnt").alias("c_cnt"), F.sum("b_cnt").alias("b_cnt"))
    )
    got = ks_binned_paired(counts).collect()[0]["ks_d"]
    assert got == pytest.approx(want, rel=1e-12)

    # grouped: two groups with different shift sizes must score independently
    # and match the two-frame shape per group
    g_counts = counts.withColumn("g", F.lit("g1")).unionByName(
        counts.withColumn("g", F.lit("g2")).withColumn(
            "b_cnt", F.col("c_cnt")  # g2: baseline == current → D = 0
        )
    )
    rows = {
        r["g"]: r["ks_d"]
        for r in ks_binned_paired(g_counts, group_cols=["g"]).collect()
    }
    assert rows["g1"] == pytest.approx(want, rel=1e-12)
    assert rows["g2"] == pytest.approx(0.0, abs=1e-15)


def test_ks_binned_paired_absorbs_duplicate_buckets(spark):
    """A counts frame where one bucket is split across several rows (two
    histograms stacked WITHOUT re-grouping) must score exactly like the
    pre-aggregated frame: the RANGE-frame CDF includes every row of a tied
    bucket at once, so there is no shuffle-order-dependent mid-bucket CDF
    point. A ROWS frame breaks this — that's the regression being pinned."""
    from data_profiler_spark.drift import ks_binned_paired

    rng = np.random.default_rng(13)
    a = rng.normal(35, 6, 2000)
    b = rng.normal(60, 8, 2000)
    lo, hi, nb = 0.0, 100.0, 20
    cur, base = _hist(spark, a, lo, hi, nb), _hist(spark, b, lo, hi, nb)
    want = ks_binned(cur, base).collect()[0]["ks_d"]

    stacked = cur.selectExpr(
        "column", "bucket", "count AS c_cnt", "CAST(0 AS LONG) AS b_cnt"
    ).unionByName(
        base.selectExpr(
            "column", "bucket", "CAST(0 AS LONG) AS c_cnt", "count AS b_cnt"
        )
    )
    # no groupBy: shared buckets appear on two rows
    got = ks_binned_paired(stacked).collect()[0]["ks_d"]
    assert got == pytest.approx(want, rel=1e-12)

    grouped = {
        r["g"]: r["ks_d"]
        for r in ks_binned_paired(
            stacked.withColumn("g", F.lit("g1")).unionByName(
                stacked.withColumn("g", F.lit("g2"))
            ),
            group_cols=["g"],
        ).collect()
    }
    assert grouped["g1"] == pytest.approx(want, rel=1e-12)
    assert grouped["g2"] == pytest.approx(want, rel=1e-12)


def test_drift_scores_null_ts_matches_oracle(spark, tmp_path):
    """NULL-ts events must count toward the GLOBAL psi/ksb rows (they are
    part of psi_drift's population — it never looked at ts) while the
    per-day rows exclude them. Pins the Spark entry against its DuckDB
    oracle on data the read-only testdata doesn't have: before this test,
    the oracle's counts CTE filtered ts IS NOT NULL and would have
    diverged from the engine on the first NULL-ts event."""
    import duckdb

    from data_profiler_spark.operators.corpus_engine import (
        DRIFT_SCORES_SQL,
        drift_scores,
    )

    rng = np.random.default_rng(17)
    n = 240
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime("2024-03-01")
            + pd.to_timedelta(rng.integers(0, 48, n), unit="h"),
            "user_id": rng.integers(0, 40, n).astype(np.int64),
            "event_type": rng.choice(["purchase", "view", "click"], n),
            "value": rng.normal(90, 30, n),
            "props": "{}",
        }
    )
    # NULL-ts rows skewed far from the rest so the global ksb/psi values
    # visibly depend on their inclusion; one NULL value (excluded everywhere)
    pdf.loc[:8, "ts"] = pd.NaT
    pdf.loc[:8, "value"] = 195.0
    pdf.loc[:4, "event_type"] = "purchase"
    pdf.loc[5:8, "event_type"] = "view"
    pdf.loc[9, "value"] = np.nan
    # Spark can't read TIMESTAMP(NANOS) parquet — write microsecond precision
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(tmp_path / "events.parquet", index=False)

    got = {
        r["metric"]: (r["value"], r["n"])
        for r in drift_scores(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    want = {m: (v, k) for m, v, k in con.sql(DRIFT_SCORES_SQL).fetchall()}
    assert set(got) == set(want)
    for m in want:
        assert got[m][0] == pytest.approx(want[m][0], abs=1e-9), m
        assert got[m][1] == want[m][1], m
    # the per-day keys never include a NULL day; both days are present
    days = {m.split(":")[-1] for m in got if m.startswith("psi:value:")}
    assert days == {"2024-03-01", "2024-03-02"}
