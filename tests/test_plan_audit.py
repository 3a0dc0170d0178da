"""Plan-quality audit: the scale claims of the corpus, held by a test.

Every corpus entry's physical plan (sf0.001) must be free of
- CartesianProduct / BroadcastNestedLoopJoin: the all-pairs shapes the
  operator docstrings promise to avoid (banded/bucketed joins instead);
- BatchEvalPython: row-at-a-time Python UDFs ("UDFs are the slow path" —
  only Arrow-batched pandas/Arrow exchanges are allowed:
  FlatMapGroupsInPandas / MapInPandas / PythonMapInArrow).

Exceptions must be declared here WITH a reason, so a new offender fails
loudly instead of sliding into the corpus unnoticed.
"""

from __future__ import annotations

import pytest

from data_profiler_spark.operators.corpus import CORPUS

SF_DIR = "/root/testdata/sf0.001"

FORBIDDEN = [
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "BatchEvalPython",
]

# entry -> (pattern allowed, why). Every exception is a small-side
# broadcast (dim grid, scalar aggregate, or bounded query/centroid set) —
# cost O(N * small), never data x data.
ALLOWED: dict[str, list[tuple[str, str]]] = {
    # monthly grid fill: month-grid x type-universe cross join of two
    # TINY dimension frames (|months| x |types| rows) — the documented
    # fill-missing-members shape (U3), never data x data
    "monthly_type_counts_filled": [
        ("BroadcastNestedLoopJoin", "tiny dim-grid fill (U3), not data x data")
    ],
    "velocity_by_month": [
        ("BroadcastNestedLoopJoin", "month-grid fill against the tiny ladder dims")
    ],
    "verdict_grid": [
        ("BroadcastNestedLoopJoin", "check-names x logical-partitions grid: both sides metadata-sized")
    ],
    "ann_cosine_topk": [
        ("BroadcastNestedLoopJoin", "brute-force baseline BY DESIGN: corpus x broadcast(bounded query set), O(N*Q)")
    ],
    "ann_ivf_topk": [
        ("BroadcastNestedLoopJoin", "IVF assignment: rows x broadcast(K centroids), O(N*K), K = #lists")
    ],
    "part_material_flow": [
        ("BroadcastNestedLoopJoin", "single-row grand-total aggregate broadcast (report denominator)")
    ],
    "part_stratification": [
        ("BroadcastNestedLoopJoin", "single-row grand-total aggregate broadcast (report denominator)")
    ],
    "nation_flow_top10": [
        ("BroadcastNestedLoopJoin", "single-row grand-total aggregate broadcast (report denominator)")
    ],
}

# entry -> extra forbidden patterns beyond the global list. hll_distinct's
# r3 fused agg planned a 6-way Expand (multiple DISTINCT aggregates
# multiply every scanned row per distinct column — 0.57 s → 2.93 s at
# sf0.1); the r4 shape is one clean sketch pass + two-level exact aggs, and
# this pin keeps the Expand from coming back. Expand is NOT globally
# forbidden: a single multi-countDistinct agg elsewhere may be a deliberate
# choice.
EXTRA_FORBIDDEN: dict[str, list[str]] = {
    "hll_distinct": ["Expand"],
}


def _scan_count(plan: str, table: str) -> int:
    return sum(
        1
        for line in plan.splitlines()
        if "FileScan" in line and f"{table}.parquet" in line
    )


def test_psi_drift_scans_events_once(spark):
    """psi_drift builds BOTH populations' histograms from one conditional
    aggregation — one events scan, not a scan per population (the r5 fusion;
    both populations live in the same table, so a second scan buys nothing).
    drift_scores adds the exact-KS path on top: one scan for the KS groups
    (raw values — not derivable from the PSI histogram), for 2 in-plan scans
    total (the md5-sampled KS baseline is a separate eager job by design —
    it stands in for a persisted baseline sample)."""
    from data_profiler_spark.operators.corpus_engine import drift_scores, psi_drift

    plan = psi_drift(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert _scan_count(plan, "events") == 1, plan.splitlines()[:30]
    plan = drift_scores(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert _scan_count(plan, "events") == 2, plan.splitlines()[:30]


@pytest.mark.parametrize("name", list(CORPUS))
def test_corpus_plan_is_scale_shaped(spark, name):
    fn, _ = CORPUS[name]
    df = fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    allowed = ALLOWED.get(name, [])
    for pat in FORBIDDEN + EXTRA_FORBIDDEN.get(name, []):
        if pat in plan and not any(pat == a for a, _ in allowed):
            raise AssertionError(
                f"{name}: physical plan contains {pat} (not in the declared "
                f"exception list) — first lines:\n"
                + "\n".join(plan.splitlines()[:25])
            )
