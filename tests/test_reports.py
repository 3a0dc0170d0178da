"""Report-layer pipelines (corpus_reports): shape + internal consistency.

Full value-level correctness is enforced by the DuckDB oracle comparison
(tools/parity_check.py / the driver's CORRECTNESS gate); these tests pin
the schema contract and a few invariants that survive any scale factor.
"""

from __future__ import annotations

from data_profiler_spark.operators.corpus_reports import (
    nation_flow_top10,
    part_material_flow,
    part_stratification,
)

SF = "/root/testdata/sf0.001"


def test_part_material_flow_shape(spark):
    df = part_material_flow(spark, SF)
    assert df.columns == [
        "partkey", "brand", "ship_days", "ship_qty_per_day", "total_ship_qty",
        "avg_monthly_qty", "max_monthly_qty", "return_days", "ret_qty_per_day",
        "total_ret_qty",
    ]
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        if r["total_ship_qty"] is not None and r["total_ret_qty"] is not None:
            assert r["total_ret_qty"] <= r["total_ship_qty"]
        if r["ship_qty_per_day"] is not None:
            assert r["ship_qty_per_day"] >= 0


def test_part_stratification_buckets(spark):
    rows = part_stratification(spark, SF).collect()
    assert len(rows) > 0
    labels = {"0", "1", "2", "3-5", "6-10", "11-20", "21-50", "51-100", "101+"}
    for r in rows:
        assert r["qty_range"] in labels
        assert r["parts"] > 0


def test_nation_flow_top10_ordered(spark):
    rows = nation_flow_top10(spark, SF).collect()
    assert 0 < len(rows) <= 10
    qtys = [r["daily_qty"] for r in rows]
    assert qtys == sorted(qtys, reverse=True)
