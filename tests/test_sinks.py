"""CSV export (S9) + HTML report (S10) sinks — reference semantics:
data_profiler.py:604-644 (xlsx/plotly export with the 100k-cell raw guard)."""

from __future__ import annotations

import csv
import glob
import os

from pyspark.sql import functions as F

from data_profiler_spark.sinks import export_csv, render_html_report


def test_export_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c,с", None)], "id int, s string, v double"
    )
    out = str(tmp_path / "csv_out")
    export_csv(df, out, single_file=True)
    files = glob.glob(f"{out}/part-*.csv")
    assert len(files) == 1  # single_file coalesces to one artifact
    with open(files[0], newline="") as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["id", "s", "v"]
    assert sorted(r[0] for r in rows[1:]) == ["1", "2", "3"]
    assert any(r[1] == "a" and r[2] == "1.5" for r in rows[1:])

    # distributed mode: one file per non-empty partition, same rows
    out2 = str(tmp_path / "csv_dist")
    export_csv(df.repartition(3), out2)
    files2 = glob.glob(f"{out2}/part-*.csv")
    assert len(files2) > 1
    ids = []
    for p in files2:
        with open(p, newline="") as f:
            ids += [r[0] for r in list(csv.reader(f))[1:]]
    assert sorted(ids) == ["1", "2", "3"]


def test_render_html_report_tables_svg_and_guard(spark, tmp_path):
    profile = spark.createDataFrame(
        [("dur_ms", "mean", 812.5), ("dur_ms", "null_rate", 0.0)],
        "column string, metric string, value double",
    )
    hist = spark.createDataFrame(
        [(i, (i + 1) * 10) for i in range(5)], "bucket int, count long"
    )
    big = spark.range(200_000).select(F.col("id"))  # 200k cells -> guard
    path = str(tmp_path / "report.html")
    render_html_report(
        [("profile", profile), ("dur_ms histogram", hist), ("raw", big)],
        path,
        title="clips profile",
        subtitle="sf0.001",
    )
    assert os.path.exists(path)
    text = open(path, encoding="utf-8").read()
    assert "<h2>profile</h2>" in text and "812.5" in text and "null_rate" in text
    assert "<svg" in text and text.count("<rect") == 5  # histogram bars
    assert "skipped: over 100000 rows" in text  # reference's 100k-cell guard,
        # single limit+collect action (no count-then-collect recompute)
    assert "</html>" in text
