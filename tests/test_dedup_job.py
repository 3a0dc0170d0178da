"""jobs/dedup_docs.py contract: full pipeline (exact ∪ LSH-verified pairs →
connected components → keep-list + report) over a small corpus with planted
duplicate structure."""

from __future__ import annotations

import json
import shutil
import sys
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def docs_dir(spark):
    d = tempfile.mkdtemp(prefix="dps_dedup_job_")
    base = "the quick brown fox jumps over the lazy dog and runs far away"
    rows = [
        (0, base),
        (1, base.upper()),              # exact dup of 0 (normalization)
        (2, base + " extra tail"),      # near dup of 0 (high shingle overlap)
        # long shared prefix, one differing tail token => Jaccard ~0.93:
        # high enough that the 4 LSH bands (8 hashes, 2 rows) cannot all
        # deterministically miss (p_band = J^2 ~ 0.87 each)
        (3, "completely different content about spark query engines and the "
            "catalyst optimizer with adaptive execution on one"),
        (4, "completely different content about spark query engines and the "
            "catalyst optimizer with adaptive execution on two"),  # near dup of 3
        (5, "a lone unique document with its own words entirely"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    spark.createDataFrame(pdf, "doc_id long, text string").write.parquet(f"{d}/docs")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_dedup_job_end_to_end(spark, docs_dir, monkeypatch, capsys):
    from jobs import dedup_docs

    out = f"{docs_dir}/out"
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "dedup_docs.py",
            "--input", f"{docs_dir}/docs",
            "--output", out,
            "--threshold", "0.4",
        ],
    )
    assert dedup_docs.main() == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["docs"] == 6
    assert report["exact_pairs"] == 1  # 0~1

    clusters = spark.read.parquet(f"{out}/clusters")
    got = {r["id"]: r for r in clusters.collect()}
    # 0,1 exact; 2 near-dup of 0 => one cluster rooted at 0
    assert got[0]["cluster_id"] == got[1]["cluster_id"] == got[2]["cluster_id"] == 0
    assert got[0]["cluster_size"] == 3
    # 3,4 near dups; 5 singleton
    assert got[3]["cluster_id"] == got[4]["cluster_id"] == 3
    assert got[5]["cluster_id"] == 5 and got[5]["cluster_size"] == 1
    # keep-list = exactly the canonical (min-id) member of each cluster
    keep = {r["doc_id"] for r in spark.read.parquet(f"{out}/keep").collect()}
    assert keep == {0, 3, 5}
    assert clusters.filter(F.col("is_canonical") == 1).count() == 3
    assert report["clusters"] == 3 and report["dups_dropped"] == 3


def test_dedup_job_no_dups_is_identity(spark, docs_dir, monkeypatch, capsys):
    from jobs import dedup_docs

    d = tempfile.mkdtemp(prefix="dps_dedup_uniq_")
    try:
        rows = [(i, f"unique document number {i} with distinct vocabulary set {i*7}") for i in range(10)]
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"]), "doc_id long, text string"
        ).write.parquet(f"{d}/docs")
        monkeypatch.setattr(
            sys, "argv",
            ["dedup_docs.py", "--input", f"{d}/docs", "--output", f"{d}/out"],
        )
        assert dedup_docs.main() == 0
        report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert report["dups_dropped"] == 0
        assert spark.read.parquet(f"{d}/out/keep").count() == 10
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _run_job(monkeypatch, capsys, argv):
    import json
    import sys

    from jobs import dedup_docs

    monkeypatch.setattr(sys, "argv", ["dedup_docs.py", *argv])
    assert dedup_docs.main() == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_dedup_job_replicate_strain_invariants(spark, docs_dir, monkeypatch, capsys):
    """--replicate R with --keep-exact-in-lsh (strain mode): R-fold copies
    must collapse to EXACTLY the 1x cluster set (every copy absorbed), with
    per-phase timings and the candidate count reported — the unmitigated
    super-linear (~R^2) metric the BENCH strain section tracks."""
    reports = {}
    for rep, out in ((1, f"{docs_dir}/out_r1"), (2, f"{docs_dir}/out_r2")):
        reports[rep] = _run_job(
            monkeypatch, capsys,
            ["--input", f"{docs_dir}/docs", "--output", out,
             "--threshold", "0.4", "--replicate", str(rep), "--keep-exact-in-lsh"],
        )

    r1, r2 = reports[1], reports[2]
    assert r2["docs"] == 2 * r1["docs"]
    assert r2["clusters"] == r1["clusters"]  # copies absorbed exactly
    assert r2["dups_dropped"] == r2["docs"] - r2["clusters"]
    assert r2["lsh_candidates"] > r1["lsh_candidates"]  # ~R^2 growth (unmitigated)
    assert set(r2["phase_sec"]) == {
        "exact", "lsh_candidates", "jaccard_verify", "closure_and_write", "keep_and_report",
    }
    keep = spark.read.parquet(f"{docs_dir}/out_r2/keep")
    assert keep.count() == r2["clusters"]


def test_dedup_job_default_prunes_exact_dups_from_lsh(spark, docs_dir, monkeypatch, capsys):
    """DEFAULT mode signs canonicals only: under R-fold replication the
    candidate count must stay FLAT (the exact pass absorbs every copy before
    signing) while the cluster closure stays bit-identical to strain mode —
    the round-4 verdict's 'mitigation in code, not prose' criterion."""
    r1 = _run_job(
        monkeypatch, capsys,
        ["--input", f"{docs_dir}/docs", "--output", f"{docs_dir}/out_d1",
         "--threshold", "0.4"],
    )
    r2 = _run_job(
        monkeypatch, capsys,
        ["--input", f"{docs_dir}/docs", "--output", f"{docs_dir}/out_d2",
         "--threshold", "0.4", "--replicate", "2"],
    )
    # canonicals are identical across replication levels → flat candidates
    assert r2["lsh_candidates"] == r1["lsh_candidates"]
    assert r2["clusters"] == r1["clusters"]
    assert r2["dups_dropped"] == r2["docs"] - r2["clusters"]
    assert r1["keep_exact_in_lsh"] is False and r1["lsh_skipped_buckets"] == 0
    # cluster memberships match the strain-mode (unpruned) run exactly:
    # pruning changes WHERE pairs are found, never the closure
    strain = _run_job(
        monkeypatch, capsys,
        ["--input", f"{docs_dir}/docs", "--output", f"{docs_dir}/out_d3",
         "--threshold", "0.4", "--replicate", "2", "--keep-exact-in-lsh"],
    )
    got_d = {(r["id"], r["cluster_id"])
             for r in spark.read.parquet(f"{docs_dir}/out_d2/clusters").collect()}
    got_s = {(r["id"], r["cluster_id"])
             for r in spark.read.parquet(f"{docs_dir}/out_d3/clusters").collect()}
    assert got_d == got_s
    assert strain["clusters"] == r2["clusters"]


def test_dedup_job_bucket_cap_reports_skips(spark, docs_dir, monkeypatch, capsys):
    """--max-bucket-size 1: EVERY multi-member bucket is skipped (no bucket
    can pair 2 docs), so near_pairs collapses to 0 and the skip metrics
    disclose exactly what was dropped — the cap is loud, never silent."""
    rep = _run_job(
        monkeypatch, capsys,
        ["--input", f"{docs_dir}/docs", "--output", f"{docs_dir}/out_cap",
         "--threshold", "0.4", "--max-bucket-size", "1"],
    )
    assert rep["lsh_candidates"] == 0 and rep["near_pairs"] == 0
    assert rep["lsh_skipped_buckets"] > 0
    assert rep["lsh_skipped_rows"] >= 2 * rep["lsh_skipped_buckets"]
    # exact dedup still works — only the near-dup channel was capped
    assert rep["exact_pairs"] == 1
