"""ParquetTableIO CRUD semantics: upsert (keyed merge) and predicate delete —
the reference's batched keyed UPDATE (output_tables_service.py:484-520) and
per-project delete suite (delete_from_tables_by_project_number.sql) as
transactional table operations."""

from __future__ import annotations


def _rows(io, spark, table):
    return {
        (r["k"], r["v"]) for r in io.read(spark, table).collect()
    }


def test_upsert_updates_and_inserts(spark, tmp_io):
    df1 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    tmp_io.overwrite(df1, "t")
    df2 = spark.createDataFrame([(2, "B"), (4, "d")], "k int, v string")
    tmp_io.upsert(df2, "t", key="k")
    assert _rows(tmp_io, spark, "t") == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}
    # snapshot ledger records the merge commit
    assert [s["mode"] for s in tmp_io.snapshots("t")] == ["overwrite", "upsert"]


def test_upsert_on_missing_table_creates_it(spark, tmp_io):
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    tmp_io.upsert(df, "fresh", key="k")
    assert _rows(tmp_io, spark, "fresh") == {(1, "a")}


def test_delete_where(spark, tmp_io):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (10, "x")], "k int, v string"
    )
    tmp_io.overwrite(df, "t")
    tmp_io.delete_where(spark, "t", "k >= 3")
    assert _rows(tmp_io, spark, "t") == {(1, "a"), (2, "b")}
    assert [s["mode"] for s in tmp_io.snapshots("t")] == ["overwrite", "delete"]
