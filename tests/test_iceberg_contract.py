"""Contract tests for IcebergTableIO's emitted SQL.

The sandbox has no iceberg-spark-runtime jar (SURVEY.md §7), so the
production path cannot execute here — but the SQL it would emit CAN be
pinned: these tests drive IcebergTableIO against a recording stub of the
SparkSession/DataFrame surface and assert statement text and call order
(MERGE INTO shape, snapshot-id query, delete predicate). A regression in
the merge clause or snapshot lineage query now fails a test instead of
surfacing on a real cluster.
"""

from __future__ import annotations

from data_profiler_spark.sources.tableio import IcebergTableIO


class _Catalog:
    def __init__(self, log):
        self._log = log

    def dropTempView(self, name):
        self._log.append(("dropTempView", name))

    def tableExists(self, ident):
        self._log.append(("tableExists", ident))
        return True


class _Result:
    def __init__(self, row):
        self._row = row

    def head(self):
        return self._row


class _FakeSpark:
    def __init__(self, snapshot_id="4242"):
        self.log = []
        self.catalog = _Catalog(self.log)
        self._snapshot_id = snapshot_id

    def sql(self, statement):
        self.log.append(("sql", " ".join(statement.split())))
        return _Result((self._snapshot_id,))


class _FakeWriter:
    def __init__(self, log, ident):
        self._log, self._ident = log, ident

    def append(self):
        self._log.append(("writeTo.append", self._ident))

    def createOrReplace(self):
        self._log.append(("writeTo.createOrReplace", self._ident))


class _FakeDF:
    def __init__(self, spark):
        self.sparkSession = spark

    def createOrReplaceTempView(self, name):
        self.sparkSession.log.append(("createView", name))

    def writeTo(self, ident):
        return _FakeWriter(self.sparkSession.log, ident)


def _io(spark) -> IcebergTableIO:
    # bypass __init__'s jar probe (no iceberg runtime in the sandbox); the
    # point is the SQL the instance emits, not the classpath check
    io = object.__new__(IcebergTableIO)
    io.catalog, io.namespace = "lake", "profiler"
    return io


def test_upsert_emits_merge_then_snapshot_query_then_drops_view():
    spark = _FakeSpark()
    io = _io(spark)
    snap = io.upsert(_FakeDF(spark), "clips", key="clip_id")
    assert snap == "4242"

    kinds = [k for k, _ in spark.log]
    # merge commits, the temp source view is dropped, THEN lineage is read
    assert kinds == ["createView", "sql", "dropTempView", "sql"]

    (_, view), (_, merge), (_, dropped), (_, snap_q) = spark.log
    assert view == dropped  # temp source view is cleaned up
    assert merge == (
        f"MERGE INTO lake.profiler.clips t USING {view} s "
        "ON t.clip_id = s.clip_id "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    assert snap_q == (
        "SELECT snapshot_id FROM lake.profiler.clips.snapshots "
        "ORDER BY committed_at DESC LIMIT 1"
    )


def test_append_and_overwrite_route_through_writeTo_and_report_snapshot():
    spark = _FakeSpark(snapshot_id="77")
    io = _io(spark)
    assert io.append(_FakeDF(spark), "verdicts") == "77"
    assert spark.log[0] == ("writeTo.append", "lake.profiler.verdicts")
    assert io.overwrite(_FakeDF(spark), "baseline_hist") == "77"
    assert ("writeTo.createOrReplace", "lake.profiler.baseline_hist") in spark.log


def test_delete_where_emits_predicate_delete():
    spark = _FakeSpark()
    io = _io(spark)
    io.delete_where(spark, "violations", "snapshot_id = 'abc'")
    assert spark.log[0] == (
        "sql",
        "DELETE FROM lake.profiler.violations WHERE snapshot_id = 'abc'",
    )
    # snapshot lineage is queried after the delete commit
    assert spark.log[1][1].startswith("SELECT snapshot_id FROM lake.profiler.violations.snapshots")


def test_exists_uses_catalog_with_full_identifier():
    spark = _FakeSpark()
    io = _io(spark)
    assert io.exists(spark, "clips") is True
    assert spark.log == [("tableExists", "lake.profiler.clips")]
