"""Table IO seam: Iceberg in production, parquet + snapshot manifest in tests.

BASELINE.json declares Iceberg tables; this sandbox has no Iceberg runtime
jar (verified: none in the pyspark 4.1.2 jars, no network), so all engine
logic is written against this interface (SURVEY.md §7):

- :class:`IcebergTableIO` — the production path (`format("iceberg")`,
  snapshot IDs from table history). Import-guarded: constructing it without
  the runtime raises with instructions rather than failing mid-job.
- :class:`ParquetTableIO` — parquet directories plus a `_snapshots.json`
  ledger emulating snapshot ids + lineage, so the resume manifest has real
  snapshot semantics to test against.
"""

from __future__ import annotations

import json
import os
import uuid
from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession


class TableIO(ABC):
    @abstractmethod
    def read(self, spark: SparkSession, table: str) -> DataFrame: ...

    @abstractmethod
    def append(self, df: DataFrame, table: str) -> str:
        """Append rows; returns the commit's snapshot id."""

    @abstractmethod
    def overwrite(self, df: DataFrame, table: str) -> str: ...

    @abstractmethod
    def exists(self, spark: SparkSession, table: str) -> bool: ...


class ParquetTableIO(TableIO):
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._ledger = os.path.join(root, "_snapshots.json")

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _record(self, table: str, mode: str) -> str:
        snap = uuid.uuid4().hex[:16]
        entries = []
        if os.path.exists(self._ledger):
            with open(self._ledger) as f:
                entries = json.load(f)
        entries.append({"table": table, "snapshot_id": snap, "mode": mode})
        with open(self._ledger, "w") as f:
            json.dump(entries, f, indent=1)
        return snap

    def snapshots(self, table: str) -> list[dict]:
        if not os.path.exists(self._ledger):
            return []
        with open(self._ledger) as f:
            return [e for e in json.load(f) if e["table"] == table]

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self._path(table))

    def append(self, df: DataFrame, table: str) -> str:
        df.write.mode("append").parquet(self._path(table))
        return self._record(table, "append")

    def overwrite(self, df: DataFrame, table: str) -> str:
        df.write.mode("overwrite").parquet(self._path(table))
        return self._record(table, "overwrite")

    def exists(self, spark: SparkSession, table: str) -> bool:
        p = self._path(table)
        return os.path.exists(p) and any(f.endswith(".parquet") for f in os.listdir(p))


class IcebergTableIO(TableIO):
    """Production path. Requires iceberg-spark-runtime on the classpath and a
    catalog conf, e.g.::

        spark.sql.catalog.lake = org.apache.iceberg.spark.SparkCatalog
        spark.sql.catalog.lake.type = hadoop|hive|rest
    """

    def __init__(self, spark: SparkSession, catalog: str = "lake", namespace: str = "profiler"):
        try:
            spark._jvm.org.apache.iceberg.spark.SparkCatalog  # noqa: B018
        except Exception as e:  # pragma: no cover - no iceberg jar in sandbox
            raise RuntimeError(
                "Iceberg runtime not on the classpath; add "
                "iceberg-spark-runtime and a spark.sql.catalog.* conf, or use "
                "ParquetTableIO for local runs."
            ) from e
        self.catalog, self.namespace = catalog, namespace

    def _ident(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    def read(self, spark: SparkSession, table: str) -> DataFrame:  # pragma: no cover
        return spark.read.format("iceberg").load(self._ident(table))

    def _last_snapshot(self, spark: SparkSession, table: str) -> str:  # pragma: no cover
        row = spark.sql(
            f"SELECT snapshot_id FROM {self._ident(table)}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).head()
        return str(row[0]) if row else ""

    def append(self, df: DataFrame, table: str) -> str:  # pragma: no cover
        df.writeTo(self._ident(table)).append()
        return self._last_snapshot(df.sparkSession, table)

    def overwrite(self, df: DataFrame, table: str) -> str:  # pragma: no cover
        df.writeTo(self._ident(table)).createOrReplace()
        return self._last_snapshot(df.sparkSession, table)

    def exists(self, spark: SparkSession, table: str) -> bool:  # pragma: no cover
        return spark.catalog.tableExists(self._ident(table))
