from __future__ import annotations

import shutil
import tempfile

import pytest

from data_profiler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="dps_tests",
        cores=8,
        shuffle_partitions=8,
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    yield s
    s.stop()


@pytest.fixture()
def tmp_io():
    from data_profiler_spark.sources.tableio import ParquetTableIO

    root = tempfile.mkdtemp(prefix="dps_io_")
    yield ParquetTableIO(root)
    shutil.rmtree(root, ignore_errors=True)
