from __future__ import annotations

import shutil
import tempfile

import pytest

from iceberg_compaction_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="icemaint-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def tmp_warehouse():
    d = tempfile.mkdtemp(prefix="icemaint_wh_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
