from __future__ import annotations

import shutil
import tempfile

import pytest

from tapdata_connectors_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("local[4]", shuffle_partitions=4, app_name="tests")
    yield s
    s.stop()


@pytest.fixture()
def tmpdir_():
    d = tempfile.mkdtemp(prefix="lake_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
