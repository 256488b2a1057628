from __future__ import annotations

import shutil
import tempfile

import pytest

from pholcus_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pholcus_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_store_dir():
    d = tempfile.mkdtemp(prefix="pholcus_store_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
