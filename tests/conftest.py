from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from etl_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="etl-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g", "spark.sql.warehouse.dir": tempfile.mkdtemp()},
    )
    yield s
    s.stop()


@pytest.fixture()
def tmp_table_dir():
    d = tempfile.mkdtemp(prefix="laketbl_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
