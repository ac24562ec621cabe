from __future__ import annotations

import os

import pytest

from join_example_spark.conf import build_local_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    session = build_local_session(
        app_name="join_example_spark-tests",
        cores=os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"),
        shuffle_partitions=8,
    )
    yield session
    session.stop()
