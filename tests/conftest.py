from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small + fast for unit tests


@pytest.fixture(scope="session")
def spark():
    from searchgov_spider_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=4)
    yield s
