from __future__ import annotations

import os

import pytest

from myrecommendsystem_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="mrs-tests", master="local[8]", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    # MRS_TEST_SF_DIR=/root/testdata/sf0.01 replays the oracle suite at the
    # driver's correctness scale.
    return os.environ.get("MRS_TEST_SF_DIR", SF_SMOKE)
