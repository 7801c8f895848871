from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solarpaneldatawrangler_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_TEST_SF_DIR", "/root/testdata/sf0.01")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute tests (local-cluster subprocess smoke); "
        "deselect with -m 'not slow' for a quick loop",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("spark-wrangler-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
