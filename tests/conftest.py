from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssiintegrateddatapipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    # The full-contract oracle sweep (tests/test_oracle_parity.py) is the
    # long pole of the suite (~15 min for 300+ queries). Unit iteration
    # can skip it with `-m "not parity"`; the sweep itself is recorded
    # per round as PARITY_r{N}.json via tools/parity_sweep.py.
    config.addinivalue_line(
        "markers", "parity: full contract-vs-DuckDB oracle sweep"
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ssi-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
