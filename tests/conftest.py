from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from automated_dow30_earnings_reports_spark.session import get_spark

    # Fewer shuffle partitions than prod default: test tables are tiny and
    # scheduler overhead dominates otherwise.
    spark = get_spark("dow30-spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_smoke():
    if not os.path.isdir(SF_SMOKE):
        pytest.skip("testdata sf0.001 not present")
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correctness():
    if not os.path.isdir(SF_CORRECTNESS):
        pytest.skip("testdata sf0.01 not present")
    return SF_CORRECTNESS
