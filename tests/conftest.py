from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"

# Smoke tier (r11, the r10 VERDICT's process-hole fix): the full suite
# runs ~38 min — longer than a time-boxed verifier's window — so this
# curated module set is auto-marked `smoke` and `pytest -m smoke`
# finishes in minutes while still crossing every layer (lake protocol,
# custom source, plan budgets, optimization-equivalence pins, scalar
# goldens, table contracts). The FULL suite remains the merge gate.
_SMOKE_MODULES = {
    "test_scalars",
    "test_normalize",
    "test_plan_budgets",
    "test_parquet_lake",
    "test_kv_datasource",
    "test_table_contracts",
    "test_r10_optimization",
    "test_r11_optimization",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        # tests/ is a package, so module names arrive dotted
        # ("tests.test_scalars") — match on the last segment
        if item.module.__name__.rsplit(".", 1)[-1] in _SMOKE_MODULES:
            item.add_marker(_pytest.mark.smoke)


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
