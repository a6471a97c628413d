"""The correctness gate, run locally: every queries() entry that has an
oracle must hash-match it at sf0.01 (mirrors the driver's t2 check)."""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, duckdb_conn


def _query_names():
    import __spark_entry__ as e

    return sorted(e.queries().keys())


@pytest.fixture(scope="module")
def duck(sf_correctness):
    con = duckdb_conn(sf_correctness)
    yield con
    con.close()


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(name, spark, sf_correctness, duck):
    import __spark_entry__ as e

    q = e.queries()[name]
    oracles = e.oracle_sql()
    sdf = q(spark, sf_correctness)
    assert sdf is not None
    if name not in oracles:
        # rows-only check (driver does the same for oracle-less queries)
        n = sdf.count()
        assert n >= 0
        return
    oracle_pdf = duck.execute(oracles[name]).fetchdf()
    problems = compare(name, sdf, oracle_pdf)
    assert not problems, "\n".join(problems)


def test_entry_smoke(spark, sf_smoke):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["r_name", "n_name", "revenue", "n_lineitems"]
