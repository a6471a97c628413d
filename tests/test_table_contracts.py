"""Schema contract for the driver-generated testdata tables.

Round-1 post-mortem (VERDICT r1): a silent testdata regeneration flipped
events.ts from TIMESTAMP(NANOS) to native timestamp[us], and the loader's
baked-in nanos workaround broke 20 queries + the whole bench. This test
pins the dtypes every query assumes, so any future drift in
/root/testdata fails loudly in ONE obvious place.

The contract is over *loaded* DataFrames (post `load_table`), i.e. what
queries actually see — not the raw parquet footer.
"""

from __future__ import annotations

import pytest

from automated_dow30_earnings_reports_spark.tables import ALL_TABLES, load_table

# dtype strings as reported by DataFrame.dtypes. Values may be a tuple when
# more than one physical encoding is acceptable to every query (timestamps:
# queries only compare/truncate/diff them, so NTZ vs LTZ both work).
TS = ("timestamp", "timestamp_ntz")

EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": TS,
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": TS,
    },
    "events": {
        "event_id": "bigint",
        "ts": TS,  # loader must normalize nanos-as-long → timestamp
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("table", ALL_TABLES)
def test_loaded_schema_matches_contract(spark, sf_smoke, table):
    expected = EXPECTED[table]
    actual = dict(load_table(spark, sf_smoke, table).dtypes)
    assert set(actual) == set(expected), (
        f"{table}: column drift — testdata has {sorted(actual)}, "
        f"engine expects {sorted(expected)}"
    )
    for col, want in expected.items():
        allowed = want if isinstance(want, tuple) else (want,)
        assert actual[col] in allowed, (
            f"{table}.{col}: dtype drift — testdata loads as {actual[col]!r}, "
            f"engine expects {allowed}. If /root/testdata was regenerated, "
            f"update tables.load_table (see _load_events) and this contract."
        )


def test_priority_names_all_resolve():
    """Every registry._PRIORITY entry must name a registered query —
    the list routes the external correctness budget, so a typo'd
    rotation would silently burn verification slots."""
    from automated_dow30_earnings_reports_spark import registry

    qs = registry.all_queries()
    oracles = registry.all_oracles()
    missing = [n for n in registry._PRIORITY if n not in qs]
    assert missing == []
    assert len(registry._PRIORITY) == len(set(registry._PRIORITY))
    # every priority query is oracled (the driver's strong check)
    unoracled = [n for n in registry._PRIORITY if n not in oracles]
    assert unoracled == []


def test_bench_headline_names_all_resolve():
    import bench

    from automated_dow30_earnings_reports_spark import registry

    qs = registry.all_queries()
    assert [n for n in bench.HEADLINE if n not in qs] == []
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
