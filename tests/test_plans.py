"""Physical-plan audits: the scale-design claims in PERF.md, enforced.

Every relational/scalar/window/text/dedup query must stay entirely
JVM-side (no Python eval nodes); the star join must be broadcast-only
with the date filter pushed to the scan. Plans are inspected without
executing (explain is free), so this also guards against regressions
that would silently de-optimize a query."""

from __future__ import annotations

import contextlib
import io
import re

import pytest

# Queries whose OPERATOR is a Python stage by design (Arrow-batched
# mapInPandas/applyInPandas effect or BLAS kernels).
PYTHON_STAGE_QUERIES = {
    "llm_extract_udtf",
    "download_ledger",
    "multimodal_image_decode",
    "multimodal_audio_features",
    "similarity_top_pairs_blocked",
    "dedup_embedding_cosine",
    "length_mad_udaf",
}

# Iterative driver loops: building the DataFrame executes jobs
# (localCheckpoint); excluded here, covered by their own tests.
ITERATIVE_QUERIES = {
    "crawl_bfs",
    "pipeline_end_to_end",
    "dedup_clusters",
    "dedup_cluster_canonical",
}

_PYTHON_NODES = re.compile(r"EvalPython|MapInPandas|FlatMapGroupsInPandas|PythonUDF")


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _jvm_query_names():
    import __spark_entry__ as e

    return sorted(set(e.queries()) - PYTHON_STAGE_QUERIES - ITERATIVE_QUERIES)


@pytest.mark.parametrize("name", _jvm_query_names())
def test_query_stays_jvm_side(name, spark, sf_correctness):
    import __spark_entry__ as e

    df = e.queries()[name](spark, sf_correctness)
    plan = _plan_of(df)
    m = _PYTHON_NODES.search(plan)
    assert not m, f"{name}: Python node {m.group(0)} in plan — hot path left the JVM"


@pytest.mark.parametrize("name", sorted(PYTHON_STAGE_QUERIES))
def test_python_stage_queries_are_arrow_batched(name, spark, sf_correctness):
    import __spark_entry__ as e

    plan = _plan_of(e.queries()[name](spark, sf_correctness))
    # batched Arrow nodes only — never row-at-a-time BatchEvalPython
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    assert re.search(
        r"MapInPandas|FlatMapGroupsInPandas|AggregateInPandas|ArrowAggregatePython",
        plan,
    ), name


def test_flagship_plan_is_broadcast_only_with_pushdown(spark, sf_correctness):
    from automated_dow30_earnings_reports_spark.plans.flagship import revenue_by_nation

    plan = _plan_of(revenue_by_nation(spark, sf_correctness))
    # 4 joins; formatted explain prints each node in tree + detail
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert re.search(r"PushedFilters:.*l_shipdate", plan), "date filter not pushed to scan"


def test_enrichment_join_broadcasts(spark, sf_correctness):
    import __spark_entry__ as e

    plan = _plan_of(e.queries()["enrichment_left_join"](spark, sf_correctness))
    assert "BroadcastHashJoin" in plan
