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
    "multimodal_image_header",
    "multimodal_audio_header",
    "multimodal_video_header",
    "multimodal_audio_features",
    "similarity_top_pairs_blocked",
    "dedup_embedding_cosine",
    "length_mad_udaf",
    # DOM fidelity path: parsing is inherently Python (stdlib
    # HTMLParser), Arrow-batched by contract (sources/html_dom.py)
    "html_dom_table_scan",
    "html_dom_links",
    "html_dom_clean",
    # SQL-registered @udtf (functions/udtfs.py) — Arrow eval enforced
    "udtf_lateral_links",
    # applyInPandas grouped map WITH a hash-exact oracle — the Python
    # node is the operator's point (plans/advanced.py)
    "value_trend_grouped_pandas",
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
    # (BatchEvalPythonUDTF included: Arrow UDTF eval renders as
    # ArrowEvalPythonUDTF)
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    assert re.search(
        r"MapInPandas|FlatMapGroupsInPandas|AggregateInPandas|ArrowAggregatePython"
        r"|ArrowEvalPython",  # scalar pandas_udf (DOM parsers) + UDTF
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


def test_tfidf_scan_prunes_to_id_and_text(spark, sf_correctness):
    import __spark_entry__ as e

    plan = _plan_of(e.queries()["tfidf_top_terms"](spark, sf_correctness))
    # the tokenize pass is checkpointed (tf feeds both the join and the
    # df aggregate), so the lazy plan's only documents read is the
    # metadata-only n_docs count — zero data columns, and never a
    # second explode or a count_distinct expand
    reads = [l for l in plan.splitlines() if "ReadSchema" in l and "documents" not in l]
    assert any("struct<>" in l for l in reads), reads
    assert not any("lang" in l or "source" in l or "n_chars" in l for l in reads)
    assert "Explode" not in plan and "Expand" not in plan, "tokenize ran lazily"


def test_attribution_join_pushes_type_filters_and_prunes(spark, sf_correctness):
    import __spark_entry__ as e

    plan = _plan_of(e.queries()["click_attribution_15m"](spark, sf_correctness))
    # event-type filters reach the parquet scans; no full-width read
    assert re.search(r"PushedFilters:.*event_type.*view", plan) or re.search(
        r"PushedFilters:.*EqualTo\(event_type,view\)", plan
    ), "view filter not pushed"
    assert re.search(r"PushedFilters:.*EqualTo\(event_type,click\)", plan), (
        "click filter not pushed"
    )
    assert "value:double" not in plan  # unused column never scanned


def test_pii_redact_is_map_only(spark, sf_correctness):
    import __spark_entry__ as e

    plan = _plan_of(e.queries()["pii_redact"](spark, sf_correctness))
    # a scrub pass must stream at scan speed: no aggregate, no join, and
    # the only exchange is the final presentation orderBy's range part
    assert "HashAggregate" not in plan and "Join" not in plan
    assert plan.count("Exchange") <= 4  # rangepartitioning for orderBy (tree+detail)


def test_anomaly_zscore_is_broadcast_two_pass(spark, sf_correctness):
    import __spark_entry__ as e

    plan = _plan_of(e.queries()["event_anomaly_zscore"](spark, sf_correctness))
    # the fact-table side must NOT shuffle: stats come back via broadcast,
    # there is no window over event_type (giant-partition hazard)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_funnel_stage_frontiers_broadcast(spark, sf_correctness):
    import __spark_entry__ as e

    plan = _plan_of(e.queries()["funnel_conversion"](spark, sf_correctness))
    # u1/u2 frontiers are checkpointed (each stage scans events once);
    # the final lazy plan is the purchase stage: ONE broadcast join of
    # the u2 frontier onto the purchase-filtered scan — never a
    # sort-merge join, and never a second events scan
    assert plan.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan
    assert plan.count("Location") == 1  # one parquet scan in the lazy plan


def test_pmi_bigrams_has_no_window(spark, sf_correctness):
    import __spark_entry__ as e

    # bigrams are built map-side by zipping the token array with its
    # tail — a lead() window would shuffle every token on doc_id
    plan = _plan_of(e.queries()["pmi_bigrams"](spark, sf_correctness))
    assert "Window" not in plan


def test_zorder_key_is_pure_arithmetic_single_shuffle(spark, sf_correctness):
    import __spark_entry__ as e

    plan = _plan_of(e.queries()["zorder_cluster"](spark, sf_correctness))
    assert "Join" not in plan and "Window" not in plan
    # one agg exchange + the presentation orderBy (tree+detail doubles)
    assert plan.count("Exchange") <= 4


def test_scd2_is_single_shuffle(spark, sf_correctness):
    import __spark_entry__ as e

    # change-flag window, version running-sum window, per-version
    # rollup, and the valid_to lead window all ride ONE hash exchange:
    # HashPartitioning(user_id) satisfies every downstream clustering
    # that includes user_id. Only the presentation orderBy adds a range
    # exchange. (tree+detail doubles the count.)
    plan = _plan_of(e.queries()["scd2_event_type"](spark, sf_correctness))
    assert plan.count("Exchange") <= 4, plan.count("Exchange")


def test_rolling_window_is_single_shuffle(spark, sf_correctness):
    import __spark_entry__ as e

    plan = _plan_of(e.queries()["rolling_30d_spend"](spark, sf_correctness))
    assert plan.count("Exchange") <= 4, plan.count("Exchange")


def test_fuzzy_match_scan_prunes_columns(spark, sf_correctness):
    import __spark_entry__ as e

    plan = _plan_of(e.queries()["fuzzy_match_blocked"](spark, sf_correctness))
    reads = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert reads and all(
        "lang" not in l and "source" not in l and "n_chars" not in l for l in reads
    ), reads


def test_funnel_onepass_has_no_joins(spark, sf_correctness):
    import __spark_entry__ as e

    plan = _plan_of(e.queries()["funnel_conversion_onepass"](spark, sf_correctness))
    # single scan + higher-order array walk: no joins, and only the
    # user_id groupBy, final global agg, and presentation sort exchange
    assert "Join" not in plan
    assert plan.count("Exchange") <= 6


def test_q3_uses_takeordered_and_broadcasts(spark, sf_correctness):
    import __spark_entry__ as e

    plan = _plan_of(e.queries()["q3_shipping_priority"](spark, sf_correctness))
    # LIMIT 10 over a sort must compile to TakeOrdered, not a global Sort
    assert "TakeOrderedAndProject" in plan
    # customer and orders sides ride broadcast joins; no sort-merge join
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_concurrency_peak_is_pure_codegen(spark, sf_correctness):
    import __spark_entry__ as e

    plan = _plan_of(e.queries()["concurrency_minute_peak"](spark, sf_correctness))
    # sequence+explode grid: no Python/Arrow nodes, no joins, and the
    # (event_type, tick) -> (event_type, day) rollup reuses one shuffle
    assert "Python" not in plan and "Join" not in plan
    assert "Generate" in plan  # the explode


def test_twap_single_shuffle(spark, sf_correctness):
    import __spark_entry__ as e

    plan = _plan_of(e.queries()["time_weighted_avg"](spark, sf_correctness))
    # window on user_id + groupBy user_id reuse the same hash partitioning:
    # one data exchange plus the presentation sort
    assert plan.count("Exchange hashpartitioning") <= 2
