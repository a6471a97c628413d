"""Aggregates QUERIES/ORACLES from every operator module.

Each module listed in ``_MODULES`` defines module-level ``QUERIES``
(name → callable(spark, sf_dir) → DataFrame) and ``ORACLES`` (name →
DuckDB SQL string). The driver-facing ``__spark_entry__.py`` pulls the
merged dicts from here. Imports are unconditional so a broken module
fails loudly instead of silently dropping its queries.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_PKG = "automated_dow30_earnings_reports_spark"

# Grows as operator modules land (SURVEY.md §7 build order).
_MODULES = [
    f"{_PKG}.operators.dedup",
    f"{_PKG}.operators.similarity",
    f"{_PKG}.operators.textstats",
    f"{_PKG}.operators.multimodal",
    f"{_PKG}.operators.curation",
    f"{_PKG}.operators.graph",
    f"{_PKG}.operators.sketches",
    f"{_PKG}.operators.asof",
    f"{_PKG}.streaming.windows",
    f"{_PKG}.pipeline.queries",
    f"{_PKG}.pipeline.discovery",
    f"{_PKG}.pipeline.orchestrate",
    f"{_PKG}.sources.html_table",
    f"{_PKG}.sources.html_dom",
    f"{_PKG}.sources.parquet_lake",
    f"{_PKG}.sources.kv_datasource",
    f"{_PKG}.sources.csv_sources",
    f"{_PKG}.sources.kv_text",
    f"{_PKG}.sources.json_ledger",
    f"{_PKG}.functions.scalars",
    f"{_PKG}.functions.udtfs",
    f"{_PKG}.operators.skew",
    f"{_PKG}.plans.relational",
    f"{_PKG}.plans.advanced",
    f"{_PKG}.plans.tpch_extra",
]

# ORDER MATTERS: the driver evaluates correctness in registration order
# and truncates at ~50 queries per round. Per-round rotation rule: at
# round start, every query with a green row in the latest
# CORRECTNESS_r0N.json moves to the BACK, so the driver's budget lands
# on never-attested queries first. Round 4 ordering: positions 1-33 are
# the r3-added queries that were local-green but got no driver row
# (CORRECTNESS_r03 covered positions 1-50 of the r3 list, all green);
# positions 34+ are queries newly added in round 4. Already-attested
# queries follow in module order (everything green across r1∪r2∪r3).
_PRIORITY = [
    # --- never driver-attested (added in r3, local pytest green) ---
    "ir_candidate_probe",
    "semdedup_prune",
    "unigram_logprob_score",
    "orc_lake_roundtrip",
    "cms_heavy_hitters",
    "bloom_join_prune",
    "q4_order_priority",
    "q7_volume_shipping",
    "q10_returned_items",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q19_disjunctive_revenue",
    "q21_sole_failing_supplier",
    "q22_idle_customers",
    "kmv_distinct_orders",
    "kmv_union_returnflags",
    "multimodal_image_dhash",
    "temperature_resample",
    "quantile_sketch_events",
    "kv_datasource_roundtrip",
    "similarity_pq_adc",
    "q6_forecast_revenue",
    "dedup_containment",
    "udtf_lateral_links",
    "sql_fulfillment_rollup",
    "ewma_user_value",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "dq_constraint_report",
    "gdpr_purge_report",
    "lake_compaction",
    "corpus_curation_funnel",
    # --- new in round 4 (local-green; driver-attested this round if the
    # budget reaches them, else rotated to the front in r5) ---
    "csv_sink_roundtrip",
    "text_sink_roundtrip",
    "json_ledger_roundtrip",
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q11_important_stock",
    "q16_parts_supplier",
    "q20_potential_promotion",
    "repeated_ngram_spans",
    "weighted_sample_topk",
    "snapshot_diff_cdc",
    "co_occurrence_part_pairs",
    "triangle_count_cosupply",
    "pivot_status_by_priority",
    "orderkey_islands",
    "rolling_7d_distinct_users",
    "value_trend_by_type",
    # --- position 51+: r4 additions beyond the ~50-query budget; if the
    # driver stops at 50, rotate these to the front in round 5 ---
    "schema_evolution_read",
    "file_skipping_stats",
    "session_stats_batch",
    "q5_local_supplier_volume",
    "bm25_retrieval",
    "multimodal_audio_fingerprint",
]


def _prioritize(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def _iter_modules():
    for dotted in _MODULES:
        yield importlib.import_module(dotted)


def all_queries() -> dict[str, QueryFn]:
    from automated_dow30_earnings_reports_spark.plans import flagship

    out: dict[str, QueryFn] = {"flagship_revenue_by_nation": flagship.revenue_by_nation}
    for mod in _iter_modules():
        dup = set(out) & set(mod.QUERIES)
        if dup:
            raise ValueError(f"duplicate query names from {mod.__name__}: {dup}")
        out.update(mod.QUERIES)
    return _prioritize(out)


def all_oracles() -> dict[str, str]:
    from automated_dow30_earnings_reports_spark.plans import flagship

    out: dict[str, str] = {"flagship_revenue_by_nation": flagship.FLAGSHIP_ORACLE}
    for mod in _iter_modules():
        out.update(mod.ORACLES)
    return _prioritize(out)
