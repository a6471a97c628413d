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
    f"{_PKG}.functions.scalars",
    f"{_PKG}.functions.udtfs",
    f"{_PKG}.operators.skew",
    f"{_PKG}.plans.relational",
    f"{_PKG}.plans.advanced",
    f"{_PKG}.plans.tpch_extra",
]

# ORDER MATTERS: the driver evaluates correctness in registration order
# and truncates at ~50 queries per round (r1 and r2 each covered exactly
# 50). Queries with no green CORRECTNESS row from r1∪r2 are listed here
# explicitly so round 3's budget lands on precisely the unattested
# surface (VERDICT r2, "Next round" item 1): the 20 events-family
# queries that failed in r1 before the loader fix, the 28 never
# reached in either round, the previously oracle-less
# similarity_ann_ivf_kmeans (oracled this round), and this round's new
# queries. Everything else (already driver-green) follows in module
# order.
_PRIORITY = [
    "similarity_ann_ivf_kmeans",
    "ir_candidate_urls",
    "asof_join_tolerance",
    "window_tumbling",
    "window_sliding",
    "window_session",
    "click_attribution_15m",
    "llm_extract_udtf",
    "download_ledger",
    "crawl_bfs",
    "url_skip_filter",
    "frontier_politeness_schedule",
    "robots_disallow_filter",
    "url_canonicalize",
    "pipeline_end_to_end",
    "html_table_scan",
    "html_clean",
    "html_dom_table_scan",
    "html_dom_links",
    "html_dom_clean",
    "url_parse",
    "filename_pipeline",
    "kv_roundtrip",
    "json_scalar",
    "md5_checksum",
    "truncate_model_select",
    "word_char_count",
    "salted_skew_agg",
    "salted_replicated_join",
    "histogram_event_type",
    "distinct_users",
    "conditional_counts",
    "success_rate",
    "q18_large_orders",
    "value_percentiles",
    "user_event_deltas",
    "event_value_stats",
    "gapfill_daily_locf",
    "scd2_event_type",
    "zorder_cluster",
    "funnel_conversion",
    "retention_cohorts",
    "event_anomaly_zscore",
    "ntile_value_buckets",
    "event_debounce",
    "skew_report",
    "funnel_conversion_onepass",
    "event_transition_matrix",
    "concurrency_minute_peak",
    "time_weighted_avg",
    # position 51+: new this round — verified in r4 if the driver stops at 50
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
