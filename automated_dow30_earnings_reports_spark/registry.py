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
    f"{_PKG}.sources.reports_txt",
    f"{_PKG}.sources.json_ledger",
    f"{_PKG}.functions.scalars",
    f"{_PKG}.functions.udtfs",
    f"{_PKG}.operators.skew",
    f"{_PKG}.plans.relational",
    f"{_PKG}.plans.advanced",
    f"{_PKG}.plans.tpch_extra",
    f"{_PKG}.plans.maintenance",
]

# ORDER MATTERS: the driver evaluates correctness in registration order
# and truncates at ~50 queries per round. Per-round rotation rule: at
# round start, every query with a green row in the latest
# CORRECTNESS_r0N.json moves to the BACK, so the driver's budget lands
# on never-attested queries first. Round 5 ordering: positions 1-6 are
# the r4 additions the r4 driver budget didn't reach (local-green, no
# driver row yet); queries added during round 5 follow, inside the
# 50-slot budget so they attest same-round. Everything attested across
# r1∪r2∪r3∪r4 (178/178 green, zero failures) follows in module order
# and soaks up the rest of the budget as re-attestation.
_PRIORITY = [
    # --- never driver-attested (added in r4 past the budget) ---
    "schema_evolution_read",
    "file_skipping_stats",
    "session_stats_batch",
    "q5_local_supplier_volume",
    "bm25_retrieval",
    "multimodal_audio_fingerprint",
    # --- new in round 5 (appended as they land; local-green) ---
    "reports_http_filter",
    "mv_incremental_refresh",
    "merge_on_read_deletes",
    "table_fingerprint",
    "interval_overlap_join",
    "skyline_price_date",
    "cluster_aware_split",
    "knn_classify_centroid",
    "dpp_partitioned_join",
    "phrase_search_postings",
    "supplier_hops_bfs",
    "k_anonymity_audit",
    "stratified_fixed_k",
    "winsorize_values",
    "ivf_index_roundtrip",
    "ivf_index_append",
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
