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
    f"{_PKG}.operators.evaluation",
    f"{_PKG}.operators.asof",
    f"{_PKG}.streaming.windows",
    f"{_PKG}.streaming.incremental",
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
    f"{_PKG}.plans.sql_features",
]

# ORDER MATTERS: the driver evaluates correctness in registration order
# and truncates at ~50 queries per round. Rotation rule since round 6:
# LEAST-RECENTLY-ATTESTED FIRST. With every query green at least once,
# the risk is no longer coverage but staleness — a query last attested
# in r1 could silently rot for rounds while the budget re-checks recent
# ones. The ordering is computed from the CORRECTNESS_r*.json artifacts
# themselves: never-attested queries (no green row in any round) sort
# first (last_round = -1, i.e. new queries keep head priority
# automatically), then ascending by the round of their most recent
# green row; ties keep registration (module) order via stable sort. The
# manual _PRIORITY override below is applied ahead of the LRU order for
# explicit same-round routing of queries whose rows the artifact scan
# can't know about yet (e.g. a rename).
# r11 (the r10 VERDICT's #2): the r10 optimization round rewrote 30+
# query paths whose oracle rows were last attested on PRE-rewrite code
# (the r10 sample was the r4 cohort + the 6 new lifecycle verbs) — the
# subtlest equivalence arguments (the search-side df-from-pivot fold,
# the triangle mirror + power-round fold, the one-pass lifecycles) ran
# only under the builder's driver_sim. Route exactly those names ahead
# of the LRU order so the DRIVER re-attests them this round. The r11
# round's own rewrites (native-source arrival tail, write-spread,
# schema cache) are concentrated in the same streaming/index names, so
# the one list serves both rounds' re-attestation. 22 slots; LRU fills
# the remaining ~28 with the stalest cohort.
_PRIORITY: list[str] = [
    # r10-rewritten, never driver-attested post-rewrite; all four
    # streaming verbs are also r11's native-arrival-source rewrite
    "streaming_ledger_compact",
    "streaming_text_ingest",
    "streaming_dedup_ingest",
    "streaming_ivf_ingest",
    "dedup_incremental_index",
    "dedup_index_purge",
    "dedup_index_purge_mor",
    "dedup_index_stats",
    "dedup_index_crud_lifecycle",
    "text_index_roundtrip",
    "text_index_append",
    "text_index_compact",
    "text_index_delete",
    "text_index_delete_mor",
    "text_index_mor_compact",
    "text_index_vacuum",
    "text_index_stats",
    "text_index_crud_lifecycle",
    "embedding_top_pc",
    "supplier_hops_bfs",
    "clustering_coefficient",
    "recursive_cte_reachability",
]


def _last_attested() -> dict[str, int]:
    """query name -> most recent round with a green driver row, scanned
    from CORRECTNESS_r*.json at the repo root. Green = no err and no
    explicit False among rows/schema/hash match flags (hash_match may
    be null for rows-only checks). Any read problem degrades to 'never
    attested' rather than breaking the driver import."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out: dict[str, int] = {}
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(p) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict) or row.get("err"):
                continue
            flags = [row.get(k) for k in ("rows_match", "schema_match", "hash_match")]
            if any(v is False for v in flags):
                continue
            out[name] = max(out.get(name, -1), rnd)
    return out


def _prioritize(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    last = _last_attested()
    tail = sorted(
        (k for k in d if k not in head), key=lambda k: last.get(k, -1)
    )  # stable: registration order within each cohort
    return head | {k: d[k] for k in tail}


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
