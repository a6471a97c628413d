"""Dump a physical-plan audit table for every bench headline query.

For each query: number of logical exchanges (formatted explain prints
tree + detail, so raw counts are halved), whether any Python eval node
appears, whether a parquet scan carries pushed filters, and the set of
tables scanned with column counts — the at-a-glance evidence that
plans stay shuffle-minimal, JVM-side, and pruned.

Usage: python scripts/plan_audit.py [sf_dir] > audit.md
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit_metrics(plan: str) -> dict:
    """The three regression-guarded plan stats (tests/test_plan_budgets.py
    fails on any increase in exchanges / new Python node / lost pushed
    filter) plus the read-column widths for the human table."""
    return {
        # formatted explain prints node NAMES in tree + detail, so the
        # Exchange count is halved; PushedFilters lines appear ONLY in
        # the detail section (one per scan node) and are counted as-is
        # (the old //2 under-counted once duplicate subtrees were
        # checkpointed away — caught by the budget test itself)
        "exchanges": plan.count("Exchange") // 2,
        "python": sorted(
            set(
                re.findall(
                    r"EvalPython|MapInPandas|FlatMapGroupsInPandas|ArrowAggregatePython",
                    plan,
                )
            )
        ),
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]+\]", plan)),
        # parquet scan count in the LAZY plan (checkpointed subtrees
        # executed eagerly and left it) — the duplicate-scan guard: a
        # refactor that re-derives a shared frame per consumer shows up
        # here as scan growth before any bench run can notice
        "scans": len(re.findall(r"Location:", plan)),
        "read_cols": sorted(
            {
                str(s.count(",") + 1)
                for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
                if s
            }
        ),
    }


def main() -> int:
    from automated_dow30_earnings_reports_spark.session import get_spark

    import bench
    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit")
    qs = entrymod.queries()
    extra = EXTRA

    print("| query | exchanges | python nodes | pushed filters | scans | read cols |")
    print("|---|---|---|---|---|---|")
    for name in bench.HEADLINE + [q for q in extra if q not in bench.HEADLINE]:
        try:
            plan = plan_of(qs[name](spark, sf_dir))
        except Exception as exc:  # iterative queries execute while building
            print(f"| {name} | (iterative: {type(exc).__name__}) | | | | |")
            continue
        m = audit_metrics(plan)
        print(
            f"| {name} | {m['exchanges']} | {','.join(m['python']) or '—'} |"
            f" {m['pushed']} | {m['scans']} | {','.join(m['read_cols']) or '—'} |"
        )
    spark.stop()
    return 0


# Non-headline queries still worth a standing plan audit (new or
# plan-interesting operators that didn't make the bench set).
EXTRA = [
    "similarity_ann_ivf_kmeans",
        "semdedup_prune",
        "unigram_logprob_score",
        "ir_candidate_urls",
        "ir_candidate_probe",
        "orc_lake_roundtrip",
        "dedup_cluster_canonical",
        "q4_order_priority",
        "q10_returned_items",
        "q14_promo_revenue",
        "q15_top_supplier",
        "q22_idle_customers",
        "kmv_union_returnflags",
        "kv_datasource_roundtrip",
        "q6_forecast_revenue",
        "dedup_containment",
        "q12_shipmode_priority",
        "q13_customer_distribution",
        "q17_small_quantity_revenue",
        "ewma_user_value",
        "udtf_lateral_links",
        "sql_fulfillment_rollup",
        "dq_constraint_report",
        "gdpr_purge_report",
        "q11_important_stock",
        "q20_potential_promotion",
        "csv_sink_roundtrip",
        "text_sink_roundtrip",
        "json_ledger_roundtrip",
        "schema_evolution_read",
        "file_skipping_stats",
        "session_stats_batch",
        "q5_local_supplier_volume",
        "bm25_retrieval",
        "multimodal_audio_fingerprint",
]


if __name__ == "__main__":
    raise SystemExit(main())
