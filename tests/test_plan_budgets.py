"""Plan-budget regression guard: the exchange count, Python-node set,
and pushed-filter count of every auditable headline query are pinned in
tests/plan_budgets.json. A refactor that silently grows a shuffle,
drops a pushed filter, or introduces a Python eval stage fails here —
PERF.md's prose audit tables can't catch that by themselves.

Regenerate the budgets (after an INTENTIONAL plan change — read the
diff of the json before committing it) with:

    PLAN_BUDGETS_REGEN=1 python -m pytest tests/test_plan_budgets.py -q
"""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUDGET_FILE = os.path.join(REPO, "tests", "plan_budgets.json")

# Queries whose build step EXECUTES jobs (index lifecycle writes,
# streaming bootstraps, iterative frontier/power loops, metastore DDL)
# — auditing them means re-running multi-second pipelines, and their
# interesting plans are the inner verbs already audited via sf1_probe /
# PERF.md. The lazy-plan majority below is the regression surface.
_EXECUTES_ON_BUILD = {
    "supplier_hops_bfs",
    "embedding_top_pc",
    "recursive_cte_reachability",
    "bucketed_join_agg",
    "cache_table_reuse",
    "similarity_ann_ivf_kmeans",
    "ivf_index_roundtrip",
    "ivf_index_append",
    "ivf_index_recluster",
    "ivf_index_delete",
    "ivf_index_stats",
    "ivf_index_crud_lifecycle",
    "dedup_incremental_index",
    "dedup_index_purge",
    "dedup_index_crud_lifecycle",
    "text_index_roundtrip",
    "text_index_append",
    "text_index_compact",
    "text_index_delete",
    "text_index_delete_mor",
    "text_index_crud_lifecycle",
    "streaming_text_ingest",
    "streaming_dedup_ingest",
    "streaming_ivf_ingest",
    "dedup_index_purge_mor",
    "text_index_mor_compact",
    "text_index_vacuum",
    "text_index_stats",
    "dedup_index_stats",
    "lake_compaction",
    "retention_ttl_enforce",
    "time_travel_read",
    "occ_concurrent_commits",
    "snapshot_expiry_lifecycle",
    "ivf_index_vacuum",
    "streaming_ledger_compact",
    "occ_merge_lifecycle",
    "occ_merge_moved_keys",
    "ivf_vacuum_retention",
    "incremental_snapshot_read",
    "occ_schema_evolution",
    "occ_compaction_lifecycle",
}


def _load_plan_audit():
    spec = importlib.util.spec_from_file_location(
        "plan_audit", os.path.join(REPO, "scripts", "plan_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _audited_names():
    import __spark_entry__ as entrymod

    from tests.test_plans import ITERATIVE_QUERIES

    pa = _load_plan_audit()
    # EVERY registered query, not just the bench headliners — a fast-
    # tier query's plan can regress too. Excluded: frames whose build
    # step executes jobs (index lifecycles, metastore DDL, scratch
    # writers) and the driver-loop iterative queries.
    skip = _EXECUTES_ON_BUILD | ITERATIVE_QUERIES
    return pa, sorted(n for n in entrymod.queries() if n not in skip)


def test_plan_budgets(spark, sf_correctness):
    import __spark_entry__ as entrymod

    pa, names = _audited_names()
    qs = entrymod.queries()
    got: dict[str, dict] = {}
    for name in names:
        plan = pa.plan_of(qs[name](spark, sf_correctness))
        m = pa.audit_metrics(plan)
        got[name] = {
            "exchanges": m["exchanges"],
            "python": m["python"],
            "pushed": m["pushed"],
            "scans": m["scans"],
        }

    if os.environ.get("PLAN_BUDGETS_REGEN"):
        with open(BUDGET_FILE, "w") as fh:
            json.dump(got, fh, indent=1, sort_keys=True)
            fh.write("\n")
        return

    assert os.path.exists(BUDGET_FILE), (
        "no plan budgets checked in — run PLAN_BUDGETS_REGEN=1 pytest "
        "tests/test_plan_budgets.py"
    )
    with open(BUDGET_FILE) as fh:
        budget = json.load(fh)

    problems = []
    for name, m in got.items():
        if name not in budget:
            problems.append(f"{name}: no budget (regen after reviewing its plan)")
            continue
        b = budget[name]
        if m["exchanges"] > b["exchanges"]:
            problems.append(
                f"{name}: exchanges grew {b['exchanges']} -> {m['exchanges']}"
            )
        new_python = set(m["python"]) - set(b["python"])
        if new_python:
            problems.append(f"{name}: new Python nodes {sorted(new_python)}")
        if m["pushed"] < b["pushed"]:
            problems.append(
                f"{name}: pushed filters dropped {b['pushed']} -> {m['pushed']}"
            )
        # scans absent from budgets pinned before the metric existed:
        # treat as unguarded rather than failing on the missing key
        if "scans" in b and m["scans"] > b["scans"]:
            problems.append(
                f"{name}: lazy-plan scans grew {b['scans']} -> {m['scans']}"
                " (a shared frame is being re-derived per consumer)"
            )
    assert not problems, "plan regressions:\n" + "\n".join(problems)
