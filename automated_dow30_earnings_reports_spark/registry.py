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
#
# ORDER MATTERS: the driver evaluates correctness in registration order and
# may truncate on time budget (r1 stopped at 50/116). Modules whose queries
# have never received a CORRECTNESS row go FIRST so a truncated pass
# verifies new surface instead of re-validating already-green relational
# queries (VERDICT r1, "Next round" item 3).
_MODULES = [
    f"{_PKG}.operators.dedup",
    f"{_PKG}.operators.similarity",
    f"{_PKG}.operators.textstats",
    f"{_PKG}.operators.multimodal",
    f"{_PKG}.operators.curation",
    f"{_PKG}.operators.graph",
    f"{_PKG}.operators.asof",
    f"{_PKG}.streaming.windows",
    f"{_PKG}.pipeline.queries",
    f"{_PKG}.pipeline.orchestrate",
    f"{_PKG}.sources.html_table",
    f"{_PKG}.sources.html_dom",
    f"{_PKG}.functions.scalars",
    f"{_PKG}.operators.skew",
    f"{_PKG}.plans.relational",
    f"{_PKG}.plans.advanced",
]


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
    return out


def all_oracles() -> dict[str, str]:
    from automated_dow30_earnings_reports_spark.plans import flagship

    out: dict[str, str] = {"flagship_revenue_by_nation": flagship.FLAGSHIP_ORACLE}
    for mod in _iter_modules():
        out.update(mod.ORACLES)
    return out
