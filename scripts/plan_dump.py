"""Dump .explain('formatted') for headline queries to plans/<round>/.

Usage: python scripts/plan_dump.py <suffix> [sf_dir] [names...]
  suffix: file suffix, e.g. 'before' -> plans/r10/<q>_before.txt
  names:  default = every bench headline query

Runs each query function once (lifecycle verbs execute their side
effects eagerly) and writes the RETURNED frame's formatted plan.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    suffix = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:]

    from automated_dow30_earnings_reports_spark.session import get_spark

    import bench
    import __spark_entry__ as entrymod

    spark = get_spark("plan-dump")
    qs = entrymod.queries()
    if not names:
        names = bench.HEADLINE

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", os.environ.get("PLAN_ROUND", "r11"))
    os.makedirs(out_dir, exist_ok=True)
    fails = 0
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            print(f"[plan] {name}")
        except Exception as exc:  # noqa: BLE001
            fails += 1
            print(f"[FAIL] {name}: {type(exc).__name__}: {exc}"[:300], file=sys.stderr)
    print(f"done, {fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
