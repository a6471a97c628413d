"""Per-query profiler for the optimization rounds.

For each named query (default: the bench slow tier), run it N times at
the given sf dir, record wall seconds (min as estimator), the number of
Spark jobs each run submitted (StatusTracker delta — every job is a
driver-side barrier, the fixed-overhead currency of composed lifecycle
verbs), and optionally dump `.explain("formatted")` of the returned
frame to plans/<tag>/<query>_<suffix>.txt.

Usage:
  python scripts/qprof.py [--sf DIR] [--n N] [--plans TAG_DIR_SUFFIX] q1 q2 ...
  python scripts/qprof.py --all            # every bench headline query
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()




def _next_job_id(sc) -> int:
    v = sc._jsc.sc().dagScheduler().nextJobId()
    try:
        return int(v)
    except (TypeError, ValueError):
        return int(v.get())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--all", action="store_true")
    ap.add_argument(
        "--plans",
        default=None,
        help="dump explain('formatted') to plans/r10/<query>_<PLANS>.txt",
    )
    ap.add_argument("--json", default=None, help="write results to this json file")
    args = ap.parse_args()

    from automated_dow30_earnings_reports_spark.session import get_spark

    import bench
    import __spark_entry__ as entrymod

    spark = get_spark("qprof")
    sc = spark.sparkContext
    qs = entrymod.queries()
    names = bench.HEADLINE if args.all else args.names
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(here, "plans", "r10")
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    # Warm each plan shape once at sf0.001 (codegen cache is keyed on
    # generated source = plan shape) so timings measure steady state.
    results: dict[str, dict] = {}
    for name in names:
        try:
            qs[name](spark, "/root/testdata/sf0.001").collect()
        except Exception as exc:  # noqa: BLE001
            print(f"[WARM-FAIL] {name}: {exc}", file=sys.stderr)
    def job_counter() -> int:
        # Spark job ids are a monotonically increasing AtomicInteger on
        # the DAGScheduler; the delta across a run = jobs submitted.
        try:
            return _next_job_id(sc)
        except Exception:  # noqa: BLE001
            return -1

    for name in names:
        times = []
        jobs = []
        rows = None
        for _ in range(args.n):
            sc.setJobDescription(f"qprof:{name}")
            j0 = job_counter()
            t0 = time.time()
            try:
                df = qs[name](spark, args.sf)
                out = df.collect()
            except Exception as exc:  # noqa: BLE001
                print(f"[FAIL] {name}: {type(exc).__name__}: {exc}"[:300], file=sys.stderr)
                break
            times.append(time.time() - t0)
            jobs.append(job_counter() - j0 if j0 >= 0 else -1)
            rows = len(out)
            sc.setJobDescription(None)
        if not times:
            continue
        results[name] = {
            "min": round(min(times), 3),
            "runs": [round(t, 3) for t in times],
            "jobs": jobs[-1],
            "rows": rows,
        }
        if args.plans:
            df = qs[name](spark, args.sf)
            with open(
                os.path.join(plans_dir, f"{name}_{args.plans}.txt"), "w"
            ) as fh:
                fh.write(plan_of(df))
        print(
            f"{results[name]['min']:7.2f}s  {name}  jobs={results[name]['jobs']}"
            f"  runs={results[name]['runs']}"
        )
    total = round(sum(r["min"] for r in results.values()), 2)
    print(f"TOTAL(min) {total}s over {len(results)} queries")
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(results, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
