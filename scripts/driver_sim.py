"""Simulate the driver's verify pass against __spark_entry__.py.

Builds a VANILLA SparkSession (none of session.py's tuning — the real
driver brings its own), then:
  1. smoke: entry(spark) at sf0.001, collect rows
  2. correctness: every queries()[name] at sf0.01 vs oracle_sql()[name]
     through DuckDB (row count + columns + order-insensitive values)

Exit code 0 iff everything matches. Usage:
  python scripts/driver_sim.py            # full pass (round-end ritual)
  python scripts/driver_sim.py kmv quant  # only queries whose name
                                          # contains any given substring
                                          # (smoke check skipped)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from tests.oracle_harness import compare, duckdb_conn  # noqa: E402


def main() -> int:
    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    only = sys.argv[1:]
    if not only:
        t0 = time.time()
        df = e.entry(spark)
        rows = df.collect()
        print(f"[smoke] entry() -> {len(rows)} rows, schema={df.columns} ({time.time()-t0:.1f}s)")
        assert len(rows) > 0

    qs = e.queries()
    oracles = e.oracle_sql()
    if only:
        qs = {n: f for n, f in qs.items() if any(s in n for s in only)}
        print(f"[filter] {len(qs)} queries match {only}")
        if not qs:
            # A typo'd filter must not read as a green verify run.
            print("[filter] ERROR: no queries match — check the name(s)")
            return 2
    sf = "/root/testdata/sf0.01"
    con = duckdb_conn(sf)
    failures = 0
    for name in sorted(qs):
        t0 = time.time()
        sdf = qs[name](spark, sf)
        if name not in oracles:
            n = sdf.count()
            print(f"[rows-only] {name}: {n} rows ({time.time()-t0:.1f}s)")
            continue
        oracle_pdf = con.execute(oracles[name]).fetchdf()
        problems = compare(name, sdf, oracle_pdf)
        status = "OK" if not problems else "MISMATCH"
        print(f"[{status}] {name} ({time.time()-t0:.1f}s)")
        for p in problems:
            failures += 1
            print("   ", p)
    print(f"done: {len(qs)} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
