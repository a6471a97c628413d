"""Seeded fuzz parity for SCD2 run-collapse: the lag/running-sum/lead
window pipeline must agree with a plain-Python reference over random
event streams dense with same-second ties — the case where the
deterministic (es, event_id) ordering actually decides versions."""

from __future__ import annotations

import random
from collections import defaultdict

import pytest


def _gen_events(seed: int, n: int = 200):
    rng = random.Random(seed)
    # 4 users x 30-second grid x 3 types => heavy collisions
    return [
        (rng.randint(0, 3), i, rng.choice(["a", "b", "c"]), rng.randint(0, 29))
        for i in range(n)
    ]


def _python_scd2(rows):
    by_user = defaultdict(list)
    for u, eid, typ, es in rows:
        by_user[u].append((es, eid, typ))
    out = []
    for u, evs in by_user.items():
        evs.sort()
        versions = []
        for es, _eid, typ in evs:
            if not versions or versions[-1][0] != typ:
                versions.append([typ, es, 1])
            else:
                versions[-1][2] += 1
        for i, (typ, vfrom, cnt) in enumerate(versions):
            vto = versions[i + 1][1] if i + 1 < len(versions) else None
            out.append((u, i + 1, typ, vfrom, vto, cnt))
    return sorted(out)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_scd2_matches_python_reference(spark, seed):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = _gen_events(seed)
    e = spark.createDataFrame(
        rows, "user_id int, event_id int, event_type string, es long"
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    prev = F.lag("event_type").over(w)
    versions = e.withColumn(
        "chg", (prev.isNull() | (F.col("event_type") != prev)).cast("int")
    ).withColumn("version", F.sum("chg").over(w))
    g = versions.groupBy("user_id", "version", "event_type").agg(
        F.min("es").alias("valid_from"), F.count("*").alias("n_events")
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    got = sorted(
        tuple(r)
        for r in g.select(
            "user_id",
            "version",
            "event_type",
            "valid_from",
            F.lead("valid_from").over(wv).alias("valid_to"),
            "n_events",
        ).collect()
    )
    assert got == _python_scd2(rows)
