"""Equivalence + protocol pins for the r11 optimization round.

Each test pins an invariant an r11 change could have broken:

- the explicit-count repartition in ``write_partitioned`` must still
  produce exactly one file per partition value (the index layout
  contract the r10 AQE-coalesced shape satisfied by accident);
- ``rewrite_table_atomic`` must RECOVER a table whose previous rewrite
  crashed between the swap's two renames (the r10 ADVICE gap);
- ``rollback_orphan_publishes`` must recognize the rewrite sidecars:
  reclaim ``.{t}-rewrite-tmp``, restore-or-reclaim ``.{t}-rewrite-old``;
- the native-source arrival tail must parse kvlinks-format landing
  files identically to the kvlinks batch reader (the r11 streaming
  fix replaced the Python stream reader, not the format);
- the ``load_table`` schema cache must hand back the same schema and
  rows as an inference read (metadata cache, not a result cache).
"""

from __future__ import annotations

import os
import shutil

import pytest

from automated_dow30_earnings_reports_spark.sources import parquet_lake as pl

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scratch", "r11_tests")


@pytest.fixture()
def scratch():
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH)
    yield SCRATCH
    shutil.rmtree(SCRATCH, ignore_errors=True)


def _one_file_per_value(root: str) -> bool:
    for entry in os.listdir(root):
        if entry.startswith("p="):
            n = sum(1 for f in os.listdir(os.path.join(root, entry))
                    if f.endswith(".parquet"))
            if n != 1:
                return False
    return True


def test_write_partitioned_one_file_per_value(spark, scratch):
    df = spark.range(1000).selectExpr("id", "id % 7 as p")
    out = os.path.join(scratch, "t1")
    pl.write_partitioned(df, out, ["p"], dynamic=False)
    assert _one_file_per_value(out)
    parts = {e for e in os.listdir(out) if e.startswith("p=")}
    assert parts == {f"p={i}" for i in range(7)}
    back = spark.read.parquet(out)
    assert back.count() == 1000


def test_rewrite_table_atomic_recovers_parked_old(spark, scratch):
    table = os.path.join(scratch, "tbl")
    spark.range(10).write.mode("overwrite").parquet(table)
    # simulate a crash between the two renames: table dir gone, old parked
    parked = os.path.join(scratch, ".tbl-rewrite-old")
    os.rename(table, parked)
    assert not os.path.exists(table)
    pl.rewrite_table_atomic(spark.range(5).toDF("id"), table)
    back = spark.read.parquet(table)
    assert back.count() == 5  # the rewrite completed from the recovered table
    assert not os.path.exists(parked)


def test_vacuum_scrubs_rewrite_tmp_and_restores_old(spark, scratch):
    root = os.path.join(scratch, "index")
    table = os.path.join(root, "sizes")
    spark.range(10).write.mode("overwrite").parquet(table)
    # a crashed rewrite's stale tmp: must be reclaimed
    tmp = os.path.join(root, ".sizes-rewrite-tmp")
    os.makedirs(tmp)
    with open(os.path.join(tmp, "junk"), "w") as fh:
        fh.write("x")
    report = pl.rollback_orphan_publishes(root)
    assert not os.path.exists(tmp)
    assert report["scratch_dirs"] >= 1
    # a parked old table with the live table MISSING: must be restored
    parked = os.path.join(root, ".sizes-rewrite-old")
    os.rename(table, parked)
    pl.rollback_orphan_publishes(root)
    assert os.path.isdir(table) and not os.path.exists(parked)
    assert spark.read.parquet(table).count() == 10
    # a parked old table with the live table PRESENT: scratch, reclaimed
    os.makedirs(parked)
    pl.rollback_orphan_publishes(root)
    assert not os.path.exists(parked)


def test_arrival_stream_parse_matches_kvlinks_reader(spark, scratch):
    from pyspark.sql import functions as F

    from automated_dow30_earnings_reports_spark.sources.kv_datasource import (
        register,
    )
    from automated_dow30_earnings_reports_spark.sources.kv_text import (
        _extract_field,
    )

    register(spark)
    landing = os.path.join(scratch, "landing")
    ids = spark.range(200).selectExpr("id * 3 as doc_id")
    ids.write.format("kvlinks").option("path", landing).mode("append").save()
    via_kv = {
        r[0]
        for r in spark.read.format("kvlinks")
        .schema("doc_id bigint")
        .option("path", landing)
        .load()
        .collect()
    }
    # the same projection _arrival_stream applies on its readStream
    via_text = {
        r[0]
        for r in spark.read.text(landing)
        .select(_extract_field(F.col("value"), "doc_id").cast("bigint"))
        .collect()
    }
    assert via_text == via_kv == {3 * i for i in range(200)}


def test_load_table_schema_cache_equivalence(spark, sf_smoke):
    import automated_dow30_earnings_reports_spark.tables as T

    T._SCHEMA_CACHE.clear()
    first = T.load_table(spark, sf_smoke, "orders")
    assert any(k.endswith("orders.parquet") for k in T._SCHEMA_CACHE)
    second = T.load_table(spark, sf_smoke, "orders")
    assert second.schema == first.schema
    assert second.count() == first.count()
    ev1 = T.load_table(spark, sf_smoke, "events")
    ev2 = T.load_table(spark, sf_smoke, "events")
    assert ev2.schema == ev1.schema
    assert ev2.count() == ev1.count()
