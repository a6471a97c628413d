"""Partitioned parquet lake (sources/parquet_lake.py): directory
pruning, dynamic partition overwrite, file-count control."""

from __future__ import annotations

import contextlib
import io
import os

from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
    read_lake,
    write_partitioned,
)
from automated_dow30_earnings_reports_spark.tables import load_table


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partition_pruning_reaches_scan(spark, sf_smoke, tmp_path):
    ev = load_table(spark, sf_smoke, "events")
    lake = str(tmp_path / "events_lake")
    write_partitioned(ev, lake, ["event_type"])

    back = read_lake(spark, lake)
    pruned = back.filter(F.col("event_type") == "click")

    plan = _formatted_plan(pruned)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1][:200], (
        "partition predicate did not reach the scan as a directory prune"
    )
    # value parity with the source-side filter
    want = ev.filter(F.col("event_type") == "click").count()
    assert pruned.count() == want > 0


def test_round_trip_values_and_layout(spark, sf_smoke, tmp_path):
    ev = load_table(spark, sf_smoke, "events")
    lake = str(tmp_path / "lake")
    write_partitioned(ev, lake, ["event_type"], sort_within=["ts"])

    # hive layout: one directory per partition value, one file each
    dirs = sorted(d for d in os.listdir(lake) if d.startswith("event_type="))
    types = sorted(r.event_type for r in ev.select("event_type").distinct().collect())
    assert dirs == [f"event_type={t}" for t in types]
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(lake, d)) if f.endswith(".parquet")]
        assert len(files) == 1  # files_per_partition=1 default

    back = read_lake(spark, lake)
    assert back.count() == ev.count()
    # full value parity (partition col round-trips through dir names)
    a = sorted(map(tuple, ev.select("event_id", "event_type", "value").collect()))
    b = sorted(map(tuple, back.select("event_id", "event_type", "value").collect()))
    assert a == b


def test_dynamic_overwrite_replaces_only_written_partitions(spark, sf_smoke, tmp_path):
    ev = load_table(spark, sf_smoke, "events").select("event_id", "event_type", "value")
    lake = str(tmp_path / "dyn")
    write_partitioned(ev, lake, ["event_type"])
    total_before = read_lake(spark, lake).count()
    click_before = read_lake(spark, lake).filter(F.col("event_type") == "click").count()

    # incremental job: rewrite ONLY the 'click' partition, halved
    clicks = ev.filter(F.col("event_type") == "click").limit(click_before // 2)
    write_partitioned(clicks, lake, ["event_type"], dynamic=True)

    after = read_lake(spark, lake)
    assert after.filter(F.col("event_type") == "click").count() == click_before // 2
    # untouched partitions keep all their rows
    assert (
        after.filter(F.col("event_type") != "click").count()
        == total_before - click_before
    )


def test_files_per_partition_salting(spark, sf_smoke, tmp_path):
    ev = load_table(spark, sf_smoke, "events")
    lake = str(tmp_path / "salted")
    write_partitioned(ev, lake, ["event_type"], files_per_partition=3)
    d = next(x for x in os.listdir(lake) if x.startswith("event_type="))
    files = [f for f in os.listdir(os.path.join(lake, d)) if f.endswith(".parquet")]
    assert 1 < len(files) <= 3
    assert read_lake(spark, lake).count() == ev.count()


def test_lake_compaction_file_counts(spark, sf_correctness):
    """Compaction really collapses the file count and keeps content."""
    import os

    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        COMPACT_FRAGMENTS,
        COMPACT_TARGET_FILES,
        _SCRATCH_COMPACT,
        lake_compaction,
        scratch_path,
    )

    rows = lake_compaction(spark, sf_correctness).collect()
    assert rows
    assert all(r.files_before == COMPACT_FRAGMENTS for r in rows)
    assert all(r.files_after == COMPACT_TARGET_FILES for r in rows)
    # physical layout agrees with the reported counts — derived through
    # scratch_path (the keying contract), not a hand-built basename:
    # the hand-built path predated the r6 hash-suffix scheme and only
    # kept passing against stale pre-r6 scratch dirs (fresh sandboxes
    # exposed it as FileNotFoundError).
    base = scratch_path(_SCRATCH_COMPACT, sf_correctness)
    n_frag = sum(
        1 for f in os.listdir(os.path.join(base, "fragmented")) if f.endswith(".parquet")
    )
    n_comp = sum(
        1 for f in os.listdir(os.path.join(base, "compacted")) if f.endswith(".parquet")
    )
    assert (n_frag, n_comp) == (COMPACT_FRAGMENTS, COMPACT_TARGET_FILES)


def test_dpp_join_prunes_partitions_at_runtime(spark, sf_smoke):
    """The partitioned-fact ⋈ filtered-dim join must carry a
    dynamicpruningexpression in the fact scan's PartitionFilters —
    runtime directory pruning, not static."""
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        dpp_partitioned_join,
    )
    from pyspark.sql import functions as F

    out = dpp_partitioned_join(spark, sf_smoke)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    rows = out.collect()
    assert rows and all(r.o_year % 3 == 0 for r in rows)
    # cross-check one year against the base table
    o = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    y = rows[0].o_year
    n = o.where(F.year("o_orderdate") == y).count()
    assert rows[0].n_orders == n
