"""Incremental-crawl streaming surface: streaming dedup, foreachBatch
crawl with replay-safe sink, applyInPandasWithState visited-set."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.pipeline.fetch import fake_ir_site_fetcher
from automated_dow30_earnings_reports_spark.streaming.incremental import (
    dedup_links_stream,
    new_links_stateful,
    start_incremental_crawl,
)

LINKS_SCHEMA = "ts timestamp, company string, href string"


def _write_links_file(spark, d, rows):
    spark.createDataFrame(rows, LINKS_SCHEMA).coalesce(1).write.mode("append").parquet(str(d))


def test_dedup_links_stream(spark, tmp_path):
    import datetime as dt

    src = tmp_path / "links"
    t0 = dt.datetime(2025, 1, 1, 12, 0, 0)
    _write_links_file(
        spark,
        src,
        [
            (t0, "A", "https://a/x.pdf"),
            (t0, "A", "https://a/x.pdf"),  # dup within batch
            (t0, "A", "https://a/y.pdf"),
        ],
    )
    stream = spark.readStream.schema(LINKS_SCHEMA).parquet(str(src))
    q = (
        dedup_links_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_links")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.href for r in spark.sql("SELECT * FROM dedup_links").collect()}
    assert got == {"https://a/x.pdf", "https://a/y.pdf"}
    assert spark.sql("SELECT * FROM dedup_links").count() == 2


def test_incremental_crawl_and_replay_safety(spark, tmp_path):
    seeds = tmp_path / "seeds"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    seeds.mkdir()
    (seeds / "batch1.txt").write_text("ACME,https://ir.acme.example.com\n")

    q = start_incremental_crawl(
        spark, str(seeds), str(out), str(ckpt), fake_ir_site_fetcher
    )
    q.awaitTermination(180)
    first = spark.read.parquet(str(out))
    n1 = first.count()
    assert n1 > 0
    assert first.filter(F.col("company") == "ACME").count() == n1
    # no (company, href) dups
    assert first.dropDuplicates(["company", "href"]).count() == n1

    # second run: same seed again + one new seed; committed links must
    # not be re-appended (anti-join replay safety), new company adds rows
    (seeds / "batch2.txt").write_text(
        "ACME,https://ir.acme.example.com\nZETA,https://ir.zeta.example.com\n"
    )
    q2 = start_incremental_crawl(
        spark, str(seeds), str(out), str(ckpt), fake_ir_site_fetcher
    )
    q2.awaitTermination(180)
    second = spark.read.parquet(str(out))
    assert second.dropDuplicates(["company", "href"]).count() == second.count()
    assert second.filter(F.col("company") == "ACME").count() == n1  # unchanged
    assert second.filter(F.col("company") == "ZETA").count() > 0


def test_tumbling_append_mode_watermark_semantics(spark, tmp_path):
    """Late-data contract of the windowed aggs: in append mode a window
    emits only once the watermark (max ts - 10 min) passes its end, and
    events older than the watermark are dropped, not re-aggregated."""
    import datetime as dt

    from automated_dow30_earnings_reports_spark.streaming.windows import tumbling_counts

    src = tmp_path / "ev"
    ckpt = str(tmp_path / "ck")
    sink = str(tmp_path / "sink")
    schema = "ts timestamp, event_type string, value double"

    def run_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(str(src))
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            tumbling_counts(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        try:
            return [tuple(r) for r in spark.read.parquet(sink).collect()]
        except Exception:  # sink still empty -> no parquet files yet
            return []

    t = lambda h, m: dt.datetime(2025, 1, 1, h, m)
    # batch 1: two events in the 10:00 window -> nothing finalized yet
    out1 = run_batch([(t(10, 5), "click", 1.0), (t(10, 20), "click", 2.0)])
    assert out1 == []
    # batch 2: 12:00 event advances watermark to 11:50 -> 10:00 window emits
    out2 = run_batch([(t(12, 0), "click", 4.0)])
    assert ("2025-01-01 10:00:00", "click", 2, 3.0) in out2
    # batch 3: a too-late event (10:30 < watermark) must be dropped;
    # 14:00 advances the watermark past the 12:00 window
    out3 = run_batch([(t(10, 30), "click", 100.0), (t(14, 0), "click", 8.0)])
    assert ("2025-01-01 12:00:00", "click", 1, 4.0) in out3
    # the dropped late event never surfaces in any 10:00-window row
    assert not any(r[0] == "2025-01-01 10:00:00" and r[3] != 3.0 for r in out3)


def test_new_links_stateful_across_batches(spark, tmp_path):
    import datetime as dt

    src = tmp_path / "links2"
    t0 = dt.datetime(2025, 1, 1, 12, 0, 0)
    _write_links_file(
        spark,
        src,
        [(t0, "A", "https://a/1.pdf"), (t0, "A", "https://a/2.pdf"), (t0, "B", "https://b/1.pdf")],
    )
    stream = spark.readStream.schema(LINKS_SCHEMA).parquet(str(src)).drop("ts")
    q = (
        new_links_stateful(stream)
        .writeStream.format("memory")
        .queryName("fresh_links")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT * FROM fresh_links").count() >= 3:
                break
            time.sleep(1)
        assert spark.sql("SELECT * FROM fresh_links").count() == 3

        # batch 2: one repeat (state hit) + one new
        _write_links_file(
            spark, src, [(t0, "A", "https://a/1.pdf"), (t0, "A", "https://a/3.pdf")]
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT * FROM fresh_links").count() >= 4:
                break
            time.sleep(1)
        rows = {(r.company, r.href) for r in spark.sql("SELECT * FROM fresh_links").collect()}
        assert ("A", "https://a/3.pdf") in rows
        assert len(rows) == 4  # the repeat was filtered by state
    finally:
        q.stop()


def test_dedup_within_watermark_ttl_semantics(spark, tmp_path):
    """dropDuplicatesWithinWatermark contract: duplicates inside the
    TTL are suppressed; once the watermark passes first-sight + delay,
    the key's state is evicted and the same href re-admits."""
    import datetime as dt

    from automated_dow30_earnings_reports_spark.streaming.incremental import (
        dedup_links_within_watermark,
    )

    src = tmp_path / "links"
    ckpt = str(tmp_path / "ck2")
    sink = str(tmp_path / "sink2")
    schema = "ts timestamp, href string"

    def run_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            str(src)
        )
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            dedup_links_within_watermark(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        try:
            return [(r.ts, r.href) for r in spark.read.parquet(sink).collect()]
        except Exception:
            return []

    t = lambda h, m: dt.datetime(2025, 1, 1, h, m)
    out1 = run_batch([(t(10, 0), "a")])
    assert [h for _, h in out1] == ["a"]
    # duplicate within the 10-minute TTL -> suppressed; new key passes
    out2 = run_batch([(t(10, 5), "a"), (t(10, 6), "b")])
    assert sorted(h for _, h in out2) == ["a", "b"]
    # advance the watermark past 10:00 + 10min -> a's state evicts
    out3 = run_batch([(t(11, 0), "c")])
    assert sorted(h for _, h in out3) == ["a", "b", "c"]
    # same href after eviction -> re-admitted (the TTL difference vs
    # plain dropDuplicates)
    out4 = run_batch([(t(10, 55), "a")])
    assert sorted(h for _, h in out4) == ["a", "a", "b", "c"]
