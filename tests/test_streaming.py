"""Structured Streaming parity: the window transformations produce the
same results on a readStream source (availableNow trigger) as on the
batch DataFrame that the DuckDB oracle already validates."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.streaming.windows import (
    sliding_counts,
    tumbling_counts,
)
from automated_dow30_earnings_reports_spark.tables import load_table, read_events_stream


@pytest.fixture(scope="module")
def events_stream_dir(tmp_path_factory, sf_smoke):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_smoke}/events.parquet", d / "events.parquet")
    return str(d)


@pytest.mark.parametrize(
    "name,transform",
    [("tumbling", tumbling_counts), ("sliding", sliding_counts)],
)
def test_stream_matches_batch(spark, sf_smoke, events_stream_dir, name, transform):
    batch = transform(load_table(spark, sf_smoke, "events")).collect()

    stream_df = transform(read_events_stream(spark, events_stream_dir))
    q = (
        stream_df.writeStream.format("memory")
        .queryName(f"win_{name}")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(f"SELECT * FROM win_{name}").collect()

    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    assert len(got) > 0


def test_stream_stream_interval_join_matches_batch(spark, sf_smoke, events_stream_dir):
    from automated_dow30_earnings_reports_spark.streaming.windows import (
        interval_join_attribution,
    )

    e = load_table(spark, sf_smoke, "events")
    batch = interval_join_attribution(
        e.filter(F.col("event_type") == "view"),
        e.filter(F.col("event_type") == "click"),
    ).collect()

    s = read_events_stream(spark, events_stream_dir)
    joined = interval_join_attribution(
        s.filter(F.col("event_type") == "view"),
        s.filter(F.col("event_type") == "click"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ssjoin").collect()

    assert len(got) > 0
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
