"""Unit semantics for the as-of join (tie handling, no-match nulls,
multi-key isolation) and the curation helpers (shingles, split
buckets, packing determinism)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.operators.asof import asof_join
from automated_dow30_earnings_reports_spark.operators.curation import (
    split_bucket,
    shingles_col,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _asof(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "k long, ts timestamp, lv long")
    right = spark.createDataFrame(right_rows, "k long, ts timestamp, rv long")
    out = asof_join(left, right, on="k", ts="ts", payload=["rv"])
    return {r.lv: r.asof_rv for r in out.collect()}


def test_asof_picks_most_recent_at_or_before(spark):
    got = _asof(
        spark,
        [(1, _ts("2024-01-01T10:00"), 100)],
        [
            (1, _ts("2024-01-01T08:00"), 8),
            (1, _ts("2024-01-01T09:00"), 9),
            (1, _ts("2024-01-01T11:00"), 11),  # after: must not match
        ],
    )
    assert got == {100: 9}


def test_asof_equal_timestamp_matches(spark):
    # DuckDB ASOF uses >=: a right row at exactly the left ts matches
    got = _asof(
        spark,
        [(1, _ts("2024-01-01T10:00"), 100)],
        [(1, _ts("2024-01-01T10:00"), 10)],
    )
    assert got == {100: 10}


def test_asof_no_prior_row_is_null(spark):
    got = _asof(
        spark,
        [(1, _ts("2024-01-01T10:00"), 100)],
        [(1, _ts("2024-01-01T12:00"), 12)],
    )
    assert got == {100: None}


def test_asof_keys_are_isolated(spark):
    # key 2's rows must never leak into key 1's matches
    got = _asof(
        spark,
        [(1, _ts("2024-01-01T10:00"), 100), (2, _ts("2024-01-01T10:00"), 200)],
        [(2, _ts("2024-01-01T09:00"), 9)],
    )
    assert got == {100: None, 200: 9}


def test_asof_left_columns_pass_through(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00"), 7)], "k long, ts timestamp, lv long"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00"), 3)], "k long, ts timestamp, rv long"
    )
    out = asof_join(left, right, on="k", ts="ts", payload=["rv"])
    assert set(out.columns) == {"k", "ts", "lv", "asof_rv"}
    assert out.count() == 1


def test_word_shingles_counts_and_short_text(spark):
    df = spark.createDataFrame(
        [("a b c d e",), ("a b",)], "text string"
    ).select(shingles_col(F.col("text"), 3).alias("s"))
    got = [r.s for r in df.collect()]
    assert got[0] == ["a b c", "b c d", "c d e"]
    assert got[1] == []  # shorter than n → empty, not null


def test_split_bucket_range_and_determinism(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    b = df.select(split_bucket(F.col("doc_id")).alias("b"))
    rows = [r.b for r in b.collect()]
    assert all(0 <= x < 100 for x in rows)
    # pure function of the id: same ids → same buckets on re-evaluation
    assert rows == [r.b for r in b.collect()]
    # roughly uniform: every decile is populated on 500 ids
    assert len({x // 10 for x in rows}) == 10


def test_sequence_packing_bins_are_capacity_bounded(spark, sf_smoke):
    from automated_dow30_earnings_reports_spark.operators.curation import (
        sequence_packing,
    )

    out = sequence_packing(spark, sf_smoke).collect()
    assert out, "expected at least one bin"
    for r in out:
        assert r.n_docs >= 1
        # a bin only exceeds capacity via its final straddling doc, so
        # tokens < 2048 + max single doc; sanity: no empty/negative bins
        assert r.n_tokens > 0 and r.bin >= 0
