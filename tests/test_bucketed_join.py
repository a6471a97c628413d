"""Bucketing: pre-shuffled co-located joins (SURVEY brief: 'bucketing
for co-located joins'). Writing both sides bucketed by the join key
must eliminate the per-query shuffle: the sort-merge join reads
bucketed scans with NO Exchange on either side."""

from __future__ import annotations

import io
import contextlib

import pytest

from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.tables import load_table

N_BUCKETS = 8


@pytest.fixture()
def bucketed_tables(spark, sf_smoke):
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    load_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    ).write.bucketBy(N_BUCKETS, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
    load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).write.bucketBy(N_BUCKETS, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_bucketed")
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_bucketed_join_has_no_shuffle(spark, sf_smoke, bucketed_tables):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        li = spark.table("li_bucketed")
        orders = spark.table("ord_bucketed")
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain()
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing removed both shuffles

        # and the join is still correct
        n = joined.count()
        expected = (
            load_table(spark, sf_smoke, "lineitem")
            .join(
                load_table(spark, sf_smoke, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert n == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
