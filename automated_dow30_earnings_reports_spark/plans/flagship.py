"""Flagship star-schema query: revenue by nation.

lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region with a region filter, a
date-range filter, groupBy + agg, orderBy. Exercises the reference's
J1-class enrichment joins, P-class filters, and A-class aggregations in
one query (SURVEY.md §7 step 1).

Scale design:
  - nation/region are fixed-cardinality dims → explicit broadcast hints
    so the two smallest joins never shuffle the fact table.
  - customer is broadcastable at test SF and below ~10 MB generally;
    at 100 TB customer would exceed the threshold and AQE picks a
    sort-merge join on the shuffled keys — the declarative plan is the
    same either way.
  - The date filter sits directly on the lineitem scan → parquet
    predicate pushdown + column pruning (only 4 of 11 lineitem columns
    are read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.tables import load_table


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation for orders shipped in 1996-1998, AMERICA+EUROPE."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("rev")

    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1999-01-01"))
        )
        .select("l_orderkey", revenue)
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.where(F.col("r_name").isin("AMERICA", "EUROPE"))),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("rev"), 2).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


FLAGSHIP_ORACLE = """
SELECT r_name,
       n_name,
       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1999-01-01'
  AND r_name IN ('AMERICA', 'EUROPE')
GROUP BY r_name, n_name
ORDER BY revenue DESC, n_name
"""
