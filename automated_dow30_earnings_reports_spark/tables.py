"""Loaders for the driver-generated star schema + LLM-pipeline tables.

All tables live as single parquet files under an sf directory
(TESTDATA.md). At 100 TB these would be partitioned datasets; the
loaders take any path Spark can list, so nothing here changes — the
scan parallelism comes from parquet row groups / file splits.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)
AUX_TABLES = ("events", "documents", "embeddings")
ALL_TABLES = STAR_TABLES + AUX_TABLES

# Dimension tables small enough to broadcast at any realistic SF
# (region=5 rows, nation=25 rows — fixed-cardinality dims).
BROADCAST_DIMS = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in ALL_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {ALL_TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) which Spark cannot read as a
        # timestamp (PARQUET_TYPE_ILLEGAL). Read nanos as long and truncate
        # to Spark's native microsecond timestamps. Event-time queries
        # aggregate at >= second granularity, so the truncation is invisible
        # to the DuckDB oracles.
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in ALL_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql(...) works."""
    for name in ALL_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
