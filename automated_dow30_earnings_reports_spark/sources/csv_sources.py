"""S1 CSV scan / S5 CSV sink / S6 Excel sink.

The companies dimension (ref dow30_companies.csv, loaded at
src/orchestrator.py:245-261 with csv.DictReader) becomes an
explicit-schema header CSV scan; company names contain commas inside
quotes (dow30_companies.csv:27), which Spark's CSV parser handles with
default quoting exactly like csv.DictReader did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from automated_dow30_earnings_reports_spark.schemas import COMPANIES, IR_PAGES

_COMPANIES_CSV_HEADER = ["Ticker", "Company", "Sector", "Investor_Relations_URL", "Last_Updated"]


def read_companies(spark: SparkSession, path: str) -> DataFrame:
    """S1: companies dim with explicit schema (header names in the file
    are the reference's; we rename to engine-schema names)."""
    df = (
        spark.read.option("header", True)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .schema(COMPANIES)  # THE schema, not a parallel DDL string
        .csv(path)
    )
    return df


def read_ir_pages(spark: SparkSession, path: str) -> DataFrame:
    """S1 variant: IR-page discovery results
    (ref src/scrapers/dow30_ir_pages_*.csv, find_IR_pgs_v1.py:538-544)."""
    return (
        spark.read.option("header", True)
        .schema(IR_PAGES)
        .csv(path)
    )


def write_csv(df: DataFrame, path: str) -> None:
    """S5 sink (ref get30DowTickers.py:188-223). Timestamps serialize
    in the reference's ``yyyy-MM-dd HH:mm:ss`` format so a write →
    ``read_companies`` round trip is lossless at second granularity."""
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path)
    )


def write_excel(df: DataFrame, path: str) -> bool:
    """S6 Excel sink (ref get30DowTickers.py:239-244). Driver-side via
    pandas — only valid for small dimension tables by design. Returns
    False when no xlsx writer engine is installed (env without
    openpyxl), mirroring the reference's optional behavior."""
    try:
        df.toPandas().to_excel(path, index=False)
        return True
    except ImportError:
        return False


__all__ = [
    "COMPANIES",
    "IR_PAGES",
    "read_companies",
    "read_ir_pages",
    "write_csv",
    "write_excel",
]


# ---------------------------------------------------------------------------
# Oracled round trip: derive a companies-style dimension from
# nation x region — with a comma INSIDE every company name, the exact
# hazard the reference's dim carries (dow30_companies.csv:27) — write
# it through the CSV sink, read it back through the companies scan,
# aggregate. The oracle recomputes from the base tables, so quoting
# slips, header drift, timestamp-format mismatch, or type loss in the
# CSV path all break the value hash.
# ---------------------------------------------------------------------------

import os as _os

from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

_SCRATCH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
    ".scratch",
    "csv_sink",
)


def csv_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+S5 driver-checked round trip (ref write:
    get30DowTickers.py:188-223, read: orchestrator.py:245-261)."""
    from automated_dow30_earnings_reports_spark.tables import load_table

    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dim = n.join(r, n.n_regionkey == r.r_regionkey).select(
        F.col("n_name").alias("ticker"),
        F.concat(F.col("n_name"), F.lit(", Inc.")).alias("company"),
        F.col("r_name").alias("sector"),
        F.concat(F.lit("https://ir.example.com/"), F.lower(F.col("n_name"))).alias(
            "ir_url"
        ),
        F.expr(
            "make_timestamp(2025, 10, n_nationkey % 28 + 1, 14, 28, n_nationkey % 60)"
        ).alias("last_updated"),
    )
    path = _os.path.join(_SCRATCH, _os.path.basename(sf_dir.rstrip("/")))
    write_csv(
        dim.toDF(*_COMPANIES_CSV_HEADER),
        path,
    )
    back = read_companies(spark, path)
    return (
        back.groupBy("sector")
        .agg(
            F.count("*").cast("bigint").alias("n_companies"),
            F.sum(F.when(F.col("company").contains(","), 1).otherwise(0))
            .cast("bigint")
            .alias("n_quoted"),
            F.min("ticker").alias("first_ticker"),
            F.max("last_updated").alias("latest_update"),
        )
        .orderBy("sector")
    )


QUERIES["csv_sink_roundtrip"] = csv_sink_roundtrip
ORACLES["csv_sink_roundtrip"] = """
    SELECT r.r_name AS sector,
           CAST(COUNT(*) AS BIGINT) AS n_companies,
           CAST(COUNT(*) AS BIGINT) AS n_quoted,
           MIN(n.n_name) AS first_ticker,
           MAX(make_timestamp(2025, 10, n.n_nationkey % 28 + 1, 14, 28, n.n_nationkey % 60))
             AS latest_update
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
"""
