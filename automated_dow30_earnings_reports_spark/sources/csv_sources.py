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
        .schema(
            "ticker string, company string, sector string, ir_url string, last_updated timestamp"
        )
        .csv(path)
    )
    return df


def read_ir_pages(spark: SparkSession, path: str) -> DataFrame:
    """S1 variant: IR-page discovery results
    (ref src/scrapers/dow30_ir_pages_*.csv, find_IR_pgs_v1.py:538-544)."""
    return (
        spark.read.option("header", True)
        .schema("ticker string, company string, website string, ir_url string, status string")
        .csv(path)
    )


def write_csv(df: DataFrame, path: str) -> None:
    """S5 sink (ref get30DowTickers.py:188-223)."""
    df.write.mode("overwrite").option("header", True).csv(path)


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
