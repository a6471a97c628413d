"""S3 JSON sink / S4 JSON scan for the nested run ledger.

One JSON document per company run (ref simple_metadata_collector.py:121-130),
with the nested ``downloaded_files`` array (:97-107). The reference
leaves downloaded_files[].year/quarter as strings (regex captures,
metadata/metadata_Apple_20251010_142849.json:23-24); ``normalize_ledger``
casts them to int — the type normalization SURVEY §7(c) calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.schemas import COMPANY_RUN_METADATA


def read_ledger(spark: SparkSession, path: str) -> DataFrame:
    """S4: read the ledger directory with the explicit nested schema
    (schema-on-read dynamics of the reference replaced by a declared
    StructType — bad documents become null rows, not silent dict
    mutations)."""
    return spark.read.schema(COMPANY_RUN_METADATA).option("multiLine", True).json(path)


def normalize_ledger(df: DataFrame) -> DataFrame:
    """Cast downloaded_files[].year/quarter string→int (null on junk,
    matching the engine-wide cast semantics F15)."""
    return df.withColumn(
        "downloaded_files",
        F.transform(
            "downloaded_files",
            lambda f: F.struct(
                f.title.alias("title"),
                f.size.alias("size"),
                f.checksum.alias("checksum"),
                f.quarter.cast("int").alias("quarter"),
                f.year.cast("int").alias("year"),
                f.url.alias("url"),
                f.download_timestamp.alias("download_timestamp"),
                f.source_page.alias("source_page"),
                f.file_type.alias("file_type"),
            ),
        ),
    )


def explode_files(df: DataFrame) -> DataFrame:
    """Per-file analysis view: one row per downloaded file with company
    context (the ledger's A11 rollup, inverted)."""
    return df.select(
        "company",
        "ticker",
        "status",
        F.explode_outer("downloaded_files").alias("f"),
    ).select("company", "ticker", "status", "f.*")


def write_ledger(df: DataFrame, path: str) -> None:
    """S3: JSON sink, one document per row."""
    df.write.mode("overwrite").json(path)
