"""S2 variant — extracted-reports text scan.

The reference writes LLM-extracted ``Report`` records as ``str(report)``
lines (extract_reports.py:150-153): quoted strings for title/category/
url, *bare ints* for year/quarter (pydantic repr), e.g.
extracted_reports/extracted_reports_3M.txt:1. They are re-parsed by
regex in download_reports.parse_report_file (:302-347). Same here,
declaratively: one regexp per column, int casts null on junk (F15),
rows without a URL are the dead-letter channel (ref :318-321 skips
non-http URLs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_report_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    v = F.col(value_col)

    def quoted(key: str):
        return F.nullif(F.regexp_extract(v, rf"(?:^|\s){key}='([^']*)'", 1), F.lit(""))

    def bare_int(key: str):
        return F.nullif(F.regexp_extract(v, rf"(?:^|\s){key}=(\d+)", 1), F.lit("")).cast("int")

    return lines.select(
        quoted("title").alias("title"),
        quoted("category").alias("category"),
        quoted("url").alias("url"),
        bare_int("year").alias("year"),
        bare_int("quarter").alias("quarter"),
    )


def read_reports(spark: SparkSession, path: str) -> DataFrame:
    """Extracted-reports file(s) → typed REPORTS rows."""
    return parse_report_lines(spark.read.text(path))
