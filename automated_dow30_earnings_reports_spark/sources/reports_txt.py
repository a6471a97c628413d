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


def split_http_only(reports: DataFrame) -> tuple[DataFrame, DataFrame]:
    """P8 — the reference's http-only gate (download_reports.py:318-321
    skips any report whose URL is missing or not http(s)). Returns
    (downloadable, dead_letter); the dead-letter frame keeps the rows
    instead of silently dropping them, so the skip is auditable."""
    ok = F.col("url").isNotNull() & F.col("url").startswith("http")
    return reports.filter(ok), reports.filter(~F.coalesce(ok, F.lit(False)))


# ---------------------------------------------------------------------------
# Oracled round trip exercising P8: derive Report-format lines from the
# documents table — with a deliberate mix of https/http/ftp/javascript/
# missing URLs — write them in the reference's str(Report) line format
# (extract_reports.py:150-153), re-scan, and split http-only vs
# dead-letter. The oracle recomputes the per-category split straight
# from documents, so a parse slip, an over-eager gate (e.g. one that
# drops https), or a dead-letter miscount breaks the value hash.
# ---------------------------------------------------------------------------

import os as _os

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

_SCRATCH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
    ".scratch",
    "reports_txt_sink",
)

_CATEGORIES = ["Earnings Release", "Presentation", "Annual Report", "Webcast"]


def _derived_reports(d: DataFrame) -> DataFrame:
    cat = F.element_at(
        F.array(*[F.lit(c) for c in _CATEGORIES]), (F.col("doc_id") % 4 + 1).cast("int")
    )
    url = (
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.lit("https://ir.example.com/r/"), "doc_id"))
        .when(F.col("doc_id") % 5 == 1, F.concat(F.lit("http://ir.example.com/r/"), "doc_id"))
        .when(F.col("doc_id") % 5 == 2, F.concat(F.lit("ftp://ir.example.com/r/"), "doc_id"))
        .when(F.col("doc_id") % 5 == 3, F.lit("javascript:void(0)"))
        # doc_id % 5 == 4 → missing URL (serialized as url='')
    )
    return d.select(
        F.concat(F.lit("report "), "doc_id").alias("title"),
        cat.alias("category"),
        url.alias("url"),
        (F.lit(2020) + F.col("doc_id") % 6).cast("int").alias("year"),
        (F.lit(1) + F.col("doc_id") % 4).cast("int").alias("quarter"),
    )


def to_report_lines(df: DataFrame) -> DataFrame:
    """Serialize REPORTS rows to the reference's ``str(report)`` line
    format — quoted strings, bare ints (extract_reports.py:150-153)."""
    return df.select(
        F.concat(
            F.lit("title='"), F.coalesce("title", F.lit("")),
            F.lit("' category='"), F.coalesce("category", F.lit("")),
            F.lit("' url='"), F.coalesce("url", F.lit("")),
            F.lit("' year="), F.coalesce(F.col("year").cast("string"), F.lit("0")),
            F.lit(" quarter="), F.coalesce(F.col("quarter").cast("string"), F.lit("0")),
        ).alias("value")
    )


def reports_http_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 driver-checked: Report line sink → S2-variant scan →
    http-only/dead-letter split (ref download_reports.py:318-321),
    rolled up per category. Scale shape: write + scan + one groupBy —
    the gate itself is a codegen predicate on the scan."""
    from automated_dow30_earnings_reports_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        scratch_path,
    )

    path = scratch_path(_SCRATCH, sf_dir)  # THE shared keying contract
    to_report_lines(_derived_reports(d)).write.mode("overwrite").text(path)
    back = read_reports(spark, path)
    ok, dead = split_http_only(back)
    tagged = ok.withColumn("downloadable", F.lit(True)).unionByName(
        dead.withColumn("downloadable", F.lit(False))
    )
    return (
        tagged.groupBy("category")
        .agg(
            F.count("*").cast("bigint").alias("n_reports"),
            F.sum(F.when(F.col("downloadable"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_downloadable"),
            F.sum(F.when(~F.col("downloadable"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dead_letter"),
            F.sum(F.when(F.col("url").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_missing_url"),
            F.min(F.when(F.col("downloadable"), F.col("url"))).alias("first_http_url"),
            F.max(F.when(F.col("downloadable"), F.col("year")))
            .cast("int")
            .alias("max_http_year"),
        )
        .orderBy("category")
    )


QUERIES["reports_http_filter"] = reports_http_filter
ORACLES["reports_http_filter"] = """
    WITH derived AS (
      SELECT CASE CAST(doc_id % 4 AS INTEGER)
               WHEN 0 THEN 'Earnings Release'
               WHEN 1 THEN 'Presentation'
               WHEN 2 THEN 'Annual Report'
               ELSE 'Webcast' END AS category,
             CASE WHEN doc_id % 5 = 0 THEN 'https://ir.example.com/r/' || doc_id
                  WHEN doc_id % 5 = 1 THEN 'http://ir.example.com/r/' || doc_id
                  WHEN doc_id % 5 = 2 THEN 'ftp://ir.example.com/r/' || doc_id
                  WHEN doc_id % 5 = 3 THEN 'javascript:void(0)'
                  ELSE NULL END AS url,
             CAST(2020 + doc_id % 6 AS INTEGER) AS year
      FROM documents
    ),
    gated AS (
      SELECT category, url, year,
             (url IS NOT NULL AND url LIKE 'http%') AS downloadable
      FROM derived
    )
    SELECT category,
           CAST(COUNT(*) AS BIGINT) AS n_reports,
           CAST(COUNT(*) FILTER (downloadable) AS BIGINT) AS n_downloadable,
           CAST(COUNT(*) FILTER (NOT downloadable) AS BIGINT) AS n_dead_letter,
           CAST(COUNT(*) FILTER (url IS NULL) AS BIGINT) AS n_missing_url,
           MIN(CASE WHEN downloadable THEN url END) AS first_http_url,
           CAST(MAX(CASE WHEN downloadable THEN year END) AS INTEGER) AS max_http_year
    FROM gated
    GROUP BY category
    ORDER BY category
"""
