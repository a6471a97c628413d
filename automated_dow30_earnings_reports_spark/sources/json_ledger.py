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


def read_ledger(spark: SparkSession, path: str, multiline: bool = True) -> DataFrame:
    """S4: read the ledger directory with the explicit nested schema
    (schema-on-read dynamics of the reference replaced by a declared
    StructType — bad documents become null rows, not silent dict
    mutations).

    ``multiline`` selects the container layout and MUST match the
    producer: True for the reference's pretty-printed one-document-
    per-file ledgers (src/simple_metadata_collector.py:121-130) —
    Spark's multiLine JSON parses exactly ONE top-level value per
    file, so records after the first in such a file are silently
    dropped; False for line-delimited JSON as written by
    ``write_ledger`` (the Spark-native layout, any records per file).
    Pinned in tests/test_sinks.py::test_ledger_multiline_contract."""
    return (
        spark.read.schema(COMPANY_RUN_METADATA)
        .option("multiLine", multiline)
        .json(path)
    )


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
    """S3: JSON sink, one document per row, line-delimited (read back
    with ``read_ledger(..., multiline=False)``)."""
    df.write.mode("overwrite").json(path)


# ---------------------------------------------------------------------------
# Oracled round trip: derive a nested per-nation run ledger from the
# base tables, write it through the JSON sink, read it back with the
# declared schema (line-delimited mode), normalize the string
# year/quarter captures to int, explode the nested array, and
# aggregate. The oracle recomputes the same numbers straight from
# nation/customer/orders, so any field loss, nesting mix-up, cast
# drift, or (the sharp edge this query exists for) multiline-mode
# record loss breaks the value hash.
# ---------------------------------------------------------------------------

import os as _os

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

_SCRATCH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
    ".scratch",
    "json_ledger",
)

_LEDGER_TOPK = 5  # downloaded_files per company


def json_ledger_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3+S4 driver-checked round trip (ref ledger shape:
    src/simple_metadata_collector.py:40-58,97-107). One ledger row per
    nation; downloaded_files holds the nation's _LEDGER_TOPK smallest
    order keys as file records with STRING year/quarter (the
    reference's regex-capture typing), normalized to int after
    read-back."""
    from pyspark.sql import Window

    from automated_dow30_earnings_reports_spark.tables import load_table

    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    w = Window.partitionBy("c_nationkey").orderBy("o_orderkey")
    top = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_nationkey", "o_orderkey", "o_totalprice", "o_orderdate")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _LEDGER_TOPK)
    )
    files = top.select(
        "c_nationkey",
        F.struct(
            F.concat(F.lit("order_"), F.col("o_orderkey")).alias("title"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("size"),
            F.md5(F.col("o_orderkey").cast("string")).alias("checksum"),
            F.quarter("o_orderdate").cast("string").alias("quarter"),
            F.year("o_orderdate").cast("string").alias("year"),
            F.concat(F.lit("https://docs.example.com/"), F.col("o_orderkey")).alias(
                "url"
            ),
            F.lit(None).cast("string").alias("download_timestamp"),
            F.lit(None).cast("string").alias("source_page"),
            F.lit("pdf").alias("file_type"),
        ).alias("f"),
    )
    per_nation = files.groupBy("c_nationkey").agg(
        F.collect_list("f").alias("downloaded_files"),
        F.count("*").cast("bigint").alias("urls_found"),
    )
    ledger = n.join(
        per_nation, n.n_nationkey == per_nation.c_nationkey, "left"
    ).select(
        F.col("n_name").alias("company"),
        F.col("n_nationkey").cast("string").alias("ticker"),
        F.lit("completed").alias("status"),
        F.coalesce(F.col("urls_found"), F.lit(0)).cast("bigint").alias("urls_found"),
        "downloaded_files",
    )
    path = _os.path.join(_SCRATCH, _os.path.basename(sf_dir.rstrip("/")))
    write_ledger(ledger, path)
    # Line-delimited read-back; missing schema fields (ir_url, the
    # timestamps, ...) come back null — schema-on-read, not an error.
    back = read_ledger(spark, path, multiline=False)
    ex = explode_files(normalize_ledger(back))
    return (
        ex.groupBy("company")
        .agg(
            F.max("status").alias("status"),
            F.count("title").cast("bigint").alias("n_files"),
            F.sum("size").cast("bigint").alias("total_size"),
            F.max("year").cast("int").alias("latest_year"),
            F.max("quarter").cast("int").alias("max_quarter"),
            F.count_distinct("checksum").cast("bigint").alias("n_checksums"),
        )
        .orderBy("company")
    )


QUERIES["json_ledger_roundtrip"] = json_ledger_roundtrip
ORACLES["json_ledger_roundtrip"] = f"""
    WITH ranked AS (
      SELECT c.c_nationkey, o.o_orderkey, o.o_totalprice, o.o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY c.c_nationkey ORDER BY o.o_orderkey) AS rk
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    top AS (SELECT * FROM ranked WHERE rk <= {_LEDGER_TOPK})
    SELECT n.n_name AS company,
           'completed' AS status,
           CAST(COUNT(t.o_orderkey) AS BIGINT) AS n_files,
           CAST(SUM(CAST(CAST(t.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
             AS total_size,
           CAST(MAX(EXTRACT(year FROM t.o_orderdate)) AS INT) AS latest_year,
           CAST(MAX(EXTRACT(quarter FROM t.o_orderdate)) AS INT) AS max_quarter,
           CAST(COUNT(DISTINCT md5(CAST(t.o_orderkey AS VARCHAR))) AS BIGINT) AS n_checksums
    FROM nation n LEFT JOIN top t ON n.n_nationkey = t.c_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
"""
