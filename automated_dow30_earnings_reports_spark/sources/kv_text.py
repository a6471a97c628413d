"""S2 key-value text scan / S7 text sink.

The reference serializes DocumentLink records as one ``key='value'``
line per record (src/orchestrator.py:77-81) and re-parses them with
regexes (src/orchestrator.py:111-125, src/download_reports.py:302-347).
Here both directions are declarative: the scan is `spark.read.text` +
one `regexp_extract` per column (a narrow projection Catalyst fuses
into the scan), the sink a `concat_ws` projection + `write.text`.

Multi-line values: the reference's full_html fields can contain
newlines, which its own regex parser silently mis-parses (each line is
parsed independently). We parse line-oriented records and treat
records whose href is missing as the dead-letter channel instead of
guessing — same observable behavior for well-formed data, explicit
failure channel for the rest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.schemas import DOCUMENT_LINKS

_KV_COLUMNS = [f.name for f in DOCUMENT_LINKS.fields]

# Schema field -> serialized key. The reference writes DocumentLink.href
# as url='…' and link_type as type='…' (orchestrator.py:77-81; see
# ir_links/financial_links_3M.txt:1), so the scan maps keys back.
_FIELD_TO_KEY = {"href": "url", "link_type": "type"}


def _extract_field(line: Column, field: str) -> Column:
    """Boundary-anchored key='value' capture: (?:^|\\s)key=' so that
    type=' never matches inside document_type='…'."""
    key = _FIELD_TO_KEY.get(field, field)
    pat = rf"(?:^|\s){key}='([^']*)'"
    return F.nullif(F.regexp_extract(line, pat, 1), F.lit(""))


def parse_kv_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse key='value' record lines into DOCUMENT_LINKS columns."""
    cols = [_extract_field(F.col(value_col), name).alias(name) for name in _KV_COLUMNS]
    return lines.select(*cols)


def read_document_links(spark: SparkSession, path: str) -> DataFrame:
    """S2 scan: links file → typed rows. Rows without an href go to the
    dead-letter frame (access via .filter('href IS NULL'))."""
    return parse_kv_lines(spark.read.text(path))


def _serializable(col: Column, name: str) -> Column:
    """The line format cannot represent ``'`` or newlines inside a value
    (the reader regex ``'([^']*)'`` would silently truncate, a newline
    would split one record into two). Fail loudly at write time instead
    of corrupting silently — same contract as KVLinksWriter."""
    bad = col.contains("'") | col.contains("\n") | col.contains("\r")
    return F.when(
        bad,
        F.raise_error(
            F.concat(
                F.lit(f"kv line format cannot encode quote/newline in {name}: "), col
            )
        ),
    ).otherwise(col)


def to_kv_lines(df: DataFrame) -> DataFrame:
    """Serialize DOCUMENT_LINKS-shaped rows to the reference's record
    line format (column order fixed by the schema, field names mapped
    to the reference's serialized keys). Values containing ``'`` or a
    newline raise at execution rather than round-tripping corrupted."""
    parts = []
    for name in _KV_COLUMNS:
        key = _FIELD_TO_KEY.get(name, name)
        val = _serializable(F.coalesce(F.col(name), F.lit("")), name)
        parts.append(F.concat(F.lit(f"{key}='"), val, F.lit("'")))
    return df.select(F.concat_ws(" ", *parts).alias("value"))


def write_document_links(df: DataFrame, path: str) -> None:
    """S7 sink: one record line per row (ref orchestrator.py:73-84)."""
    to_kv_lines(df).write.mode("overwrite").text(path)


# ---------------------------------------------------------------------------
# Oracled round trip: derive DOCUMENT_LINKS-shaped rows from the
# documents table, write them through the key='value' text sink
# (ref orchestrator.py:73-84), read them back through the S2 scan, and
# aggregate. The oracle recomputes from documents, so serialization
# slips (key mapping, null-as-empty, boundary anchoring) break the
# value hash. full_html stays NULL in the derived rows — the '' → NULL
# nullif channel is part of what the round trip checks.
# ---------------------------------------------------------------------------

import os as _os

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

_SCRATCH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
    ".scratch",
    "kv_text_sink",
)


def text_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+S7 driver-checked round trip of the reference's DocumentLink
    line format (serialize: orchestrator.py:77-81; parse:
    orchestrator.py:111-125)."""
    from automated_dow30_earnings_reports_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    ext = (
        F.when(F.col("n_chars") % 3 == 0, "pdf")
        .when(F.col("n_chars") % 3 == 1, "html")
        .otherwise("txt")
    )
    links = d.select(
        F.concat(F.lit("https://docs.example.com/"), F.col("doc_id"), F.lit("."), ext).alias("href"),
        F.col("source").alias("text"),
        F.concat(F.lit("doc "), F.col("doc_id")).alias("title"),
        F.when(ext == "pdf", "document").otherwise("page").alias("link_type"),
        ext.alias("file_extension"),
        F.upper(ext).alias("document_type"),
        F.concat(F.lit("https://docs.example.com/"), F.col("source")).alias("source_url"),
        F.lit(None).cast("string").alias("full_html"),
    )
    path = _os.path.join(_SCRATCH, _os.path.basename(sf_dir.rstrip("/")))
    write_document_links(links, path)
    back = read_document_links(spark, path)
    return (
        back.groupBy("link_type", "file_extension")
        .agg(
            F.count("*").cast("bigint").alias("n_links"),
            F.count_distinct("href").cast("bigint").alias("n_hrefs"),
            F.min("href").alias("first_href"),
            F.sum(F.when(F.col("full_html").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_null_html"),
        )
        .orderBy("link_type", "file_extension")
    )


QUERIES["text_sink_roundtrip"] = text_sink_roundtrip
ORACLES["text_sink_roundtrip"] = """
    WITH links AS (
      SELECT 'https://docs.example.com/' || doc_id || '.' ||
               CASE WHEN n_chars % 3 = 0 THEN 'pdf'
                    WHEN n_chars % 3 = 1 THEN 'html'
                    ELSE 'txt' END AS href,
             CASE WHEN n_chars % 3 = 0 THEN 'document' ELSE 'page' END AS link_type,
             CASE WHEN n_chars % 3 = 0 THEN 'pdf'
                  WHEN n_chars % 3 = 1 THEN 'html'
                  ELSE 'txt' END AS file_extension
      FROM documents
    )
    SELECT link_type, file_extension,
           CAST(COUNT(*) AS BIGINT) AS n_links,
           CAST(COUNT(DISTINCT href) AS BIGINT) AS n_hrefs,
           MIN(href) AS first_href,
           CAST(COUNT(*) AS BIGINT) AS n_null_html
    FROM links
    GROUP BY link_type, file_extension
    ORDER BY link_type, file_extension
"""
