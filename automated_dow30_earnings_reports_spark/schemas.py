"""Explicit StructTypes for every record type in the engine.

The reference keeps all schemas implicit (dicts + regex parses); only
`Report` is declared (pydantic, reference src/extract_reports.py:68-73).
Here every record type is an explicit StructType so scans validate
types at the boundary and Catalyst can prune columns.

Citations point into /root/reference/ for parity checking.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# companies — dimension table (reference dow30_companies.csv:1,
# loaded at src/orchestrator.py:245-261). Small dim => always broadcastable.
# ---------------------------------------------------------------------------
COMPANIES = StructType(
    [
        StructField("ticker", StringType(), False),
        StructField("company", StringType(), False),
        StructField("sector", StringType(), True),  # empty for most rows
        StructField("ir_url", StringType(), True),
        StructField("last_updated", TimestampType(), True),
    ]
)

# ---------------------------------------------------------------------------
# document_links — crawl fact table (reference DocumentLink,
# src/enhanced_selenium_scraper.py:41-120; serialized one key='value'
# line per record, src/orchestrator.py:77-81). Dedup key is href.
# ---------------------------------------------------------------------------
DOCUMENT_LINKS = StructType(
    [
        StructField("href", StringType(), False),
        StructField("text", StringType(), True),
        StructField("title", StringType(), True),
        StructField("link_type", StringType(), True),
        StructField("file_extension", StringType(), True),  # derived (ref :54-58)
        StructField("document_type", StringType(), True),  # derived (ref :60-86)
        StructField("source_url", StringType(), True),
        StructField("full_html", StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# reports — LLM-extracted records (reference pydantic Report,
# src/extract_reports.py:68-73; reparsed src/download_reports.py:302-347).
# ---------------------------------------------------------------------------
REPORTS = StructType(
    [
        StructField("title", StringType(), True),
        StructField("category", StringType(), True),
        StructField("url", StringType(), False),
        StructField("year", IntegerType(), True),
        StructField("quarter", IntegerType(), True),
    ]
)

# ---------------------------------------------------------------------------
# company_run_metadata — nested run ledger (reference
# src/simple_metadata_collector.py:40-58; array element :97-107).
# The reference leaves downloaded_files[].year/quarter as *strings*
# (regex captures, see metadata/metadata_Apple_20251010_142849.json:23-24);
# we read them as strings and normalize to int in sources/json_ledger.py.
# ---------------------------------------------------------------------------
DOWNLOADED_FILE = StructType(
    [
        StructField("title", StringType(), True),
        StructField("size", LongType(), True),
        StructField("checksum", StringType(), True),  # 32-hex MD5 (ref :132-142)
        StructField("quarter", StringType(), True),  # string in ref — normalized downstream
        StructField("year", StringType(), True),
        StructField("url", StringType(), True),
        StructField("download_timestamp", StringType(), True),
        StructField("source_page", StringType(), True),
        StructField("file_type", StringType(), True),
    ]
)

COMPANY_RUN_METADATA = StructType(
    [
        StructField("company", StringType(), False),
        StructField("ticker", StringType(), True),
        StructField("ir_url", StringType(), True),
        StructField("pipeline_start_time", StringType(), True),
        StructField("pipeline_end_time", StringType(), True),
        StructField("status", StringType(), True),
        StructField("error_message", StringType(), True),
        StructField("scraping_start_time", StringType(), True),
        StructField("scraping_end_time", StringType(), True),
        StructField("urls_visited", LongType(), True),
        StructField("urls_found", LongType(), True),
        StructField("extraction_start_time", StringType(), True),
        StructField("extraction_end_time", StringType(), True),
        StructField("model_used", StringType(), True),
        StructField("download_start_time", StringType(), True),
        StructField("download_end_time", StringType(), True),
        StructField("downloaded_files", ArrayType(DOWNLOADED_FILE), True),
    ]
)

# ---------------------------------------------------------------------------
# file_metadata — per-download record (reference
# src/simple_metadata_collector.py:147-166; failed-download variant
# src/orchestrator.py:212-225). `success` partitions the dead-letter channel.
# DOCUMENTATION SCHEMA: the running engine splits this record across two
# live shapes — download.DOWNLOAD_RESULT_SCHEMA (the transport result:
# path/size/checksum/content_type/success/error) and the per-file struct
# inside COMPANY_RUN_METADATA's downloaded_files (the ledger view) —
# kept here as the reference-shape reference the two were derived from.
# ---------------------------------------------------------------------------
FILE_METADATA = StructType(
    [
        StructField("filename", StringType(), True),
        StructField("file_path", StringType(), True),
        StructField("file_size", LongType(), True),
        StructField("url", StringType(), True),
        StructField("title", StringType(), True),
        StructField("category", StringType(), True),
        StructField("year", IntegerType(), True),
        StructField("quarter", IntegerType(), True),
        StructField("download_timestamp", StringType(), True),
        StructField("source_url", StringType(), True),
        StructField("file_extension", StringType(), True),
        StructField("success", BooleanType(), False),
    ]
)

# ---------------------------------------------------------------------------
# ir_pages — discovery results (reference src/scrapers/find_IR_pgs_v1.py:538-544).
# ---------------------------------------------------------------------------
IR_PAGES = StructType(
    [
        StructField("ticker", StringType(), False),
        StructField("company", StringType(), True),
        StructField("website", StringType(), True),
        StructField("ir_url", StringType(), True),
        StructField("status", StringType(), True),  # 'Found' | 'Not Found'
    ]
)
