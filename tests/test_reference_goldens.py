"""Golden-artifact parity (SURVEY §5.2): our S2/S4 scans over the
reference's committed outputs must reproduce its record counts and
aggregate facts (BASELINE.md numbers). Read-only on /root/reference."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.sources.json_ledger import (
    explode_files,
    normalize_ledger,
    read_ledger,
)
from automated_dow30_earnings_reports_spark.sources.kv_text import (
    read_document_links,
    to_kv_lines,
)
from automated_dow30_earnings_reports_spark.sources.reports_txt import read_reports

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")


def test_ir_links_3m_scan(spark):
    df = read_document_links(spark, f"{REF}/ir_links/financial_links_3M.txt").cache()
    # 152 physical lines; 108 begin a record (the rest are continuation
    # lines of multi-line full_html values -> dead-letter, href NULL)
    assert df.count() == 152
    recs = df.filter(F.col("href").isNotNull())
    assert recs.count() == 108
    # golden row 1 (financial_links_3M.txt:1)
    r = df.limit(1).collect()[0]
    assert r.href.endswith("Q2+2024+Supplemental+Financial+Schedules.pdf")
    assert r.link_type == "document" and r.file_extension == "pdf"
    assert r.document_type == "PDF Document"
    assert r.source_url == "https://investors.3m.com/financials/quarterly-earnings"
    # dedup key: href (A4) — unique hrefs among well-formed records
    assert recs.dropDuplicates(["href"]).count() == recs.select("href").distinct().count()


def test_ir_links_caterpillar_scan(spark):
    df = read_document_links(spark, f"{REF}/ir_links/financial_links_Caterpillar.txt")
    assert df.count() == 190
    assert df.filter(F.col("href").isNotNull()).count() == 139


def test_kv_roundtrip_on_golden(spark):
    """Parse → serialize → parse must be a fixed point for well-formed
    single-line records (S2/S7 inverse pair)."""
    df = read_document_links(spark, f"{REF}/ir_links/financial_links_3M.txt")
    recs = df.filter(F.col("href").isNotNull() & ~F.col("full_html").contains("\n"))
    lines2 = to_kv_lines(recs)
    from automated_dow30_earnings_reports_spark.sources.kv_text import parse_kv_lines

    reparsed = parse_kv_lines(lines2)
    a = {tuple(r) for r in recs.collect()}
    b = {tuple(r) for r in reparsed.collect()}
    assert a == b


def test_extracted_reports_scan(spark):
    df = read_reports(spark, f"{REF}/extracted_reports/*.txt").cache()
    assert df.count() == 19  # 5+6+5+3 golden records
    ok = df.filter(F.col("url").isNotNull())
    assert ok.count() == 19
    years = {r.year for r in ok.select("year").distinct().collect()}
    assert years <= {2024, 2025}
    quarters = {r.quarter for r in ok.select("quarter").distinct().collect()}
    assert quarters <= {1, 2, 3, 4}
    cats = {r.category for r in ok.select("category").distinct().collect()}
    assert "Earnings Release" in cats
    # golden row: extracted_reports_3M.txt:1
    r3m = ok.filter(F.col("title").contains("3M Reports Second-Quarter 2025")).collect()
    assert len(r3m) == 1 and (r3m[0].year, r3m[0].quarter) == (2025, 2)


def test_metadata_ledger_scan(spark):
    """S4 nested JSON scan reproduces BASELINE.md's fleet facts:
    29 ledgers / 116 files / 234,819,802 bytes / 3,882 links found."""
    df = normalize_ledger(read_ledger(spark, f"{REF}/metadata/*.json")).cache()
    assert df.count() == 29
    assert df.filter(F.col("status") == "completed").count() == 29
    assert df.agg(F.sum("urls_found")).collect()[0][0] == 3882
    files = explode_files(df).filter(F.col("url").isNotNull())
    assert files.count() == 116
    assert files.agg(F.sum("size")).collect()[0][0] == 234_819_802
    # type normalization (SURVEY §7c): year/quarter became ints
    dtypes = dict(files.dtypes)
    assert dtypes["year"] == "int" and dtypes["quarter"] == "int"
    assert files.filter(F.col("checksum").rlike("^[0-9a-f]{32}$")).count() == 116
