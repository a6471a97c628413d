"""Table-driven unit tests for the scalar library's tricky semantics
(SURVEY.md §5.3): F2 year/quarter patterns, F7 urljoin cases, F9
Content-Disposition, F10 content-type mapping, F11 filename coalesce,
F18 smart truncation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.functions import (
    build_filename,
    content_type_extension,
    extract_kv,
    extract_quarter,
    extract_year,
    file_extension,
    parse_content_disposition,
    sanitize_filename,
    smart_truncate,
)
from automated_dow30_earnings_reports_spark.functions.scalars import resolve_url


def _eval(spark, col, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return [r[0] for r in df.select(col).collect()]


YEAR_QUARTER_CASES = [
    # (input, year, quarter) — formats from ref enhanced_selenium_scraper.py:315-352
    ("Q3 2025 Earnings Release", 2025, 3),
    ("FY25 Q3 Report", 2025, 3),
    ("fy-25 q3", 2025, 3),
    ("3Q25 results", 2025, 3),
    ("report-2024-q1.pdf", 2024, 1),
    ("Annual Report 1998", 1998, None),
    ("FY99 outlook", 1999, None),
    ("4Q99 earnings", 1999, 4),
    ("investor relations home", None, None),
    ("Second quarter deck Q2 2023", 2023, 2),
    ("Q5 2024", 2024, None),  # quarter out of range -> null
]


@pytest.mark.parametrize("text,year,quarter", YEAR_QUARTER_CASES)
def test_extract_year_quarter(spark, text, year, quarter):
    df = spark.createDataFrame([(text,)], "s string")
    row = df.select(
        extract_year(F.col("s")).alias("y"), extract_quarter(F.col("s")).alias("q")
    ).first()
    assert (row.y, row.q) == (year, quarter), text


RESOLVE_CASES = [
    # (base, href, expected) — urljoin semantics for the crawl's cases (F7)
    ("https://ir.ex.com/a/b.html", "https://other.com/x.pdf", "https://other.com/x.pdf"),
    ("https://ir.ex.com/a/b.html", "//cdn.ex.com/x.pdf", "https://cdn.ex.com/x.pdf"),
    ("https://ir.ex.com/a/b.html", "/docs/x.pdf", "https://ir.ex.com/docs/x.pdf"),
    ("https://ir.ex.com/a/b.html", "x.pdf", "https://ir.ex.com/a/x.pdf"),
    ("https://ir.ex.com/a/", "sub/x.pdf", "https://ir.ex.com/a/sub/x.pdf"),
]


@pytest.mark.parametrize("base,href,expected", RESOLVE_CASES)
def test_resolve_url(spark, base, href, expected):
    df = spark.createDataFrame([(base, href)], "base string, href string")
    got = df.select(resolve_url(F.col("base"), F.col("href")).alias("u")).first().u
    assert got == expected


CD_CASES = [
    # RFC 6266 forms (ref download_reports.py:349-363)
    ('attachment; filename="q3-2025.pdf"', "q3-2025.pdf"),
    ("attachment; filename=report.pdf", "report.pdf"),
    ("attachment; filename*=UTF-8''r%C3%A9port.pdf; filename=\"fallback.pdf\"", "r%C3%A9port.pdf"),
    ("inline", None),
]


@pytest.mark.parametrize("header,expected", CD_CASES)
def test_content_disposition(spark, header, expected):
    df = spark.createDataFrame([(header,)], "h string")
    got = df.select(parse_content_disposition(F.col("h")).alias("f")).first().f
    assert got == expected


CT_CASES = [
    ("application/pdf", ".pdf"),
    ("application/vnd.openxmlformats-officedocument.spreadsheetml.sheet", ".xlsx"),
    ("text/html; charset=utf-8", ".html"),
    ("application/octet-stream", ".bin"),
    ("text/plain", ".txt"),
]


@pytest.mark.parametrize("ct,expected", CT_CASES)
def test_content_type_extension(spark, ct, expected):
    df = spark.createDataFrame([(ct,)], "c string")
    assert df.select(content_type_extension(F.col("c")).alias("e")).first().e == expected


def test_build_filename_priorities(spark):
    rows = [
        # title+year+quarter present -> derived name (priority 1)
        ("Q3 Report", 2025, 3, ".pdf", "cd.pdf", "https://x.com/a/last.pdf", "Q3 Report_2025Q3.pdf"),
        # missing year -> content-disposition name (priority 2)
        ("Q3 Report", None, 3, ".pdf", "cd.pdf", "https://x.com/a/last.pdf", "cd.pdf"),
        # no cd -> URL last segment (priority 3)
        (None, None, None, ".pdf", None, "https://x.com/a/last.pdf?v=1", "last.pdf"),
        # nothing -> download{ext}
        (None, None, None, ".pdf", None, "https://x.com/", "download.pdf"),
    ]
    df = spark.createDataFrame(
        rows,
        "title string, year int, quarter int, ext string, cd string, url string, expected string",
    )
    out = df.select(
        build_filename(
            F.col("title"), F.col("year"), F.col("quarter"), F.col("ext"), F.col("cd"), F.col("url")
        ).alias("f"),
        "expected",
    ).collect()
    for r in out:
        assert r.f == r.expected


def test_sanitize_filename(spark):
    df = spark.createDataFrame([('a<b>:c"/d\\e|f?g*h.pdf',)], "s string")
    got = df.select(sanitize_filename(F.col("s")).alias("x")).first().x
    assert got == "a_b__c__d_e_f_g_h.pdf"


def test_smart_truncate(spark):
    cases = [
        ("short text", "short text"),  # under limit -> unchanged
        ("a" * 30, "a" * 20),  # no space in window -> hard cut
        ("word1 word2 word3 word4xyz", "word1 word2 word3"),  # backs up to last space
    ]
    for text, expected in cases:
        df = spark.createDataFrame([(text,)], "s string")
        got = df.select(smart_truncate(F.col("s"), 20).alias("t")).first().t
        assert got == expected, text


def test_extract_kv_missing_key(spark):
    df = spark.createDataFrame([("href='http://x' text='hi'",)], "s string")
    row = df.select(
        extract_kv(F.col("s"), "href").alias("href"),
        extract_kv(F.col("s"), "title").alias("title"),
    ).first()
    assert row.href == "http://x"
    assert row.title is None


def test_file_extension_edge_cases(spark):
    cases = [
        ("https://x.com/a/report.PDF", "pdf"),
        ("https://x.com/a/report.pdf?dl=1", "pdf"),
        ("https://x.com/a/page", ""),  # extension-less: '' not 'com/a/page'
        ("https://x.com/archive.tar.gz", "gz"),
    ]
    for url, expected in cases:
        df = spark.createDataFrame([(url,)], "s string")
        assert df.select(file_extension(F.col("s")).alias("e")).first().e == expected, url
