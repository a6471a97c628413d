"""Effectful pipeline stages (SURVEY §2.10): dead-letter channels,
sink idempotency, BFS crawl determinism — all on deterministic fakes."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.pipeline.crawl import bfs_crawl, extract_links
from automated_dow30_earnings_reports_spark.pipeline.download import (
    download_stage,
    failing_transport,
    fake_transport,
)
from automated_dow30_earnings_reports_spark.pipeline.fetch import (
    failing_fetcher,
    fake_ir_site_fetcher,
    fetch_stage,
)
from automated_dow30_earnings_reports_spark.pipeline.llm_extract import (
    failing_llm_extractor,
    fake_llm_extractor,
    llm_extract_stage,
)


def test_fetch_stage_dead_letter(spark):
    df = spark.createDataFrame(
        [("A", "https://ir.a.example.com"), ("B", "https://bad.example.com")],
        ["company", "url"],
    )
    out = fetch_stage(df, lambda: failing_fetcher("bad")).collect()
    by_co = {r.company: r for r in out}
    assert by_co["A"].http_status == 200 and by_co["A"].fetch_error is None
    assert "<a href=" in by_co["A"].html
    assert by_co["B"].html is None
    assert "ConnectionError" in by_co["B"].fetch_error  # task survived


def test_fetch_deterministic(spark):
    df = spark.createDataFrame([("A", "https://ir.a.example.com")], ["company", "url"])
    h1 = fetch_stage(df, fake_ir_site_fetcher).collect()[0].html
    h2 = fetch_stage(df, fake_ir_site_fetcher).collect()[0].html
    assert h1 == h2


def test_llm_extract_udtf_shape_and_dead_letter(spark):
    links_text = "\n".join(
        [
            "title='Q2 2024 Earnings' url='https://x.com/q2-2024-earnings.pdf'",
            "title='Nav page' url='https://x.com/about.html'",
            "title='Supplement' url='https://x.com/fy-q3-2023-data.pdf'",
        ]
    )
    df = spark.createDataFrame(
        [("Good", links_text), ("FAILCO", links_text)], ["company", "links_text"]
    )
    out = llm_extract_stage(df, lambda: failing_llm_extractor("FAIL")).collect()
    good = [r for r in out if r.company == "Good"]
    bad = [r for r in out if r.company == "FAILCO"]
    # UDTF shape: 1 input row -> 2 report rows (only the PDFs)
    assert len(good) == 2 and all(r.extract_error is None for r in good)
    assert {r.url for r in good} == {
        "https://x.com/q2-2024-earnings.pdf",
        "https://x.com/fy-q3-2023-data.pdf",
    }
    r = next(r for r in good if "q2" in r.url)
    assert (r.year, r.quarter, r.category) == (2024, 2, "Earnings Release")
    # dead-letter: exactly one error row, schema intact
    assert len(bad) == 1 and "RuntimeError" in bad[0].extract_error and bad[0].url is None


def test_llm_extract_truncation_and_model(spark):
    long_text = ("word " * 100) + "url='https://x.com/q1-2023.pdf'"
    df = spark.createDataFrame([("C", long_text)], ["company", "links_text"])
    # truncate cuts before the URL -> no reports; model switches on size
    out = llm_extract_stage(
        df, fake_llm_extractor, truncate_chars=50, model_threshold=10
    ).collect()
    assert out == [] or all(r.url is None for r in out)
    out2 = llm_extract_stage(df, fake_llm_extractor, model_threshold=10).collect()
    assert out2[0].model_used == "model-large-context"


def test_llm_extract_rate_limiter(spark):
    """Partition-local token bucket: 3 calls at >=0.4s spacing in one
    partition must take >=0.8s wall (the reference's 30s lock-file gap,
    scaled down; SURVEY §7 hard (a))."""
    import time

    rows = [(f"C{i}", "url='https://x.com/q1-2024.pdf'") for i in range(3)]
    df = spark.createDataFrame(rows, ["company", "links_text"]).coalesce(1)
    t0 = time.time()
    out = llm_extract_stage(df, fake_llm_extractor, min_interval=0.4).collect()
    elapsed = time.time() - t0
    assert len(out) == 3
    assert elapsed >= 0.8, f"throttle not applied: {elapsed:.2f}s"


def test_download_stage_idempotent_and_dead_letter(spark, tmp_path):
    out_dir = str(tmp_path / "dl")
    df = spark.createDataFrame(
        [("https://x.com/files/a-2024.pdf",), ("https://x.com/bad/b.pdf",)], ["url"]
    )
    res1 = {r.url: r for r in download_stage(df, out_dir, lambda: failing_transport("bad")).collect()}
    ok = res1["https://x.com/files/a-2024.pdf"]
    assert ok.success and ok.filename == "a-2024.pdf" and ok.file_size == 1024 + 37 * len(ok.url)
    assert os.path.getsize(ok.file_path) == ok.file_size
    assert len(ok.checksum) == 32
    failed = res1["https://x.com/bad/b.pdf"]
    assert not failed.success and "ConnectionError" in failed.error and failed.file_path is None
    # no torn temp files left behind
    assert not [f for f in os.listdir(out_dir) if ".part-" in f]
    # re-run (task retry semantics): same bytes, same checksum, no dup files
    res2 = {r.url: r for r in download_stage(df, out_dir, lambda: failing_transport("bad")).collect()}
    assert res2["https://x.com/files/a-2024.pdf"].checksum == ok.checksum
    assert len(os.listdir(out_dir)) == 1


def test_extract_links_classification(spark):
    html = (
        '<a href="/files/Q1-2024.pdf" title="Q1 2024">PDF</a>'
        '<a href="https://ir.a.example.com/results" title="Results">Quarterly Results</a>'
        '<a href="https://other.com/x">External</a>'
        '<a href="mailto:x@y.com">Mail</a>'
    )
    pages = spark.createDataFrame(
        [("A", "https://ir.a.example.com/investors", html)], ["company", "url", "html"]
    )
    rows = {r.href: r for r in extract_links(pages).collect()}
    assert rows["https://ir.a.example.com/files/Q1-2024.pdf"].link_type == "document"
    assert rows["https://ir.a.example.com/files/Q1-2024.pdf"].document_type == "PDF Document"
    assert rows["https://ir.a.example.com/results"].link_type == "internal"
    assert rows["https://other.com/x"].link_type == "external"
    assert rows["mailto:x@y.com"].link_type == "invalid"


def test_bfs_crawl_deterministic_and_depth_limited(spark):
    seeds = spark.createDataFrame(
        [("ACME", "https://ir.acme.example.com/investors")], ["company", "url"]
    )
    docs1 = bfs_crawl(spark, seeds, fake_ir_site_fetcher, max_depth=1, top_k=2)
    rows1 = sorted(r.href for r in docs1.collect())
    assert len(rows1) > 0
    assert all(h.endswith(".pdf") for h in rows1)
    # deterministic across runs
    docs2 = bfs_crawl(spark, seeds, fake_ir_site_fetcher, max_depth=1, top_k=2)
    assert sorted(r.href for r in docs2.collect()) == rows1
    # deeper crawl discovers at least as much
    docs_d2 = bfs_crawl(spark, seeds, fake_ir_site_fetcher, max_depth=2, top_k=2)
    assert len(docs_d2.collect()) >= len(rows1)
    # depth-0 crawl: only the seed page's own documents
    docs_d0 = bfs_crawl(spark, seeds, fake_ir_site_fetcher, max_depth=0, top_k=2)
    assert {r.source_url for r in docs_d0.collect()} == {"https://ir.acme.example.com/investors"}


def test_bfs_min_year_null_keeping(spark):
    # P5 semantics: pdf with old year dropped, year-less kept
    seeds = spark.createDataFrame([("A", "https://ir.a.example.com")], ["company", "url"])
    docs = bfs_crawl(spark, seeds, fake_ir_site_fetcher, max_depth=0, min_year=2024)
    for r in docs.collect():
        assert r.year is None or r.year >= 2024
