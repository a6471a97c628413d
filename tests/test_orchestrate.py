"""End-to-end pipeline composition (SURVEY §3.1): crawl → extract →
enrich → download → ledger, all fake effects, deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.pipeline.download import failing_transport
from automated_dow30_earnings_reports_spark.pipeline.orchestrate import run_pipeline


def _companies(spark):
    return spark.createDataFrame(
        [
            ("ACME", "https://ir.acme.example.com/investors"),
            ("ZETA", "https://ir.zeta.example.com/investors"),
        ],
        ["company", "url"],
    )


def test_pipeline_end_to_end_shape(spark, tmp_path):
    ledger = run_pipeline(spark, _companies(spark), str(tmp_path / "dl")).cache()
    rows = {r.company: r for r in ledger.collect()}
    assert set(rows) == {"ACME", "ZETA"}
    for r in rows.values():
        assert r.status == "completed" and r.n_failed == 0
        assert r.urls_found > 0 and r.urls_visited > 0
        assert len(r.downloaded_files) > 0
        # no join fanout: one ledger file entry per successfully
        # downloaded report URL, even when companies share URLs
        urls = [f.url for f in r.downloaded_files]
        assert len(urls) == len(set(urls))
        f = r.downloaded_files[0]
        # ledger keeps year/quarter as strings (reference type quirk,
        # SURVEY §1.4) and carries source_page + checksum per file
        assert isinstance(f.year, str) and isinstance(f.quarter, str)
        assert f.checksum and len(f.checksum) == 32
        assert f.url.endswith(".pdf")


def test_pipeline_deterministic(spark, tmp_path):
    a = run_pipeline(spark, _companies(spark), str(tmp_path / "d1"))
    b = run_pipeline(spark, _companies(spark), str(tmp_path / "d2"))
    ka = sorted((r.company, r.urls_found, len(r.downloaded_files)) for r in a.collect())
    kb = sorted((r.company, r.urls_found, len(r.downloaded_files)) for r in b.collect())
    assert ka == kb


def test_pipeline_partial_failure_channel(spark, tmp_path):
    # every download fails -> status 'partial', files empty, counts intact
    ledger = run_pipeline(
        spark,
        _companies(spark),
        str(tmp_path / "dl"),
        transport_factory=lambda: failing_transport("example.com"),
    )
    for r in ledger.collect():
        assert r.status == "partial" and r.n_failed > 0
        assert len(r.downloaded_files) == 0
        assert r.urls_found > 0  # crawl unaffected


def test_pipeline_ledger_roundtrips_json(spark, tmp_path):
    from automated_dow30_earnings_reports_spark.sources.json_ledger import write_ledger

    ledger = run_pipeline(spark, _companies(spark), str(tmp_path / "dl"))
    out = str(tmp_path / "ledger")
    write_ledger(ledger, out)
    back = spark.read.json(out)
    assert back.count() == 2
    assert back.filter(F.size("downloaded_files") > 0).count() == 2


def test_pipeline_ledger_keeps_extraction_failed_companies(spark, tmp_path):
    """Review find: the ledger rolled up from the reports side, so a
    company whose LLM extraction dead-lettered VANISHED from the run
    ledger — the reference writes a failed metadata entry per company
    (orchestrator.py:212-225). It must now surface as status='failed'
    with the error carried through, alongside its crawl counts."""
    from automated_dow30_earnings_reports_spark.pipeline.llm_extract import (
        failing_llm_extractor,
    )

    companies = spark.createDataFrame(
        [
            ("ACME", "https://ir.acme.example.com/investors"),
            ("FAIL_CO", "https://ir.failco.example.com/investors"),
        ],
        ["company", "url"],
    )
    ledger = run_pipeline(
        spark,
        companies,
        str(tmp_path / "dl"),
        extractor_factory=lambda: failing_llm_extractor("FAIL"),
    )
    rows = {r.company: r for r in ledger.collect()}
    assert set(rows) == {"ACME", "FAIL_CO"}  # nobody vanishes
    ok, bad = rows["ACME"], rows["FAIL_CO"]
    assert ok.status == "completed" and ok.extract_error is None
    assert bad.status == "failed"
    assert "model refused" in bad.extract_error
    assert bad.urls_found > 0 and bad.urls_visited > 0  # crawl counts kept
    assert bad.downloaded_files == [] and bad.n_failed == 0


def test_pipeline_prompt_payload_sanitizes_quotes(spark, tmp_path):
    """A crawled title containing a quote must not truncate (or forge)
    the key='value' prompt payload the extractor parses back out."""
    from automated_dow30_earnings_reports_spark.pipeline.fetch import Fetcher

    def quoting_fetcher() -> Fetcher:
        def fetch(url: str):
            if url.endswith("/investors"):
                html = (
                    '<html><a href="https://ir.acme.example.com/q1-2024.pdf" '
                    "title=\"Q1'24 'Earnings'\">Q1 Report</a></html>"
                )
                return (200, "text/html", html, None)
            return (200, "application/pdf", "", None)

        return fetch

    companies = spark.createDataFrame(
        [("ACME", "https://ir.acme.example.com/investors")], ["company", "url"]
    )
    ledger = run_pipeline(
        spark, companies, str(tmp_path / "dl"), fetcher_factory=quoting_fetcher
    ).collect()
    (row,) = ledger
    assert row.status == "completed" and len(row.downloaded_files) == 1
    f = row.downloaded_files[0]
    assert f.url == "https://ir.acme.example.com/q1-2024.pdf"  # not forged/truncated
    assert "Q1" in f.title and "'" not in f.title  # sanitized, not dropped
