"""Regression pins for the round-8 adversarial-review fixes that lack
a dedicated test elsewhere: ANSI division guards on degenerate-but-
legal data, asof NULL semantics, the blocked-GEMM sentinel, silent
connected-components non-convergence, the kvlinks legacy-offset
arrival-order shim, the LLM dead-letter scope, and the multi-line
anchor text capture. Each test constructs exactly the input the bug
needed — none of which occurs in the current testdata (which is WHY
the gates stayed green while the bugs were live)."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from pyspark.sql import functions as F


def test_twap_survives_all_zero_gap_user(spark, monkeypatch):
    """2+ events in the same floor-second -> sum(dt)=0; the division
    used to throw DIVIDE_BY_ZERO under ANSI before the group filter
    could drop it. The group must simply be absent (oracle HAVING)."""
    from automated_dow30_earnings_reports_spark.plans import advanced as adv

    t0 = dt.datetime(2025, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 1, 10.0),  # user 1: both events inside one second
        (2, t0 + dt.timedelta(microseconds=400_000), 1, 20.0),
        (3, t0, 2, 1.0),  # user 2: a real 10 s gap
        (4, t0 + dt.timedelta(seconds=10), 2, 3.0),
        (5, t0 + dt.timedelta(seconds=20), 2, 5.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    monkeypatch.setattr(adv, "load_table", lambda s, sf, t: ev)
    got = {r.user_id: r.twap for r in adv.QUERIES["time_weighted_avg"](spark, "x").collect()}
    assert 1 not in got  # zero-weight group dropped, not crashed
    assert got[2] == pytest.approx((1.0 * 10 + 3.0 * 10) / 20, abs=1e-4)


def test_zscore_survives_constant_group(spark, monkeypatch):
    """A constant-valued event_type has sd=0 (and a 1-row group sd
    NULL): no outliers BY DEFINITION — previously DIVIDE_BY_ZERO."""
    from automated_dow30_earnings_reports_spark.plans import advanced as adv

    t0 = dt.datetime(2025, 1, 1)
    const = [(i, t0, 1, "const", 5.0) for i in range(4)]
    varied = [(10 + i, t0, 1, "varied", float(v)) for i, v in
              enumerate([1, 1, 1, 1, 1, 1, 1, 1, 100])]
    ev = spark.createDataFrame(
        const + varied + [(99, t0, 1, "single", 7.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    monkeypatch.setattr(adv, "load_table", lambda s, sf, t: ev)
    rows = adv.QUERIES["event_anomaly_zscore"](spark, "x").collect()
    assert {r.event_type for r in rows} == {"varied"}  # no crash, no degenerate rows


def test_quantize_survives_all_zero_vector(spark, monkeypatch):
    """max-abs 0 -> quantize to zeros, not DIVIDE_BY_ZERO."""
    from automated_dow30_earnings_reports_spark.operators import curation as cur

    e = spark.createDataFrame(
        [(0, "a", [0.0, 0.0, 0.0]), (1, "a", [1.0, -2.0, 0.5])],
        "vec_id long, label string, embedding array<double>",
    )
    monkeypatch.setattr(cur, "load_table", lambda s, sf, t: e)
    row = cur.QUERIES["embedding_quantize_int8"](spark, "x").collect()[0]
    assert row.n_vecs == 2 and row.max_q == 64
    # the real vector quantizes to (64, -127, 32); the all-zero vector
    # contributes exactly zeros to the sums
    assert row.sum_q == (64 - 127 + 32)


def test_quality_gate_defines_empty_text_as_fail(spark):
    """text='' used to crash sym_frac with 0/0; it is now a definite
    gate fail in both the conjunction and the per-gate breakdown."""
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        quality_pass_col,
    )

    d = spark.createDataFrame(
        [("",), ("   ",), ("the of and to a in is it for on " * 5,)], "text string"
    )
    got = d.select(quality_pass_col(F.col("text")).alias("keep")).collect()
    assert [r.keep for r in got[:2]] == [False, False]
    assert got[2].keep is True


def test_asof_join_null_semantics(spark):
    """(a) a NULL-ts right row never matches (DuckDB ASOF p.ts >= c.ts
    is NULL for it; Spark's NULLS FIRST sort used to attribute it as a
    prior to every left row); (b) a matched right row's NULL payload
    comes through as NULL instead of resurrecting an older row's
    value."""
    from automated_dow30_earnings_reports_spark.operators.asof import asof_join

    t = lambda s: dt.datetime(2025, 1, 1, 12, 0, s)
    left = spark.createDataFrame(
        [(1, t(10)), (1, t(30))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, None, "from-null-ts"), (1, t(5), "early"), (1, t(25), None)],
        "k long, ts timestamp, v string",
    )
    got = {
        r.ts.second: r.asof_v
        for r in asof_join(left, right, on="k", ts="ts", payload=["v"]).collect()
    }
    # left@10: only 'early' precedes (NULL-ts row must NOT win)
    assert got[10] == "early"
    # left@30: matched right row (t=25) has v=NULL -> NULL, not 'early'
    assert got[30] is None


def test_blocked_gemm_emits_no_mask_sentinels(spark):
    """A tiny corpus (fewer real pairs than the top-k cut) used to let
    the -1.0 diagonal-mask sentinel through argpartition as bogus
    duplicate pairs with cos=-1.0."""
    from automated_dow30_earnings_reports_spark.operators.similarity import (
        _blocked_cosine_scores,
        _pack_block_pairs,
    )
    import numpy as np

    e = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.8, 0.6]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    pairs = _pack_block_pairs(e, n_blocks=2)

    def topk(C):
        k = min(50, C.size)  # far more than the 3 real pairs
        return np.unravel_index(np.argpartition(C.ravel(), -k)[-k:], C.shape)

    rows = _blocked_cosine_scores(pairs, topk).collect()
    seen = [(r.id_a, r.id_b) for r in rows]
    assert len(seen) == len(set(seen)) == 3  # each unordered pair once
    assert all(r.cos > -1.0 and r.id_a < r.id_b for r in rows)


def test_connected_components_raises_past_diameter(spark):
    """min-label propagation spreads one hop per round; a path longer
    than max_iter used to return silently-split clusters."""
    from automated_dow30_earnings_reports_spark.operators.dedup import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=3)
    labels = connected_components(chain, max_iter=20)
    assert {r.cluster_id for r in labels.collect()} == {0}


def test_kvlinks_legacy_offset_uses_arrival_order(tmp_path):
    """Old count-prefix checkpoints committed every file PRESENT at
    offset time; a newly-arrived file sorting lexicographically FIRST
    must not be marked seen (it was skipped forever) and the committed
    tail file must not replay."""
    from automated_dow30_earnings_reports_spark.sources.kv_datasource import (
        KVLinksStreamReader,
    )

    d = tmp_path / "landing"
    d.mkdir()
    now = 1_700_000_000
    for i, name in enumerate(["b.txt", "c.txt", "d.txt"]):
        p = d / name
        p.write_text("url='https://x/1.pdf'\n")
        os.utime(p, (now + i, now + i))
    late = d / "a.txt"  # sorts first, arrives LAST
    late.write_text("url='https://x/2.pdf'\n")
    os.utime(late, (now + 100, now + 100))

    reader = KVLinksStreamReader.__new__(KVLinksStreamReader)
    reader.path = str(d)
    seen = reader._seen({"n_files": 3})
    assert seen == {"b.txt", "c.txt", "d.txt"}  # NOT {a,b,c}


def test_llm_extract_dead_letters_malformed_records(spark):
    """A model returning year='FY2024' (or a non-dict item) is
    malformed OUTPUT: it must land as an extract_error row, never kill
    the task (the coercion used to run outside the try)."""
    from automated_dow30_earnings_reports_spark.pipeline.llm_extract import (
        llm_extract_stage,
    )

    def bad_extractor():
        def run(company, text, model):
            if company == "BAD":
                return [{"title": "t", "category": "c", "url": "u",
                         "year": "FY2024", "quarter": 1}]
            return [{"title": "t", "category": "c", "url": "u",
                     "year": 2024, "quarter": 1}]

        return run

    inputs = spark.createDataFrame(
        [("BAD", "x"), ("GOOD", "y")], "company string, links_text string"
    )
    rows = llm_extract_stage(inputs, bad_extractor).collect()
    by_company = {r.company: r for r in rows}
    assert "ValueError" in by_company["BAD"].extract_error
    assert by_company["GOOD"].extract_error is None
    assert by_company["GOOD"].year == 2024


def test_extract_links_captures_multiline_anchor_text(spark):
    """A pretty-printed anchor's text spans newlines; the text regex
    used to lack (?s) and returned '' for it, zeroing keyword scores."""
    from automated_dow30_earnings_reports_spark.pipeline.crawl import extract_links

    html = (
        '<html><a href="https://x.example.com/q1.pdf">\n'
        "  Q1 2024 Earnings\n  Results\n</a></html>"
    )
    pages = spark.createDataFrame(
        [("ACME", "https://x.example.com/", html)],
        "company string, url string, html string",
    )
    row = extract_links(pages).collect()[0]
    assert "Q1 2024 Earnings" in row.text and "Results" in row.text


def test_stats_compaction_ready_stage_wins_over_truncated_live(spark, sf_smoke):
    """Second-order review find: _compact_text_index's recovery used to
    discard a READY stage whenever the live stats dir still existed —
    but a crash partway through the live dir's rmtree leaves a
    truncated remnant, and refolding from it silently corrupts
    n_docs/sum_dl. A ready stage must always win the swap (the
    enforce_ttl rule)."""
    import shutil

    from automated_dow30_earnings_reports_spark.operators import textstats as tx
    from automated_dow30_earnings_reports_spark.tables import load_table

    d = load_table(spark, sf_smoke, "documents")
    path = tx._text_index_path(sf_smoke) + "_stagecrash"
    shutil.rmtree(path, ignore_errors=True)
    tx._write_text_index(d, path, "overwrite")
    tx._write_tombstone_set(
        d.where(F.expr(tx.TEXT_DELETE_PRED)).select("doc_id"), path
    )
    want = [
        tuple(r)
        for r in tx._search_text_index(spark, path, merge_tombstones=True).collect()
    ]
    # construct the crashed swap: a READY stage holding the true stats
    # content, the live dir truncated to nothing (worst case of a
    # partial rmtree)
    stats_dir = os.path.join(path, "stats")
    stage = os.path.join(path, ".stats-compact-stage")
    shutil.copytree(stats_dir, stage)
    with open(os.path.join(stage, "_SWAP_READY"), "w"):
        pass
    for f in os.listdir(stats_dir):  # truncate the live dir
        os.remove(os.path.join(stats_dir, f))
    tx._compact_text_index(spark, path)
    got = [
        tuple(r)
        for r in tx._search_text_index(spark, path, merge_tombstones=True).collect()
    ]
    assert got == want  # recovered from the stage, not the remnant


def test_pipeline_ledger_keeps_zero_link_companies(spark, tmp_path):
    """Second-order review find: seeding the ledger from the crawl
    output still dropped a company whose fetch failed / site had no
    links; the seed frame is now the left side and such companies
    surface as status='empty' with zeroed counts."""
    from automated_dow30_earnings_reports_spark.pipeline.orchestrate import (
        run_pipeline,
    )

    def flaky_fetcher():
        def fetch(url: str):
            if "deadco" in url:
                return (503, "", None, "ConnectionError: refused")
            from automated_dow30_earnings_reports_spark.pipeline.fetch import (
                fake_ir_site_fetcher,
            )

            return fake_ir_site_fetcher()(url)

        return fetch

    companies = spark.createDataFrame(
        [
            ("ACME", "https://ir.acme.example.com/investors"),
            ("DEADCO", "https://ir.deadco.example.com/investors"),
        ],
        ["company", "url"],
    )
    ledger = run_pipeline(
        spark, companies, str(tmp_path / "dl"), fetcher_factory=flaky_fetcher
    )
    rows = {r.company: r for r in ledger.collect()}
    assert set(rows) == {"ACME", "DEADCO"}
    assert rows["ACME"].status == "completed"
    dead = rows["DEADCO"]
    assert dead.status == "empty"
    assert dead.urls_found == 0 and dead.urls_visited == 0
    assert dead.downloaded_files == [] and dead.n_failed == 0


def test_asof_join_null_key_rows_never_match(spark):
    """NULL join keys: DuckDB ASOF's ON-equality never matches
    NULL = NULL, but Spark's partitionBy grouped NULL-key left and
    right rows into one live partition and attributed the right row as
    a prior."""
    from automated_dow30_earnings_reports_spark.operators.asof import asof_join

    t = lambda s: dt.datetime(2025, 1, 1, 12, 0, s)
    left = spark.createDataFrame([(None, t(10)), (1, t(10))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(None, t(5), "null-key"), (1, t(5), "real")], "k long, ts timestamp, v string"
    )
    got = {
        r.k: r.asof_v
        for r in asof_join(left, right, on="k", ts="ts", payload=["v"]).collect()
    }
    assert got[1] == "real"
    assert got[None] is None  # NULL-key left row kept, with NULL payload


def test_stratified_sample_rate_falls_through_on_foreign_source(spark, monkeypatch):
    """A source value that is not 'src<digits>' must sample at the
    100% default, not crash the ANSI cast."""
    from automated_dow30_earnings_reports_spark.operators import curation as cur

    d = spark.createDataFrame(
        [(0, "en", "web"), (1, "en", ""), (2, "en", "src3")],
        "doc_id long, lang string, source string",
    )
    monkeypatch.setattr(cur, "load_table", lambda s, sf, t: d)
    rows = {r.source: r for r in cur.QUERIES["stratified_sample"](spark, "x").collect()}
    assert rows["web"].n_total == 1 and rows["web"].n_sampled == 1  # 100% branch
    assert rows[""].n_sampled == 1
    assert rows["src3"].n_total == 1  # src3 % 3 == 0 -> 25% rate branch runs
