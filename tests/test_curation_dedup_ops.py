"""Property tests for the PII scrub, mixture weights, DF-capped
near-dup, and cluster-canonical retention operators (sf0.001 inputs).

Oracle value-parity is covered by driver_sim / the driver; these pin
the semantic invariants the oracles alone don't state explicitly.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.operators.curation import (
    domain_mixture_weights,
    pii_redact,
)
from automated_dow30_earnings_reports_spark.operators.dedup import (
    dedup_cluster_canonical,
    dedup_ngram_dfcap,
    dedup_ngram_jaccard,
)
from automated_dow30_earnings_reports_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_pii_redact_masks_all_but_last_two_digits(spark):
    rows = pii_redact(spark, SF).collect()
    n_customers = load_table(spark, SF, "customer").count()
    assert len(rows) == n_customers
    for r in rows[:50]:
        assert re.fullmatch(r"Customer#\*{7}\d{2}", r.masked_name)
        assert len(r.pseudonym) == 12
        assert r.acctbal_band % 1000 == 0


def test_pii_redact_pseudonym_is_stable_and_distinct(spark):
    out = pii_redact(spark, SF)
    # deterministic: same input -> same pseudonym on a second run
    a = {r.c_custkey: r.pseudonym for r in out.collect()}
    b = {r.c_custkey: r.pseudonym for r in pii_redact(spark, SF).collect()}
    assert a == b
    # distinct names -> distinct pseudonyms (md5 prefix, no collisions here)
    assert len(set(a.values())) == len(a)


def test_mixture_weights_equalize_token_shares(spark):
    rows = domain_mixture_weights(spark, SF).collect()
    total = sum(r.n_tokens for r in rows)
    k = len(rows)
    target = total / k
    for r in rows:
        # weight * actual tokens ≈ uniform share (round(…,6) tolerance)
        assert abs(r.weight * r.n_tokens - target) < target * 1e-4


def test_dfcap_pairs_subset_of_exact_with_same_jaccard(spark):
    exact = {
        (r.id_a, r.id_b): r.jaccard for r in dedup_ngram_jaccard(spark, SF).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.jaccard for r in dedup_ngram_dfcap(spark, SF).collect()
    }
    # DF-capping only prunes candidates; verification is identical, so
    # every surviving pair must appear in the exact tier with the same
    # jaccard value.
    assert set(capped) <= set(exact)
    for pair, j in capped.items():
        assert j == exact[pair]


def test_cluster_canonical_one_keeper_per_cluster(spark):
    rows = dedup_cluster_canonical(spark, SF).collect()
    assert rows, "sf0.001 documents contain near-dup clusters"
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    chars = {
        r.doc_id: r.n_chars
        for r in load_table(spark, SF, "documents").select("doc_id", "n_chars").collect()
    }
    for cid, members in by_cluster.items():
        keepers = [m for m in members if m.is_keeper == 1]
        assert len(keepers) == 1
        keeper = keepers[0]
        best = max(chars[m.doc_id] for m in members)
        assert chars[keeper.doc_id] == best
        # cluster id is the component's min doc_id and a member
        assert cid == min(m.doc_id for m in members)


def test_vocab_topk_sorted_and_bounded(spark):
    from automated_dow30_earnings_reports_spark.operators.textstats import vocab_topk

    rows = vocab_topk(spark, SF).collect()
    assert 0 < len(rows) <= 50
    tfs = [r.tf for r in rows]
    assert tfs == sorted(tfs, reverse=True)
    assert all(r.df <= r.tf for r in rows)


def test_tfidf_top3_per_doc(spark):
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        tfidf_top_terms,
    )

    rows = tfidf_top_terms(spark, SF).collect()
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.tfidf)
    assert all(len(v) <= 3 for v in per_doc.values())
    # within a doc the scores are non-increasing
    assert all(v == sorted(v, reverse=True) for v in per_doc.values())


def test_temperature_resample_gate_properties(spark, sf_correctness):
    """Lightest source keeps everything (threshold = full digest
    space); heavier sources get monotonically smaller thresholds;
    kept <= total per source."""
    from automated_dow30_earnings_reports_spark.operators.curation import (
        _RS_SPACE,
        temperature_resample,
    )

    rows = temperature_resample(spark, sf_correctness).collect()
    assert rows
    assert max(r.threshold for r in rows) == _RS_SPACE
    for r in rows:
        assert 0 < r.threshold <= _RS_SPACE
        assert 0 <= r.n_kept <= r.n_docs


def test_quality_gate_conjunction_matches_breakdown(spark, sf_correctness):
    """quality_pass_col (the funnel's shared gate) and
    quality_filter_rules' per-gate breakdown must agree on n_pass_all."""
    from pyspark.sql import functions as F

    from automated_dow30_earnings_reports_spark.operators.textstats import (
        quality_filter_rules,
        quality_pass_col,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    breakdown = quality_filter_rules(spark, sf_correctness).collect()[0]
    via_expr = (
        load_table(spark, sf_correctness, "documents")
        .where(quality_pass_col(F.col("text")))
        .count()
    )
    assert via_expr == breakdown.n_pass_all


def test_curation_funnel_is_monotone(spark, sf_correctness):
    """Each curation stage can only shrink the corpus; the final token
    count is positive when any doc survives."""
    from automated_dow30_earnings_reports_spark.operators.curation import (
        corpus_curation_funnel,
    )

    r = corpus_curation_funnel(spark, sf_correctness).collect()[0]
    assert r.n_raw >= r.n_after_exact >= r.n_after_quality >= r.n_after_resample >= 0
    assert (r.final_tokens > 0) == (r.n_after_resample > 0)
