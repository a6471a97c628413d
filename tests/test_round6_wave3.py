"""Round-6 wave-3 operators: retrieval fusion (RRF, MMR), gate
evaluation (binned AUC, Cohen's kappa), snapshot drift (PSI), and the
bucketed-table join. Oracle hash-parity is covered by
test_oracle_parity; these pin the SEMANTICS — each statistic is
recomputed independently (Python/numpy) from the same inputs.
"""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F
import pytest


# ---------------------------------------------------------------------------
# roc_auc_binned
# ---------------------------------------------------------------------------


def test_roc_auc_matches_python_recompute(spark, sf_smoke):
    """The binned rank-sum AUC must equal a from-scratch numpy
    recompute over the same (score, label) pairs and binning."""
    from automated_dow30_earnings_reports_spark.operators.evaluation import (
        AUC_BINS,
        roc_auc_binned,
    )
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        quality_classifier_cols,
        quality_pass_col,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    row = roc_auc_binned(spark, sf_smoke).collect()[0]

    d = load_table(spark, sf_smoke, "documents")
    score, _ = quality_classifier_cols(F.col("text"))
    pdf = d.select(
        score.alias("s"), quality_pass_col(F.col("text")).alias("r")
    ).toPandas()
    bins = np.minimum((pdf["s"] * AUC_BINS).astype(int), AUC_BINS - 1)
    num = 0
    cum_neg = 0
    for b in sorted(set(bins)):
        pos = int(((bins == b) & pdf["r"]).sum())
        neg = int(((bins == b) & ~pdf["r"]).sum())
        num += pos * (2 * cum_neg + neg)
        cum_neg += neg
    n_pos, n_neg = int(pdf["r"].sum()), int((~pdf["r"]).sum())
    assert row.n_pos == n_pos and row.n_neg == n_neg
    assert row.n_bins == len(set(bins))
    expected = round(num / (2 * n_pos * n_neg), 6)
    assert row.auc == pytest.approx(expected, abs=1e-9)
    assert 0.0 <= row.auc <= 1.0


# ---------------------------------------------------------------------------
# cohen_kappa_gates
# ---------------------------------------------------------------------------


def test_kappa_consistent_with_confusion_counts(spark, sf_smoke):
    """kappa/po/pe must equal the textbook formulas evaluated on the
    integer confusion counts the query itself returns."""
    from automated_dow30_earnings_reports_spark.operators.evaluation import (
        cohen_kappa_gates,
    )

    row = cohen_kappa_gates(spark, sf_smoke).collect()[0]
    n = row.n_docs
    a, b, c, d = row.both_keep, row.qc_only, row.rules_only, row.both_drop
    assert a + b + c + d == n > 0
    po = (a + d) / n
    pe = ((a + b) * (a + c) + (c + d) * (b + d)) / (n * n)
    assert row.po == pytest.approx(round(po, 6), abs=1e-9)
    assert row.pe == pytest.approx(round(pe, 6), abs=1e-9)
    if pe != 1.0:
        assert row.kappa == pytest.approx(round((po - pe) / (1 - pe), 6), abs=1e-9)
    assert -1.0 <= row.kappa <= 1.0


# ---------------------------------------------------------------------------
# psi_feature_drift
# ---------------------------------------------------------------------------


def test_psi_bins_complete_and_total_consistent(spark, sf_smoke):
    from automated_dow30_earnings_reports_spark.operators.evaluation import (
        PSI_BINS,
        psi_feature_drift,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    rows = psi_feature_drift(spark, sf_smoke).collect()
    assert [r.bin for r in rows] == list(range(PSI_BINS))
    n_docs = load_table(spark, sf_smoke, "documents").count()
    assert sum(r.ref_cnt + r.cur_cnt for r in rows) == n_docs
    # probabilities are Laplace-smoothed: strictly positive, sum to 1
    assert all(r.p_ref > 0 and r.p_cur > 0 for r in rows)
    assert sum(r.p_ref for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert sum(r.p_cur for r in rows) == pytest.approx(1.0, abs=1e-4)
    # the total is the (12-dp-rounded) sum of the per-bin terms
    ref_tot = sum(r.ref_cnt for r in rows)
    cur_tot = sum(r.cur_cnt for r in rows)
    expected = sum(
        round(
            ((c + 1) / (cur_tot + PSI_BINS) - (r + 1) / (ref_tot + PSI_BINS))
            * math.log(
                ((c + 1) / (cur_tot + PSI_BINS)) / ((r + 1) / (ref_tot + PSI_BINS))
            ),
            12,
        )
        for r, c in ((row.ref_cnt, row.cur_cnt) for row in rows)
    )
    assert rows[0].psi_total == pytest.approx(round(expected, 6), abs=1e-6)
    # even/odd halves of one corpus: drift must be small but >= 0
    assert 0.0 <= rows[0].psi_total < 0.5


def test_psi_detects_planted_drift(spark, tmp_path):
    """A current half with systematically longer documents must score a
    larger PSI than the no-drift even/odd split of the same corpus."""
    from automated_dow30_earnings_reports_spark.operators.evaluation import (
        psi_feature_drift,
    )

    base = [("w " * 20).strip() for _ in range(40)]
    drifted = [("w " * 200).strip() for _ in range(40)]
    rows = []
    for i, t in enumerate(base):
        rows.append((2 * i, t))  # even = reference
    for i, t in enumerate(drifted):
        rows.append((2 * i + 1, t))  # odd = current, much longer
    df = spark.createDataFrame(rows, "doc_id bigint, text string").withColumns(
        {"lang": F.lit("en"), "source": F.lit("t"), "n_chars": F.length("text")}
    )
    path = str(tmp_path / "docs_drift")
    df.coalesce(1).write.mode("overwrite").parquet(path + "/documents.parquet")
    out = psi_feature_drift(spark, str(tmp_path / "docs_drift")).collect()
    assert out[0].psi_total > 1.0  # severe drift on a separated feature


# ---------------------------------------------------------------------------
# hybrid_rrf_fusion
# ---------------------------------------------------------------------------


def test_rrf_scores_consistent_with_ranks(spark, sf_smoke):
    from automated_dow30_earnings_reports_spark.operators.evaluation import (
        RRF_K,
        RRF_LIST_N,
        RRF_TOP,
        hybrid_rrf_fusion,
    )

    rows = hybrid_rrf_fusion(spark, sf_smoke).collect()
    assert len(rows) == RRF_TOP
    rrfs = []
    for r in rows:
        assert r.lex_rank is not None or r.vec_rank is not None
        expected = 0.0
        if r.lex_rank is not None:
            assert 1 <= r.lex_rank <= RRF_LIST_N
            expected += 1.0 / (RRF_K + r.lex_rank)
        if r.vec_rank is not None:
            assert 1 <= r.vec_rank <= RRF_LIST_N
            expected += 1.0 / (RRF_K + r.vec_rank)
        assert r.rrf == pytest.approx(round(expected, 9), abs=1e-12)
        rrfs.append(r.rrf)
    assert rrfs == sorted(rrfs, reverse=True)
    # both retrievers must actually contribute to the fused list
    assert any(r.lex_rank is not None for r in rows)
    assert any(r.vec_rank is not None for r in rows)


def test_rrf_lexical_leg_matches_bm25(spark, sf_smoke):
    """A document in both the fused list and bm25_retrieval's top-10
    must carry the SAME lexical rank ordering (shared scoring leg)."""
    from automated_dow30_earnings_reports_spark.operators.evaluation import (
        hybrid_rrf_fusion,
    )
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        bm25_retrieval,
    )

    bm = [r.doc_id for r in bm25_retrieval(spark, sf_smoke).collect()]
    fused = {
        r.doc_id: r.lex_rank
        for r in hybrid_rrf_fusion(spark, sf_smoke).collect()
        if r.lex_rank is not None
    }
    for doc, lex_rank in fused.items():
        if lex_rank <= len(bm):
            assert bm[lex_rank - 1] == doc


# ---------------------------------------------------------------------------
# mmr_diversified_topk
# ---------------------------------------------------------------------------


def test_mmr_matches_python_greedy(spark, sf_smoke):
    """The pick sequence must equal a from-scratch numpy greedy MMR over
    the same candidates with the same rounding and tie-breaks."""
    from automated_dow30_earnings_reports_spark.operators.evaluation import (
        MMR_CANDIDATES,
        MMR_PICKS,
        RRF_QUERY_VEC,
        mmr_diversified_topk,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    rows = mmr_diversified_topk(spark, sf_smoke).collect()
    assert [r.pick_order for r in rows] == list(range(1, MMR_PICKS + 1))
    assert len({r.vec_id for r in rows}) == MMR_PICKS

    pdf = load_table(spark, sf_smoke, "embeddings").toPandas()
    embs = {int(r.vec_id): np.array(r.embedding, dtype=np.float64) for r in pdf.itertuples()}
    q = embs[RRF_QUERY_VEC]

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    rel = {
        i: round(cos(q, e), 6) for i, e in embs.items() if i != RRF_QUERY_VEC
    }
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:MMR_CANDIDATES]
    sim = {
        (a, b): round(cos(embs[a], embs[b]), 6)
        for a in cand
        for b in cand
        if a != b
    }
    picked: list[int] = []
    for _ in range(MMR_PICKS):
        best = None
        for i in cand:
            if i in picked:
                continue
            ms = max((sim[(i, j)] for j in picked), default=0.0)
            mmr = 0.5 * rel[i] - 0.5 * ms
            key = (-mmr, i)
            if best is None or key < best[0]:
                best = (key, i)
        picked.append(best[1])
    assert [r.vec_id for r in rows] == picked
    # each pick's redundancy term equals the recomputed max-sim (can be
    # negative — cosine ranges over [-1, 1])
    for idx, r in enumerate(rows[1:], start=1):
        ms = max(sim[(r.vec_id, j)] for j in picked[:idx])
        assert r.max_sim_selected == pytest.approx(round(ms, 6), abs=1e-9)


# ---------------------------------------------------------------------------
# bucketed_join_agg
# ---------------------------------------------------------------------------


def test_bucketed_join_single_exchange_plan(spark, sf_smoke):
    """Under forced sort-merge join the bucketed-table join must plan
    with NO Exchange on either join input — the only Exchange left is
    the aggregate's own 3-key shuffle."""
    import io
    import contextlib

    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        bucketed_join_agg,
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_join_agg(spark, sf_smoke)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        # both scans read bucket-aligned — no Exchange on the join keys
        # (the only Exchanges left are the aggregate's and the final
        # orderBy's range partitioning)
        assert plan.count("Bucketed: true") == 2
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


# ---------------------------------------------------------------------------
# dedup_lsh_quality
# ---------------------------------------------------------------------------


def test_lsh_quality_tp_equals_verified_lsh_output(spark, sf_smoke):
    """The true positives are BY CONSTRUCTION the pairs
    dedup_minhash_lsh emits: candidates that verify >= threshold on the
    same hashed-shingle jaccard. The metric row must agree with the
    attested query exactly."""
    from automated_dow30_earnings_reports_spark.operators.dedup import (
        dedup_lsh_quality,
        dedup_minhash_lsh,
    )

    row = dedup_lsh_quality(spark, sf_smoke).collect()[0]
    verified = dedup_minhash_lsh(spark, sf_smoke).count()
    assert row.tp == verified
    assert row.tp <= min(row.n_candidates, row.n_truth)
    if row.n_candidates:
        assert row.precision == pytest.approx(
            round(row.tp / row.n_candidates, 6), abs=1e-9
        )
    if row.n_truth:
        assert row.recall == pytest.approx(round(row.tp / row.n_truth, 6), abs=1e-9)
    if row.n_candidates + row.n_truth:
        assert row.f1 == pytest.approx(
            round(2 * row.tp / (row.n_candidates + row.n_truth), 6), abs=1e-9
        )


def test_lsh_quality_planted_duplicate_is_recalled(spark, tmp_path):
    """An identical pair (jaccard 1.0) collides in EVERY band, so it
    must appear in both truth and candidates — recall can't be 0."""
    import pyspark.sql.functions as SF

    from automated_dow30_earnings_reports_spark.operators.dedup import (
        dedup_lsh_quality,
    )

    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    rows = [(0, dup), (1, dup)]
    for i in range(2, 20):
        rows.append((i, " ".join(f"tok{i}w{j}" for j in range(30))))
    df = spark.createDataFrame(rows, "doc_id bigint, text string").withColumns(
        {"lang": SF.lit("en"), "source": SF.lit("t"), "n_chars": SF.length("text")}
    )
    path = str(tmp_path / "docs_lsh")
    df.coalesce(1).write.mode("overwrite").parquet(path + "/documents.parquet")
    row = dedup_lsh_quality(spark, path).collect()[0]
    assert row.n_truth >= 1
    assert row.tp >= 1
    assert row.recall > 0


# ---------------------------------------------------------------------------
# ann_ndcg_at_k
# ---------------------------------------------------------------------------


def test_ndcg_matches_python_recompute(spark, sf_smoke):
    from automated_dow30_earnings_reports_spark.operators.evaluation import (
        _DISCOUNTS,
        _IDCG,
        ann_ndcg_at_k,
    )
    from automated_dow30_earnings_reports_spark.operators.similarity import QUERIES

    rows = ann_ndcg_at_k(spark, sf_smoke).collect()
    ivf = QUERIES["similarity_ann_ivf"](spark, sf_smoke).collect()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["similarity_cosine_topk"](spark, sf_smoke).collect()
    }
    by_q = {}
    for r in ivf:
        by_q.setdefault(r.query_id, []).append(r)
    assert {r.query_id for r in rows} == set(by_q)
    for out in rows:
        hits = [
            (r.rnk, (out.query_id, r.neighbor_id) in exact)
            for r in by_q[out.query_id]
        ]
        tp = sum(1 for _, h in hits if h)
        dcg = sum(_DISCOUNTS[rnk - 1] for rnk, h in hits if h)
        assert out.tp == tp
        assert out.dcg == pytest.approx(round(dcg, 6), abs=1e-9)
        expected_ndcg = 0.0 if tp == 0 else round(dcg / _IDCG[tp], 6)
        assert out.ndcg == pytest.approx(expected_ndcg, abs=1e-9)
        assert 0.0 <= out.ndcg <= 1.0


# ---------------------------------------------------------------------------
# clustering_coefficient
# ---------------------------------------------------------------------------


def test_clustering_coefficient_formula_and_bounds(spark, sf_smoke):
    from automated_dow30_earnings_reports_spark.operators.graph import (
        CLUSTER_TOP,
        clustering_coefficient,
    )

    rows = clustering_coefficient(spark, sf_smoke).collect()
    assert 0 < len(rows) <= CLUSTER_TOP
    degs = [r.degree for r in rows]
    assert degs == sorted(degs, reverse=True)
    for r in rows:
        assert r.n_triangles >= 0
        if r.degree >= 2:
            expected = round(2 * r.n_triangles / (r.degree * (r.degree - 1)), 6)
            assert r.coefficient == pytest.approx(expected, abs=1e-9)
            assert 0.0 <= r.coefficient <= 1.0
        else:
            assert r.coefficient is None


def test_clustering_triangle_mass_consistent(spark, sf_smoke):
    """Σ_v T_v over ALL nodes is exactly 3× the global triangle count
    (each triangle credits its three corners)."""
    import pyspark.sql.functions as SF

    from automated_dow30_earnings_reports_spark.operators.graph import (
        _cosupply_edges,
        triangle_count_cosupply,
    )

    n_tri = triangle_count_cosupply(spark, sf_smoke).collect()[0].n_triangles
    e = _cosupply_edges(spark, sf_smoke)
    tri = (
        e.alias("e1")
        .join(e.alias("e2"), SF.col("e1.sb") == SF.col("e2.sa"))
        .join(
            e.alias("e3"),
            (SF.col("e3.sa") == SF.col("e1.sa"))
            & (SF.col("e3.sb") == SF.col("e2.sb")),
        )
        .select(
            SF.col("e1.sa").alias("a"),
            SF.col("e1.sb").alias("b"),
            SF.col("e2.sb").alias("c"),
        )
    )
    mass = (
        tri.select(SF.col("a").alias("n"))
        .unionAll(tri.select(SF.col("b").alias("n")))
        .unionAll(tri.select(SF.col("c").alias("n")))
        .count()
    )
    assert mass == 3 * n_tri


# ---------------------------------------------------------------------------
# seasonal_hour_anomaly
# ---------------------------------------------------------------------------


def test_seasonal_cells_partition_the_events(spark, sf_smoke):
    from automated_dow30_earnings_reports_spark.plans.advanced import (
        seasonal_hour_anomaly,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    rows = seasonal_hour_anomaly(spark, sf_smoke).collect()
    assert len(rows) <= 7 * 24
    assert all(0 <= r.dow <= 6 and 0 <= r.hod <= 23 for r in rows)
    total = load_table(spark, sf_smoke, "events").count()
    assert sum(r.n_events for r in rows) == total
    assert all(0 <= r.n_anomalies <= r.n_events for r in rows)
    # a >3-sigma gate on ~unimodal data flags a small minority
    assert sum(r.n_anomalies for r in rows) < total * 0.05


def test_seasonal_anomaly_cell_recompute(spark, sf_smoke):
    """One cell recomputed in pandas must agree with the query."""
    import math as _math

    import pyspark.sql.functions as SF

    from automated_dow30_earnings_reports_spark.plans.advanced import (
        seasonal_hour_anomaly,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    rows = seasonal_hour_anomaly(spark, sf_smoke).collect()
    target = max(rows, key=lambda r: r.n_events)
    es = SF.floor(SF.unix_timestamp("ts")).cast("bigint")
    pdf = (
        load_table(spark, sf_smoke, "events")
        .select(
            "value",
            (((es / SF.lit(86400)).cast("bigint") + 3) % 7).alias("dow"),
            ((es / SF.lit(3600)).cast("bigint") % 24).alias("hod"),
        )
        .where((SF.col("dow") == target.dow) & (SF.col("hod") == target.hod))
        .toPandas()
    )
    assert len(pdf) == target.n_events
    mu = pdf["value"].mean()
    sd = pdf["value"].std(ddof=1)
    if len(pdf) > 1 and sd > 0 and not _math.isnan(sd):
        expected = int((abs((pdf["value"] - mu) / sd) > 3.0).sum())
        assert target.n_anomalies == expected


# ---------------------------------------------------------------------------
# embedding_drift_centroid
# ---------------------------------------------------------------------------


def test_embedding_drift_matches_numpy(spark, sf_smoke):
    from automated_dow30_earnings_reports_spark.operators.evaluation import (
        embedding_drift_centroid,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    row = embedding_drift_centroid(spark, sf_smoke).collect()[0]
    pdf = load_table(spark, sf_smoke, "embeddings").toPandas()
    ref = np.array(
        [np.round(np.float64(v), 6) for v in pdf[pdf.vec_id % 2 == 0].embedding]
    )
    cur = np.array(
        [np.round(np.float64(v), 6) for v in pdf[pdf.vec_id % 2 == 1].embedding]
    )
    assert row.n_ref == len(ref) and row.n_cur == len(cur)
    cr, cc = ref.mean(axis=0), cur.mean(axis=0)
    cos = float(np.dot(cr, cc) / (np.linalg.norm(cr) * np.linalg.norm(cc)))
    l2 = float(np.linalg.norm(cr - cc))
    assert row.centroid_cosine == pytest.approx(cos, abs=1e-4)
    assert row.centroid_l2 == pytest.approx(l2, abs=1e-4)
    assert -1.0 <= row.centroid_cosine <= 1.0
    # same corpus split in half: the centroid barely moves (the corpus
    # is near-zero-mean, so the cosine DIRECTION is noise — the L2
    # magnitude is the meaningful no-drift signal)
    assert row.centroid_l2 < 0.5


# ---------------------------------------------------------------------------
# sql_features: recursive CTE / VARIANT / SQL UDF
# ---------------------------------------------------------------------------


def test_recursive_cte_matches_dataframe_bfs(spark, sf_smoke):
    """Spark's WITH RECURSIVE must produce the same directed hop
    histogram as an explicit frontier-loop recompute over the same
    bounded DAG."""
    import pyspark.sql.functions as SF

    from automated_dow30_earnings_reports_spark.operators.graph import (
        _cosupply_edges,
    )
    from automated_dow30_earnings_reports_spark.plans.sql_features import (
        RCTE_MAX_HOPS,
        recursive_cte_reachability,
    )

    rows = recursive_cte_reachability(spark, sf_smoke).collect()
    e = _cosupply_edges(spark, sf_smoke)  # directed: sa < sb
    src = e.agg(SF.min("sa")).collect()[0][0]
    dist = {src: 0}
    frontier = {src}
    edges = [(r.sa, r.sb) for r in e.collect()]
    for d in range(1, RCTE_MAX_HOPS + 1):
        nxt = {b for (a, b) in edges if a in frontier} - set(dist)
        for n in nxt:
            dist[n] = d
        frontier = nxt
        if not frontier:
            break
    expected = {}
    for node, d in dist.items():
        expected.setdefault(d, []).append(node)
    assert {r.dist: r.n_suppliers for r in rows} == {
        d: len(v) for d, v in expected.items()
    }
    assert {r.dist: r.min_supplier for r in rows} == {
        d: min(v) for d, v in expected.items()
    }
    by_dist = {r.dist: r for r in rows}
    assert by_dist[0].n_suppliers == 1 and by_dist[0].min_supplier == src


def test_variant_props_matches_pandas_json(spark, sf_smoke):
    import json as _json

    from automated_dow30_earnings_reports_spark.plans.sql_features import (
        variant_props_stats,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    rows = {r.event_type: r for r in variant_props_stats(spark, sf_smoke).collect()}
    pdf = load_table(spark, sf_smoke, "events").select("event_type", "props").toPandas()
    for et, grp in pdf.groupby("event_type"):
        ks = [
            _json.loads(p).get("k")
            for p in grp["props"]
            if p is not None
        ]
        ks = [k for k in ks if isinstance(k, int)]
        r = rows[et]
        assert r.n_events == len(grp)
        assert r.n_with_k == len(ks)
        if ks:
            assert (r.min_k, r.max_k, r.sum_k) == (min(ks), max(ks), sum(ks))


def test_sql_udf_len_band_partitions_and_rerun(spark, sf_smoke):
    from automated_dow30_earnings_reports_spark.plans.sql_features import (
        sql_udf_len_band,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    rows = {r.band: r for r in sql_udf_len_band(spark, sf_smoke).collect()}
    pdf = load_table(spark, sf_smoke, "documents").select("n_chars").toPandas()
    short = int((pdf.n_chars < 200).sum())
    medium = int(((pdf.n_chars >= 200) & (pdf.n_chars < 1000)).sum())
    long_ = int((pdf.n_chars >= 1000).sum())
    assert rows.get("short", None) is None or rows["short"].n_docs == short
    assert rows.get("medium", None) is None or rows["medium"].n_docs == medium
    assert rows.get("long", None) is None or rows["long"].n_docs == long_
    assert sum(r.n_docs for r in rows.values()) == len(pdf)
    # CREATE OR REPLACE: same-session re-run must not raise
    rows2 = {r.band: r.n_docs for r in sql_udf_len_band(spark, sf_smoke).collect()}
    assert rows2 == {b: r.n_docs for b, r in rows.items()}


# ---------------------------------------------------------------------------
# prf_query_expansion
# ---------------------------------------------------------------------------


def test_prf_matches_python_recompute(spark, sf_smoke):
    """Full RM3 recompute in Python: feedback docs, expansion-term
    selection, weighted re-score with 12-dp-rounded partial sums."""
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        BM25_B,
        BM25_K1,
        BM25_QUERY,
        EN_STOPWORDS,
        PRF_DOCS,
        PRF_TERMS,
        PRF_TOPK,
        PRF_WEIGHT,
        bm25_retrieval,
        prf_query_expansion,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    rows = prf_query_expansion(spark, sf_smoke).collect()
    assert len(rows) == PRF_TOPK

    pdf = load_table(spark, sf_smoke, "documents").select("doc_id", "text").toPandas()
    toks = {int(r.doc_id): r.text.strip().split() for r in pdf.itertuples()}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs

    def bm25_score(doc_toks, terms, weights, dfs):
        s = 0.0
        for t, w in zip(terms, weights):
            tf = doc_toks.count(t)
            if tf == 0:
                continue
            idf = math.log((n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
            s += w * idf * (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(doc_toks) / avgdl)
            )
        return s

    # feedback docs = bm25 top-PRF_DOCS (bm25_retrieval returns top-10)
    fb = [r.doc_id for r in bm25_retrieval(spark, sf_smoke).collect()][:PRF_DOCS]
    # expansion terms: total tf in feedback docs, stop/original excluded
    from collections import Counter

    cnt = Counter()
    stop = set(BM25_QUERY) | set(EN_STOPWORDS)
    for d in fb:
        cnt.update(t for t in toks[d] if t not in stop)
    exp = [t for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))][:PRF_TERMS]
    terms = list(BM25_QUERY) + exp
    weights = [1.0] * len(BM25_QUERY) + [PRF_WEIGHT] * len(exp)
    dfs = {t: sum(1 for dt in toks.values() if t in dt) for t in terms}
    scored = []
    for d, dt in toks.items():
        parts = []
        for t, w in zip(terms, weights):
            tf = dt.count(t)
            if tf:
                idf = math.log((n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
                parts.append(
                    round(
                        w * idf * (tf * (BM25_K1 + 1.0)) / (
                            tf
                            + BM25_K1
                            * (1.0 - BM25_B + BM25_B * len(dt) / avgdl)
                        ),
                        12,
                    )
                )
        if parts:
            # 12-dp-rounded partials: exact as scaled integers
            total = sum(int(round(p * 10**12)) for p in parts)
            scored.append((d, total, len(parts)))
    scored.sort(key=lambda x: (-x[1], x[0]))
    expect = scored[:PRF_TOPK]
    assert [(r.doc_id, r.n_terms_matched) for r in rows] == [
        (d, m) for d, _, m in expect
    ]
    for r, (_, tot, _) in zip(rows, expect):
        assert r.prf_score == pytest.approx(round(tot / 10**12, 6), abs=2e-6)


def test_prf_expansion_changes_ranking(spark, sf_smoke):
    """The PRF list must actually use expansion terms: at least one
    returned doc matches more terms than the 4-term original query can
    explain, or the ordering differs from the base BM25 ordering."""
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        bm25_retrieval,
        prf_query_expansion,
    )

    prf = [r.doc_id for r in prf_query_expansion(spark, sf_smoke).collect()]
    base = [r.doc_id for r in bm25_retrieval(spark, sf_smoke).collect()]
    assert prf != base  # expansion must perturb the list at this corpus


# ---------------------------------------------------------------------------
# value_trend_grouped_pandas
# ---------------------------------------------------------------------------


def test_grouped_pandas_trend_equals_aggregate_form(spark, sf_smoke):
    """Two constructions of one contract: the applyInPandas grouped map
    must produce EXACTLY the registered aggregate form's rows."""
    from automated_dow30_earnings_reports_spark.plans.advanced import (
        value_trend_by_type,
        value_trend_grouped_pandas,
    )

    a = [tuple(r) for r in value_trend_by_type(spark, sf_smoke).collect()]
    b = [tuple(r) for r in value_trend_grouped_pandas(spark, sf_smoke).collect()]
    assert a == b


# ---------------------------------------------------------------------------
# text_index_append / variant_lake_roundtrip / ps_api_doc_stats
# ---------------------------------------------------------------------------


def test_text_index_append_matches_scan_and_is_idempotent(spark, sf_smoke):
    """Build(old)+append(batch) must answer the standing query exactly
    like the scan-side bm25_retrieval on the FULL corpus, and re-running
    the whole query (fresh build + one append) must be idempotent."""
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        bm25_retrieval,
        text_index_append,
    )

    first = [tuple(r) for r in text_index_append(spark, sf_smoke).collect()]
    scan = [tuple(r) for r in bm25_retrieval(spark, sf_smoke).collect()]
    assert first == scan
    second = [tuple(r) for r in text_index_append(spark, sf_smoke).collect()]
    assert second == first


def test_text_index_append_stats_are_partials(spark, sf_smoke):
    """The stats table must hold one integer-partial row per write
    (build + append), merging to the corpus totals."""
    import os

    from automated_dow30_earnings_reports_spark.operators.textstats import (
        _text_index_path,
        text_index_append,
        tokens_col,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    text_index_append(spark, sf_smoke).collect()
    stats = spark.read.parquet(
        os.path.join(_text_index_path(sf_smoke) + "_append", "stats")
    ).collect()
    assert len(stats) == 2  # one partial per write
    d = load_table(spark, sf_smoke, "documents")
    n = d.count()
    total_dl = d.select(
        F.sum(F.size(tokens_col(F.col("text")))).alias("s")
    ).collect()[0].s
    assert sum(r.n_docs for r in stats) == n
    assert sum(r.sum_dl for r in stats) == total_dl


def test_variant_survives_parquet_roundtrip(spark, sf_smoke):
    """The persisted column must be a true VariantType, and the
    post-roundtrip aggregate must match a from-JSON recompute."""
    import json as _json

    from pyspark.sql.types import VariantType

    from automated_dow30_earnings_reports_spark.plans.sql_features import (
        variant_lake_roundtrip,
    )
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        scratch_path,
    )

    rows = {r.event_type: r for r in variant_lake_roundtrip(spark, sf_smoke).collect()}
    from automated_dow30_earnings_reports_spark.plans.sql_features import (
        _SCRATCH_VARIANT,
    )

    stored = spark.read.parquet(scratch_path(_SCRATCH_VARIANT, sf_smoke))
    assert isinstance(stored.schema["v"].dataType, VariantType)
    from automated_dow30_earnings_reports_spark.tables import load_table

    pdf = load_table(spark, sf_smoke, "events").select("event_type", "props").toPandas()
    for et, grp in pdf.groupby("event_type"):
        ks = [_json.loads(p).get("k") for p in grp["props"]]
        r = rows[et]
        assert r.n_events == len(grp)
        assert r.sum_k == sum(k for k in ks if isinstance(k, int))
        assert r.n_null_k == sum(1 for k in ks if not isinstance(k, int))


def test_ps_api_matches_dataframe_recompute(spark, sf_smoke):
    from automated_dow30_earnings_reports_spark.plans.sql_features import (
        ps_api_doc_stats,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    got = [tuple(r) for r in ps_api_doc_stats(spark, sf_smoke).collect()]
    exp = [
        tuple(r)
        for r in load_table(spark, sf_smoke, "documents")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.round(
                F.sum("n_chars").cast("double") / F.count("*"), 4
            ).alias("mean_chars"),
        )
        .orderBy("lang")
        .collect()
    ]
    assert got == exp


# ---------------------------------------------------------------------------
# streaming_text_ingest — restart-resume + replay safety
# ---------------------------------------------------------------------------


def test_streaming_text_restart_resume_and_replay_safety(spark, sf_smoke, tmp_path):
    """Two stream runs against one checkpoint: the second arrival file
    replays already-ingested doc_ids plus a new tail. Committed docs
    must not re-append (no duplicate docstats/postings rows), the tail
    must land, and the final index must answer the standing query like
    the scan-side BM25 on the ingested corpus."""
    import os

    from automated_dow30_earnings_reports_spark.operators.textstats import (
        _search_text_index,
        _write_text_index,
        bm25_retrieval,
    )
    from automated_dow30_earnings_reports_spark.sources.kv_datasource import register
    from automated_dow30_earnings_reports_spark.streaming.incremental import (
        start_text_ingest_stream,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    register(spark)
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    index_path = str(tmp_path / "index")

    d = load_table(spark, sf_smoke, "documents").localCheckpoint(eager=True)
    n = d.count()
    _write_text_index(d.where(F.col("doc_id") < n // 2), index_path, "overwrite")

    # run 1: arrivals [n//2, n//2 + 20)
    d.where(F.col("doc_id").between(n // 2, n // 2 + 19)).select(
        "doc_id"
    ).write.format("kvlinks").option("path", landing).mode("append").save()
    start_text_ingest_stream(spark, landing, index_path, ckpt, d).awaitTermination(180)
    ds1 = spark.read.parquet(os.path.join(index_path, "docstats"))
    assert ds1.count() == n // 2 + 20
    assert ds1.groupBy("doc_id").count().where(F.col("count") > 1).count() == 0

    # run 2 (restart, same checkpoint): replayed ids + the remaining tail
    d.where(F.col("doc_id") >= n // 2 + 10).select("doc_id").write.format(
        "kvlinks"
    ).option("path", landing).mode("append").save()
    start_text_ingest_stream(spark, landing, index_path, ckpt, d).awaitTermination(180)
    ds2 = spark.read.parquet(os.path.join(index_path, "docstats"))
    assert ds2.count() == n
    assert ds2.groupBy("doc_id").count().where(F.col("count") > 1).count() == 0
    post = spark.read.parquet(os.path.join(index_path, "postings"))
    assert (
        post.groupBy("term", "doc_id").count().where(F.col("count") > 1).count() == 0
    )
    # fully-ingested index answers the standing query like the scan
    got = [tuple(r) for r in _search_text_index(spark, index_path).collect()]
    scan = [tuple(r) for r in bm25_retrieval(spark, sf_smoke).collect()]
    assert got == scan


# ---------------------------------------------------------------------------
# text_index_compact / dedup_index_purge
# ---------------------------------------------------------------------------


def test_text_index_compact_folds_partials_and_files(spark, sf_smoke):
    import os

    from automated_dow30_earnings_reports_spark.operators.textstats import (
        TEXT_COMPACT_MOD,
        _compact_text_index,
        _search_text_index,
        _text_index_path,
        _write_text_index,
        bm25_retrieval,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    d = load_table(spark, sf_smoke, "documents")
    path = _text_index_path(sf_smoke) + "_compact_test"
    gen = F.col("doc_id") % TEXT_COMPACT_MOD
    _write_text_index(d.where(gen == 0), path, "overwrite")
    _write_text_index(d.where(gen == 1), path, "append")
    _write_text_index(d.where(gen == 2), path, "append")
    assert spark.read.parquet(os.path.join(path, "stats")).count() == 3

    def files_per_bucket():
        root = os.path.join(path, "postings")
        return {
            c: sum(1 for f in os.listdir(os.path.join(root, c)) if f.endswith(".parquet"))
            for c in os.listdir(root)
            if c.startswith("bucket=")
        }

    assert any(n > 1 for n in files_per_bucket().values())  # fragmented
    _compact_text_index(spark, path)
    stats = spark.read.parquet(os.path.join(path, "stats")).collect()
    assert len(stats) == 1
    assert all(n == 1 for n in files_per_bucket().values())
    got = [tuple(r) for r in _search_text_index(spark, path).collect()]
    scan = [tuple(r) for r in bm25_retrieval(spark, sf_smoke).collect()]
    assert got == scan


def test_dedup_purge_erases_and_filters_pairs(spark, sf_smoke):
    import os

    from automated_dow30_earnings_reports_spark.operators.dedup import (
        PURGE_PRED_SQL,
        _dedup_index_path,
        dedup_incremental_index,
        dedup_index_purge,
    )

    purge_rows = [tuple(r) for r in dedup_index_purge(spark, sf_smoke).collect()]
    # every purged doc_id is gone from ALL index tables
    path = _dedup_index_path(sf_smoke) + "_purge"
    # (the forget set targets OLD docs; a NEW doc matching the mod-17
    # pattern is not purged)
    old_purged = F.expr(PURGE_PRED_SQL) & ~(F.col("doc_id") % 5 == 4)
    for table in ("bands", "shd", "sizes"):
        tbl = spark.read.parquet(os.path.join(path, table))
        assert tbl.where(old_purged).count() == 0
    # the probe equals the unpurged probe minus pairs whose OLD side
    # was forgotten
    incr = [tuple(r) for r in dedup_incremental_index(spark, sf_smoke).collect()]
    expected = [t for t in incr if t[1] % 17 != 3]
    assert purge_rows == expected


# ---------------------------------------------------------------------------
# cache_table_reuse
# ---------------------------------------------------------------------------


def test_cache_table_serves_from_memory_and_is_transparent(spark, sf_smoke):
    import contextlib
    import io

    from automated_dow30_earnings_reports_spark.plans.sql_features import (
        cache_table_reuse,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    df = cache_table_reuse(spark, sf_smoke)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    assert "In-memory table cache_demo_li" in buf.getvalue()  # served from cache
    got = [tuple(r) for r in df.collect()]
    exp = [
        tuple(r)
        for r in load_table(spark, sf_smoke, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"),
                2,
            ).alias("total_price"),
        )
        .orderBy("l_returnflag")
        .collect()
    ]
    assert got == exp  # cached columnar batches are content-transparent
    # re-run replaces rather than stacks, and stays green
    assert [tuple(r) for r in cache_table_reuse(spark, sf_smoke).collect()] == exp
    spark.sql("UNCACHE TABLE IF EXISTS cache_demo_li")
