"""Retrieval fusion + model-evaluation operators (beyond-reference
§2.11 tier: what a curation team runs AFTER the gates and indexes
exist — fuse the lexical and vector retrievers, diversify the results,
and quantify how well the learned quality gate tracks the rules gate
and whether the corpus is drifting).

Generalizes the reference's single-signal document scoring
(src/enhanced_selenium_scraper.py:641-679 scores keyword hits only) to
the multi-signal production stack: BM25 ⊕ embedding retrieval via
reciprocal-rank fusion (Cormack et al. 2009), MMR diversification
(Carbonell & Goldstein 1998), binned ROC-AUC / Cohen's kappa for the
classifier-vs-rules gate pair, and PSI drift between corpus snapshots.

Determinism across engines: every ranking is cut on integer ranks or
6-dp-rounded scores with explicit id tie-breaks; every probability is
a ratio of exact integer counts evaluated in one fixed-order double
expression; the only floating-point SUMs fold ≤2 addends (RRF) or run
over DECIMAL-rounded terms (PSI) — no order-dependent double folds.

Scale shape: the corpus-wide work is one documents scan (gates are
map-side codegen) or one embeddings scan (top-k is TakeOrdered); the
per-rank / cumulative steps run as broadcast self-joins over bounded
frames (≤512 score bins, ≤20 rank rows, ≤12 MMR candidates) rather
than unpartitioned windows, so nothing here prints the single-partition
WindowExec warning or shuffles the fact tables beyond one groupBy on a
≤512-key bin column.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.operators.dedup import _h_of
from automated_dow30_earnings_reports_spark.operators.similarity import (
    _COS_SQL,
    _emb,
    dot,
)
from automated_dow30_earnings_reports_spark.operators.textstats import (
    QC_DIM,
    QUALITY_PASS_SQL,
    _bm25_score_col,
    bm25_any_tf_col,
    bm25_scored_input,
    bm25_sql_parts,
    quality_classifier_cols,
    quality_pass_col,
    tokens_col,
)
from automated_dow30_earnings_reports_spark.tables import load_table, spread

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Shared DuckDB CTE: per-document learned score s (6 dp), learned keep
# gate k, rules gate r — the same construction quality_score_calibration
# pins, factored so the AUC/kappa oracles below cannot drift from it.
# ---------------------------------------------------------------------------


def _gated_cte() -> str:
    h_bigram = _h_of("toks[i] || ' ' || toks[i+1]")
    w_of = f"((({h_bigram}) % {QC_DIM}) * 37 + 11) % 97 - 48"
    return f"""
    t AS (
      SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents
    ),
    feats AS (
      SELECT doc_id, text, toks,
             CASE WHEN len(toks) >= 2
                  THEN [{w_of} FOR i IN range(1, len(toks))]
                  ELSE CAST([] AS BIGINT[]) END AS ws
      FROM t
    ),
    scored AS (
      SELECT doc_id, text, toks,
             ROUND(1.0 / (1.0 + exp(-(CASE WHEN len(ws) > 0
                    THEN list_aggregate(ws, 'sum') / (97.0 * len(ws))
                    ELSE 0.0 END))), 6) AS s
      FROM feats
    ),
    gated AS (
      SELECT doc_id, s, (s >= 0.5) AS k, {QUALITY_PASS_SQL} AS r
      FROM scored
    )"""


# ---------------------------------------------------------------------------
# Binned ROC-AUC of the learned quality score against the rules gate.
# ---------------------------------------------------------------------------

AUC_BINS = 512


def _auc_oracle() -> str:
    return f"""
    WITH {_gated_cte()},
    per_bin AS (
      SELECT LEAST(CAST(floor(s * {AUC_BINS}) AS BIGINT), {AUC_BINS - 1}) AS bin,
             CAST(COUNT(*) FILTER (r) AS BIGINT)     AS pos,
             CAST(COUNT(*) FILTER (NOT r) AS BIGINT) AS neg
      FROM gated GROUP BY bin
    ),
    cum AS (
      SELECT pos, neg,
             COALESCE(SUM(neg) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_neg
      FROM per_bin
    ),
    agg AS (
      SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(SUM(neg) AS BIGINT) AS n_neg,
             CAST(COUNT(*) AS BIGINT) AS n_bins,
             SUM(CAST(pos * (2 * cum_neg + neg) AS DECIMAL(38,0))) AS num
      FROM cum
    )
    SELECT n_pos, n_neg, n_bins,
           ROUND(CASE WHEN n_pos > 0 AND n_neg > 0
                 THEN CAST(num AS DOUBLE)
                      / CAST(2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg AS DOUBLE)
                 ELSE NULL END, 6) AS auc
    FROM agg ORDER BY n_pos
    """


@_register("roc_auc_binned", _auc_oracle())
def roc_auc_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of quality_classifier_linear's score against the Gopher
    rules gate as ground truth, at fixed-bin granularity: scores land
    in {AUC_BINS} equal-width bins (the score is already 6-dp-rounded
    and in (0,1)), all scores in a bin are ties, and AUC is the exact
    Mann-Whitney rank-sum over the binned counts —
    AUC = Σ_b pos_b·(2·cum_neg_<b + neg_b) / (2·P·N), every term an
    integer so the numerator is exact (DECIMAL(38,0) keeps it exact
    past bigint at 100 TB counts) and the single final division is the
    only floating-point step.

    Scale shape: one documents scan with both gates map-side, a
    {AUC_BINS}-key groupBy, then a running sum over the ≤{AUC_BINS}-row
    bin table computed as a triangular broadcast self-join (not an
    unpartitioned window — see the inline note). This is how AUC is
    computed at 100 TB — the exact per-distinct-threshold form needs a
    global sort of every score."""
    d = spread(load_table(spark, sf_dir, "documents"))
    score, _keep = quality_classifier_cols(F.col("text"))
    label = quality_pass_col(F.col("text"))
    per_bin = (
        d.select(
            F.least(
                F.floor(score * AUC_BINS).cast("bigint"), F.lit(AUC_BINS - 1)
            ).alias("bin"),
            label.alias("r"),
        )
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("r"), 1).otherwise(0)).cast("bigint").alias("pos"),
            F.sum(F.when(F.col("r"), 0).otherwise(1)).cast("bigint").alias("neg"),
        )
    )
    # Running sum over the ≤AUC_BINS-row bin table via a triangular
    # broadcast self-join — the file_skipping_stats lesson: even a
    # bounded-cardinality unpartitioned window prints the WindowExec
    # single-partition warning into every bench tail, and the ≤512²
    # join pairs cost less than explaining the warning away.
    per_bin = per_bin.localCheckpoint(eager=True)  # feeds both join sides
    below = per_bin.select(F.col("bin").alias("bin2"), F.col("neg").alias("neg2"))
    cum = (
        per_bin.join(F.broadcast(below), F.col("bin2") < F.col("bin"), "left")
        .groupBy("bin", "pos", "neg")
        .agg(F.coalesce(F.sum("neg2"), F.lit(0)).alias("cum_neg"))
        .select("pos", "neg", "cum_neg")
    )
    agg = cum.agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum("neg").cast("bigint").alias("n_neg"),
        F.count("*").cast("bigint").alias("n_bins"),
        F.sum(
            (F.col("pos") * (2 * F.col("cum_neg") + F.col("neg"))).cast(
                "decimal(38,0)"
            )
        ).alias("num"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.col("num").cast("double")
        / (2 * F.col("n_pos").cast("decimal(38,0)") * F.col("n_neg")).cast("double"),
    ).otherwise(F.lit(None))
    return agg.select(
        "n_pos", "n_neg", "n_bins", F.round(auc, 6).alias("auc")
    ).orderBy("n_pos")


# ---------------------------------------------------------------------------
# Cohen's kappa between the learned gate and the rules gate.
# ---------------------------------------------------------------------------


def _kappa_oracle() -> str:
    return f"""
    WITH {_gated_cte()},
    cm AS (
      SELECT CAST(COUNT(*) AS BIGINT)                      AS n_docs,
             CAST(COUNT(*) FILTER (k AND r) AS BIGINT)     AS both_keep,
             CAST(COUNT(*) FILTER (k AND NOT r) AS BIGINT) AS qc_only,
             CAST(COUNT(*) FILTER (NOT k AND r) AS BIGINT) AS rules_only,
             CAST(COUNT(*) FILTER (NOT k AND NOT r) AS BIGINT) AS both_drop
      FROM gated
    ),
    prob AS (
      SELECT *,
             CAST(both_keep + both_drop AS DOUBLE) / n_docs AS po,
             CAST((both_keep + qc_only) * CAST(both_keep + rules_only AS DECIMAL(38,0))
                  + (rules_only + both_drop) * CAST(qc_only + both_drop AS DECIMAL(38,0))
                  AS DOUBLE)
             / (CAST(n_docs AS DOUBLE) * n_docs) AS pe
      FROM cm
    )
    SELECT n_docs, both_keep, qc_only, rules_only, both_drop,
           ROUND(po, 6) AS po, ROUND(pe, 6) AS pe,
           ROUND(CASE WHEN 1.0 - pe = 0 THEN NULL
                      ELSE (po - pe) / (1.0 - pe) END, 6) AS kappa
    FROM prob ORDER BY n_docs
    """


@_register("cohen_kappa_gates", _kappa_oracle())
def cohen_kappa_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chance-corrected agreement (Cohen's kappa) between the learned
    quality gate and the Gopher rules gate — the companion statistic to
    quality_score_calibration's decile report: raw agreement can look
    high purely because both gates keep most documents; kappa subtracts
    the agreement the marginals predict by chance.

    Every probability is a ratio of exact integer confusion-matrix
    counts (the 2×2 cross products go through DECIMAL(38,0) so they
    stay exact past bigint at 100 TB), evaluated in one fixed-order
    double expression — identical arithmetic in both engines. One
    documents scan, both gates map-side, a single global aggregate."""
    d = spread(load_table(spark, sf_dir, "documents"))
    _score, keep = quality_classifier_cols(F.col("text"))
    rules = quality_pass_col(F.col("text"))

    def _cnt(cond: Column) -> Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    cm = d.select(keep.alias("k"), rules.alias("r")).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        _cnt(F.col("k") & F.col("r")).alias("both_keep"),
        _cnt(F.col("k") & ~F.col("r")).alias("qc_only"),
        _cnt(~F.col("k") & F.col("r")).alias("rules_only"),
        _cnt(~F.col("k") & ~F.col("r")).alias("both_drop"),
    )
    # n_docs > 0 guard: an empty corpus still emits the one aggregate
    # row, and ANSI division would throw where DuckDB's /0 yields NULL
    # (the roc_auc_binned convention in this file)
    po = F.when(
        F.col("n_docs") > 0,
        (F.col("both_keep") + F.col("both_drop")).cast("double") / F.col("n_docs"),
    )
    pe = F.when(
        F.col("n_docs") > 0,
        (
            (F.col("both_keep") + F.col("qc_only"))
            * (F.col("both_keep") + F.col("rules_only")).cast("decimal(38,0)")
            + (F.col("rules_only") + F.col("both_drop"))
            * (F.col("qc_only") + F.col("both_drop")).cast("decimal(38,0)")
        ).cast("double") / (F.col("n_docs").cast("double") * F.col("n_docs")),
    )
    prob = cm.select("*", po.alias("po"), pe.alias("pe"))
    kappa = F.when(F.lit(1.0) - F.col("pe") == 0, F.lit(None)).otherwise(
        (F.col("po") - F.col("pe")) / (F.lit(1.0) - F.col("pe"))
    )
    return prob.select(
        "n_docs",
        "both_keep",
        "qc_only",
        "rules_only",
        "both_drop",
        F.round("po", 6).alias("po"),
        F.round("pe", 6).alias("pe"),
        F.round(kappa, 6).alias("kappa"),
    ).orderBy("n_docs")


# ---------------------------------------------------------------------------
# PSI drift between two corpus snapshots (even/odd doc_id halves stand
# in for reference vs current ingest) over the token-length feature.
# ---------------------------------------------------------------------------

PSI_BINS = 10


def _psi_oracle() -> str:
    toks = "string_split_regex(trim(text), '\\s+')"
    return f"""
    WITH per AS (
      SELECT doc_id, CAST(len({toks}) AS BIGINT) AS dl,
             (doc_id % 2 = 0) AS is_ref
      FROM documents
    ),
    bounds AS (
      SELECT MIN(dl) AS mn, MAX(dl) AS mx FROM per WHERE is_ref
    ),
    binned AS (
      SELECT is_ref,
             GREATEST(0, LEAST({PSI_BINS - 1},
               ((dl - mn) * {PSI_BINS}) // (mx - mn + 1))) AS bin
      FROM per CROSS JOIN bounds
    ),
    counts AS (
      SELECT g.bin,
             CAST(COALESCE(SUM(CASE WHEN is_ref THEN 1 END), 0) AS BIGINT) AS ref_cnt,
             CAST(COALESCE(SUM(CASE WHEN NOT is_ref THEN 1 END), 0) AS BIGINT) AS cur_cnt
      FROM generate_series(0, {PSI_BINS - 1}) AS g(bin)
      LEFT JOIN binned b ON b.bin = g.bin
      GROUP BY g.bin
    ),
    tot AS (
      SELECT SUM(ref_cnt) AS ref_tot, SUM(cur_cnt) AS cur_tot FROM counts
    ),
    terms AS (
      SELECT bin, ref_cnt, cur_cnt,
             CAST(ref_cnt + 1 AS DOUBLE) / (ref_tot + {PSI_BINS}) AS p_ref,
             CAST(cur_cnt + 1 AS DOUBLE) / (cur_tot + {PSI_BINS}) AS p_cur
      FROM counts CROSS JOIN tot
    ),
    terms2 AS (
      SELECT *, (p_cur - p_ref) * ln(p_cur / p_ref) AS term FROM terms
    ),
    total AS (
      SELECT SUM(CAST(ROUND(term, 12) AS DECIMAL(24,12))) AS psi_dec FROM terms2
    )
    SELECT bin, ref_cnt, cur_cnt,
           ROUND(p_ref, 6) AS p_ref, ROUND(p_cur, 6) AS p_cur,
           ROUND(term, 6) AS psi_term,
           ROUND(CAST(psi_dec AS DOUBLE), 6) AS psi_total
    FROM terms2 CROSS JOIN total
    ORDER BY bin
    """


@_register("psi_feature_drift", _psi_oracle())
def psi_feature_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift report between a reference and
    a current corpus snapshot (even/odd doc_id halves) over the
    token-length feature — the monitoring gate a production pipeline
    runs before letting a new ingest batch into the training mix.

    Binning is EXACT integer arithmetic: equal-width bins from the
    reference population's broadcast (min, max), bin = integer-division
    of (dl−mn)·B by the width, clamped — no doubles until the
    Laplace-smoothed probabilities, and each bin's PSI term is one
    fixed-order double expression. The total folds 12-dp-ROUNDED terms
    through DECIMAL so summation order cannot drift (the B-addend
    double sum would be order-dependent).

    Scale shape: one scan to the narrow (dl, is_ref) frame
    (checkpointed — it feeds both the bounds aggregate and the binned
    counts, the q15 aggregate-feeds-its-own-stat shape), a broadcast
    1-row bounds frame, a {PSI_BINS}-key groupBy, and tiny-frame joins
    thereafter."""
    d = load_table(spark, sf_dir, "documents")
    per = d.select(
        F.size(tokens_col(F.col("text"))).cast("bigint").alias("dl"),
        (F.col("doc_id") % 2 == 0).alias("is_ref"),
    ).localCheckpoint(eager=True)
    bounds = per.where("is_ref").agg(
        F.min("dl").alias("mn"), F.max("dl").alias("mx")
    )
    binned = per.crossJoin(F.broadcast(bounds)).select(
        "is_ref",
        F.greatest(
            F.lit(0),
            F.least(
                F.lit(PSI_BINS - 1),
                F.expr(f"((dl - mn) * {PSI_BINS}) div (mx - mn + 1)"),
            ),
        ).alias("bin"),
    )
    # aggregate FIRST (map-side partial combine collapses the corpus to
    # <= PSI_BINS rows before any shuffle), then left-join the 12-row
    # bin spine to surface empty bins — the earlier join-then-group form
    # shuffled the entire corpus onto 12 bin keys (a 12-key skew wall at
    # 100 TB) just to keep empty bins present
    agg = binned.groupBy("bin").agg(
        F.coalesce(F.sum(F.when(F.col("is_ref"), 1)), F.lit(0))
        .cast("bigint")
        .alias("ref_cnt"),
        F.coalesce(F.sum(F.when(~F.col("is_ref"), 1)), F.lit(0))
        .cast("bigint")
        .alias("cur_cnt"),
    )
    counts = (
        spark.range(PSI_BINS)
        .select(F.col("id").alias("bin"))
        .join(F.broadcast(agg), "bin", "left")
        .select(
            "bin",
            F.coalesce("ref_cnt", F.lit(0)).cast("bigint").alias("ref_cnt"),
            F.coalesce("cur_cnt", F.lit(0)).cast("bigint").alias("cur_cnt"),
        )
        # <= PSI_BINS rows feeding both the totals aggregate and the
        # per-bin terms — checkpoint so the corpus aggregation subtree
        # is not re-derived per consumer (the bounded-frame convention)
        .localCheckpoint(eager=True)
    )
    tot = counts.agg(
        F.sum("ref_cnt").alias("ref_tot"), F.sum("cur_cnt").alias("cur_tot")
    )
    terms = counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "ref_cnt",
        "cur_cnt",
        (
            (F.col("ref_cnt") + 1).cast("double") / (F.col("ref_tot") + PSI_BINS)
        ).alias("p_ref"),
        (
            (F.col("cur_cnt") + 1).cast("double") / (F.col("cur_tot") + PSI_BINS)
        ).alias("p_cur"),
    )
    terms2 = terms.select(
        "*",
        (
            (F.col("p_cur") - F.col("p_ref"))
            * F.log(F.col("p_cur") / F.col("p_ref"))
        ).alias("term"),
    )
    total = terms2.agg(
        F.sum(F.round(F.col("term"), 12).cast("decimal(24,12)")).alias("psi_dec")
    )
    return (
        terms2.crossJoin(F.broadcast(total))
        .select(
            "bin",
            "ref_cnt",
            "cur_cnt",
            F.round("p_ref", 6).alias("p_ref"),
            F.round("p_cur", 6).alias("p_cur"),
            F.round("term", 6).alias("psi_term"),
            F.round(F.col("psi_dec").cast("double"), 6).alias("psi_total"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical list and
# the embedding-cosine vector list (Cormack et al. 2009, k=60).
# ---------------------------------------------------------------------------

RRF_K = 60
RRF_LIST_N = 20
RRF_TOP = 10
RRF_QUERY_VEC = 0  # the fixed query embedding, as the ANN queries use


def _rrf_oracle() -> str:
    p = bm25_sql_parts()
    contrib = (
        f"COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + l.lex_rank), CAST(0 AS DOUBLE))"
        f" + COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + v.vec_rank), CAST(0 AS DOUBLE))"
    )
    return f"""
    WITH per_doc AS (
      SELECT doc_id, CAST(len({p["toks"]}) AS BIGINT) AS dl, {p["tf_cols"]}
      FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
             {p["df_cols"]}
      FROM per_doc
    ),
    lex AS (
      SELECT d.doc_id, {p["score"]} AS sc
      FROM per_doc d CROSS JOIN stats s
      WHERE {p["any_tf"]} > 0
      ORDER BY sc DESC, d.doc_id LIMIT {RRF_LIST_N}
    ),
    lexr AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY sc DESC, doc_id) AS lex_rank
      FROM lex
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    q AS (SELECT emb AS qe FROM e WHERE vec_id = {RRF_QUERY_VEC}),
    vs AS (
      SELECT c.vec_id, {_COS_SQL.format(a="q.qe", b="c.emb")} AS cos
      FROM e c CROSS JOIN q
      WHERE c.vec_id <> {RRF_QUERY_VEC}
      ORDER BY cos DESC, c.vec_id LIMIT {RRF_LIST_N}
    ),
    vecr AS (
      SELECT vec_id,
             row_number() OVER (ORDER BY cos DESC, vec_id) AS vec_rank
      FROM vs
    )
    SELECT COALESCE(l.doc_id, v.vec_id) AS doc_id,
           CAST(l.lex_rank AS INT) AS lex_rank,
           CAST(v.vec_rank AS INT) AS vec_rank,
           ROUND({contrib}, 9) AS rrf
    FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.vec_id
    ORDER BY {contrib} DESC, doc_id
    LIMIT {RRF_TOP}
    """


@_register("hybrid_rrf_fusion", _rrf_oracle())
def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: the BM25 top-20 for
    the fixed lexical query (shared leg: bm25_scored_input — the same
    frame bm25_retrieval scores) and the embedding-cosine top-20 for
    the fixed query vector (the same query the ANN family uses), fused
    by rrf = Σ 1/(60+rank) over the lists a document appears in.

    Determinism: both lists cut on (exact score, id) with integer ranks
    assigned after the cut; each document's fusion score adds ≤2
    identical doubles (commutative — no fold-order hazard); final cut
    on (rrf, doc_id).

    Scale shape: each leg is its retriever's native plan (one text
    scan + TakeOrdered; one embeddings scan + TakeOrdered); ranks come
    from windows over the ≤20-row cut lists; the fusion is a full
    outer join of two 20-row frames. At 100 TB the legs dominate and
    are exactly the attested bm25/ANN plans — fusion adds nothing to
    the shuffle budget."""
    def _rank_on_cut(cut: DataFrame, score: str, id_col: str, alias: str) -> DataFrame:
        """row_number over (score DESC, id ASC) on a ≤RRF_LIST_N-row cut
        WITHOUT a window: rank = 1 + |strictly-better rows| via a
        broadcast self-join (no row shares (score, id), so ranks are
        dense) — same rationale as roc_auc_binned's triangular join:
        an unpartitioned window over even 20 rows warns in every log."""
        cut = cut.localCheckpoint(eager=True)  # both join sides + tiny
        other = cut.select(
            F.col(score).alias("_s2"), F.col(id_col).alias("_i2")
        )
        better = (F.col("_s2") > F.col(score)) | (
            (F.col("_s2") == F.col(score)) & (F.col("_i2") < F.col(id_col))
        )
        return (
            cut.join(F.broadcast(other), better, "left")
            .groupBy(id_col)
            .agg((F.count("_i2") + 1).cast("int").alias(alias))
        )

    lex = (
        bm25_scored_input(spark, sf_dir)
        .where(bm25_any_tf_col() > 0)
        .select("doc_id", _bm25_score_col().alias("sc"))
        .orderBy(F.desc("sc"), "doc_id")
        .limit(RRF_LIST_N)
    )
    lexr = _rank_on_cut(lex, "sc", "doc_id", "lex_rank")
    e = _emb(spark, sf_dir)
    q = e.where(F.col("vec_id") == RRF_QUERY_VEC).select(
        F.col("emb").alias("qe"), F.col("norm").alias("qnorm")
    )
    vs = (
        e.where(F.col("vec_id") != RRF_QUERY_VEC)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (dot(F.col("qe"), F.col("emb")) / (F.col("qnorm") * F.col("norm"))).alias(
                "cos"
            ),
        )
        .orderBy(F.desc("cos"), "vec_id")
        .limit(RRF_LIST_N)
    )
    vecr = _rank_on_cut(vs, "cos", "vec_id", "vec_rank")
    one = F.lit(1).cast("double")
    zero = F.lit(0).cast("double")
    rrf = F.coalesce(one / (RRF_K + F.col("lex_rank")), zero) + F.coalesce(
        one / (RRF_K + F.col("vec_rank")), zero
    )
    return (
        lexr.join(vecr, lexr.doc_id == vecr.vec_id, "full_outer")
        .select(
            F.coalesce("doc_id", "vec_id").alias("doc_id"),
            F.col("lex_rank").cast("int").alias("lex_rank"),
            F.col("vec_rank").cast("int").alias("vec_rank"),
            rrf.alias("rrf_raw"),
        )
        .orderBy(F.desc("rrf_raw"), "doc_id")
        .limit(RRF_TOP)
        .select(
            "doc_id", "lex_rank", "vec_rank", F.round("rrf_raw", 9).alias("rrf")
        )
    )


# ---------------------------------------------------------------------------
# MMR diversified top-k over the vector candidates (λ=0.5, exact in
# binary, so relevance and redundancy weigh identically both engines).
# ---------------------------------------------------------------------------

MMR_CANDIDATES = 12
MMR_PICKS = 5
_HALF = "CAST(0.5 AS DOUBLE)"


def _mmr_oracle() -> str:
    rounds = []
    prev_sel = "s1"
    for r in range(2, MMR_PICKS + 1):
        rounds.append(
            f"""
    m{r} AS (
      SELECT p.id_a AS vec_id, MAX(p.sim) AS maxsim
      FROM pairs p JOIN {prev_sel} s ON p.id_b = s.vec_id
      GROUP BY p.id_a
    ),
    p{r} AS (
      SELECT c.vec_id, c.rel, m.maxsim,
             {_HALF} * c.rel - {_HALF} * m.maxsim AS mmr,
             {r} AS pick_order
      FROM cand c JOIN m{r} m USING (vec_id)
      WHERE c.vec_id NOT IN (SELECT vec_id FROM {prev_sel})
      ORDER BY mmr DESC, c.vec_id LIMIT 1
    ),
    s{r} AS (
      SELECT vec_id FROM {prev_sel} UNION ALL SELECT vec_id FROM p{r}
    )"""
        )
        prev_sel = f"s{r}"
    picks_union = " UNION ALL ".join(
        f"SELECT * FROM p{r}" for r in range(1, MMR_PICKS + 1)
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    q AS (SELECT emb AS qe FROM e WHERE vec_id = {RRF_QUERY_VEC}),
    sc AS (
      SELECT c.vec_id, c.emb, {_COS_SQL.format(a="q.qe", b="c.emb")} AS cos
      FROM e c CROSS JOIN q
      WHERE c.vec_id <> {RRF_QUERY_VEC}
    ),
    cand AS (
      SELECT vec_id, ROUND(cos, 6) AS rel, emb
      FROM sc ORDER BY cos DESC, vec_id LIMIT {MMR_CANDIDATES}
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND({_COS_SQL.format(a="a.emb", b="b.emb")}, 6) AS sim
      FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
    ),
    p1 AS (
      SELECT vec_id, rel, CAST(0 AS DOUBLE) AS maxsim,
             {_HALF} * rel - {_HALF} * CAST(0 AS DOUBLE) AS mmr,
             1 AS pick_order
      FROM cand ORDER BY mmr DESC, vec_id LIMIT 1
    ),
    s1 AS (SELECT vec_id FROM p1),{",".join(rounds)}
    SELECT pick_order, vec_id, rel AS relevance,
           ROUND(maxsim, 6) AS max_sim_selected,
           ROUND(mmr, 6) AS mmr_score
    FROM ({picks_union}) ORDER BY pick_order
    """


@_register("mmr_diversified_topk", _mmr_oracle())
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance diversification (Carbonell &
    Goldstein 1998): from the query's top-{MMR_CANDIDATES} cosine
    candidates, greedily pick {MMR_PICKS} maximizing
    λ·relevance − (1−λ)·max-similarity-to-already-picked with λ=0.5 —
    the de-duplicating re-rank every RAG retrieval stack runs between
    ANN recall and the context window.

    Determinism: relevance and pairwise similarities are 6-dp-rounded
    BEFORE the greedy loop, so both engines compare identical doubles;
    every argmax tie-breaks on vec_id; λ=0.5 is exact in binary. The
    oracle unrolls the same {MMR_PICKS} greedy rounds as CTE chains.

    Scale shape: the corpus-wide work is ONE embeddings scan +
    TakeOrdered for the candidate cut (the attested ANN plan); the
    greedy loop then runs entirely on the checkpointed
    ≤{MMR_CANDIDATES}-row candidate frame and its ≤{MMR_CANDIDATES}²
    pairwise-sim frame — per-round jobs over broadcast-tiny frames,
    never the corpus (the skyline bounded-frame pattern)."""
    e = _emb(spark, sf_dir)
    q = e.where(F.col("vec_id") == RRF_QUERY_VEC).select(
        F.col("emb").alias("qe"), F.col("norm").alias("qnorm")
    )
    cand = (
        e.where(F.col("vec_id") != RRF_QUERY_VEC)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "emb",
            "norm",
            (dot(F.col("qe"), F.col("emb")) / (F.col("qnorm") * F.col("norm"))).alias(
                "cos"
            ),
        )
        .orderBy(F.desc("cos"), "vec_id")
        .limit(MMR_CANDIDATES)
        .select("vec_id", F.round("cos", 6).alias("rel"), "emb", "norm")
        .localCheckpoint(eager=True)
    )
    a = cand.select(
        F.col("vec_id").alias("id_a"), F.col("emb").alias("ea"), F.col("norm").alias("na")
    )
    b = cand.select(
        F.col("vec_id").alias("id_b"), F.col("emb").alias("eb"), F.col("norm").alias("nb")
    )
    pairs = (
        a.join(F.broadcast(b), F.col("id_a") != F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6
            ).alias("sim"),
        )
        .localCheckpoint(eager=True)
    )
    half = F.lit(0.5).cast("double")
    zero = F.lit(0).cast("double")
    picks = (
        cand.select(
            "vec_id",
            "rel",
            zero.alias("maxsim"),
            (half * F.col("rel") - half * zero).alias("mmr"),
            F.lit(1).alias("pick_order"),
        )
        .orderBy(F.desc("mmr"), "vec_id")
        .limit(1)
        .localCheckpoint(eager=True)
    )
    for r in range(2, MMR_PICKS + 1):
        sel_ids = picks.select(F.col("vec_id").alias("sid"))
        ms = (
            pairs.join(F.broadcast(sel_ids), pairs.id_b == F.col("sid"))
            .groupBy("id_a")
            .agg(F.max("sim").alias("maxsim"))
        )
        pick = (
            cand.join(ms, cand.vec_id == ms.id_a)
            .join(F.broadcast(sel_ids), cand.vec_id == F.col("sid"), "left_anti")
            .select(
                "vec_id",
                "rel",
                "maxsim",
                (half * F.col("rel") - half * F.col("maxsim")).alias("mmr"),
                F.lit(r).alias("pick_order"),
            )
            .orderBy(F.desc("mmr"), "vec_id")
            .limit(1)
        )
        picks = picks.union(pick).localCheckpoint(eager=True)
    return picks.select(
        F.col("pick_order").cast("int").alias("pick_order"),
        "vec_id",
        F.col("rel").alias("relevance"),
        F.round("maxsim", 6).alias("max_sim_selected"),
        F.round("mmr", 6).alias("mmr_score"),
    ).orderBy("pick_order")


# ---------------------------------------------------------------------------
# nDCG@k of the IVF ANN search against the exact-cosine ground truth —
# the graded-ranking metric beside embedding_matryoshka_recall's
# recall@5: recall asks "did the truth show up", nDCG asks "how high".
# ---------------------------------------------------------------------------

NDCG_K = 5  # == similarity.TOP_K: both lists are top-5 cuts

# 1/log2(i+1) discounts and their prefix sums (ideal DCG for tp hits),
# precomputed in Python and injected as LITERALS into both engines —
# no engine ever folds doubles to build them.
_DISCOUNTS = [1.0 / math.log2(i + 1) for i in range(1, NDCG_K + 1)]
_IDCG = [0.0]
for _w in _DISCOUNTS:
    _IDCG.append(_IDCG[-1] + _w)


def _ndcg_oracle() -> str:
    from automated_dow30_earnings_reports_spark.operators.similarity import ORACLES

    r_cols = ", ".join(
        f"MAX(CASE WHEN rnk = {i} THEN rel ELSE 0 END) AS r{i}"
        for i in range(1, NDCG_K + 1)
    )
    tp = " + ".join(f"r{i}" for i in range(1, NDCG_K + 1))
    dcg = " + ".join(
        f"r{i} * CAST('{_DISCOUNTS[i - 1]!r}' AS DOUBLE)"
        for i in range(1, NDCG_K + 1)
    )
    idcg = " ".join(
        f"WHEN {k} THEN CAST('{_IDCG[k]!r}' AS DOUBLE)"
        for k in range(1, NDCG_K + 1)
    )
    return f"""
    WITH ivf AS (
      SELECT query_id, neighbor_id, rnk
      FROM ({ORACLES["similarity_ann_ivf"]})
    ),
    exact AS (
      SELECT query_id AS eq, neighbor_id AS en
      FROM ({ORACLES["similarity_cosine_topk"]})
    ),
    rel AS (
      SELECT i.query_id, i.rnk,
             CASE WHEN e.en IS NOT NULL THEN 1 ELSE 0 END AS rel
      FROM ivf i LEFT JOIN exact e
        ON e.eq = i.query_id AND e.en = i.neighbor_id
    ),
    per_q AS (
      SELECT query_id, {r_cols} FROM rel GROUP BY query_id
    ),
    scoredq AS (
      SELECT query_id, {tp} AS tp, {dcg} AS dcg FROM per_q
    )
    SELECT query_id, CAST(tp AS BIGINT) AS tp,
           ROUND(dcg, 6) AS dcg,
           ROUND(CASE WHEN tp = 0 THEN CAST(0 AS DOUBLE)
                 ELSE dcg / (CASE tp {idcg} END) END, 6) AS ndcg
    FROM scoredq ORDER BY query_id
    """


@_register("ann_ndcg_at_k", _ndcg_oracle())
def ann_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@{NDCG_K} of similarity_ann_ivf against the exact brute-force
    top-{NDCG_K} (binary relevance: a returned neighbor is relevant iff
    it appears in the exact list) — the ranked-quality counterpart to
    the recall checks pinned on the ANN family.

    Determinism: relevance flags are exact integers pivoted per rank;
    DCG is a fixed-order expression over LITERAL discount constants
    (precomputed in Python, injected into both engines — 1/log2 never
    evaluated engine-side); ideal DCG is a literal lookup on the
    integer hit count. The only division is ndcg itself.

    Scale shape: both legs are the attested retrieval plans (IVF's
    cell-pruned probe; the exact baseline is the LABELED ground-truth
    exemption, run at eval scale only); the metric adds a join of two
    (queries × k)-row frames and a groupBy over ≤queries keys."""
    from automated_dow30_earnings_reports_spark.operators.similarity import QUERIES

    ivf = QUERIES["similarity_ann_ivf"](spark, sf_dir).select(
        "query_id", "neighbor_id", "rnk"
    )
    exact = QUERIES["similarity_cosine_topk"](spark, sf_dir).select(
        F.col("query_id").alias("eq"), F.col("neighbor_id").alias("en")
    )
    rel = ivf.join(
        exact,
        (ivf.query_id == F.col("eq")) & (ivf.neighbor_id == F.col("en")),
        "left",
    ).select(
        "query_id",
        "rnk",
        F.when(F.col("en").isNotNull(), 1).otherwise(0).alias("rel"),
    )
    per_q = rel.groupBy("query_id").agg(
        *[
            F.max(F.when(F.col("rnk") == i, F.col("rel")).otherwise(0)).alias(f"r{i}")
            for i in range(1, NDCG_K + 1)
        ]
    )
    tp = None
    dcg = None
    for i in range(1, NDCG_K + 1):
        tp = F.col(f"r{i}") if tp is None else tp + F.col(f"r{i}")
        term = F.col(f"r{i}") * F.lit(_DISCOUNTS[i - 1])
        dcg = term if dcg is None else dcg + term
    scoredq = per_q.select("query_id", tp.alias("tp"), dcg.alias("dcg"))
    idcg = F.lit(None).cast("double")
    for k in range(1, NDCG_K + 1):
        idcg = F.when(F.col("tp") == k, F.lit(_IDCG[k])).otherwise(idcg)
    return scoredq.select(
        "query_id",
        F.col("tp").cast("bigint").alias("tp"),
        F.round("dcg", 6).alias("dcg"),
        F.round(
            F.when(F.col("tp") == 0, F.lit(0).cast("double")).otherwise(
                F.col("dcg") / idcg
            ),
            6,
        ).alias("ndcg"),
    ).orderBy("query_id")


# ---------------------------------------------------------------------------
# Embedding-space drift between snapshot halves — the vector-side
# companion to psi_feature_drift's scalar monitor: has the corpus
# centroid MOVED between the reference and current ingest?
# ---------------------------------------------------------------------------

EMB_DIM = 64


def _emb_drift_oracle() -> str:
    return f"""
    WITH ex AS (
      SELECT (vec_id % 2 = 0) AS is_ref, i AS dim,
             CAST(ROUND(CAST(embedding[i] AS DOUBLE), 6) AS DECIMAL(20,6)) AS x6
      FROM embeddings, range(1, {EMB_DIM + 1}) t(i)
    ),
    per AS (
      SELECT is_ref, dim, SUM(x6) AS s, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ex GROUP BY is_ref, dim
    ),
    cents AS (
      SELECT dim,
             MAX(CASE WHEN is_ref THEN CAST(s AS DOUBLE) / cnt END)     AS c_ref,
             MAX(CASE WHEN NOT is_ref THEN CAST(s AS DOUBLE) / cnt END) AS c_cur
      FROM per GROUP BY dim
    ),
    folded AS (
      SELECT SUM(CAST(ROUND(c_ref * c_cur, 12) AS DECIMAL(30,12))) AS dp,
             SUM(CAST(ROUND(c_ref * c_ref, 12) AS DECIMAL(30,12))) AS nr,
             SUM(CAST(ROUND(c_cur * c_cur, 12) AS DECIMAL(30,12))) AS nc,
             SUM(CAST(ROUND((c_ref - c_cur) * (c_ref - c_cur), 12)
                      AS DECIMAL(30,12))) AS d2
      FROM cents
    ),
    n AS (
      SELECT CAST(COUNT(*) FILTER (vec_id % 2 = 0) AS BIGINT)  AS n_ref,
             CAST(COUNT(*) FILTER (vec_id % 2 <> 0) AS BIGINT) AS n_cur
      FROM embeddings
    )
    SELECT n_ref, n_cur,
           ROUND(CASE WHEN nr = 0 OR nc = 0 THEN NULL
                      ELSE CAST(dp AS DOUBLE)
                           / (sqrt(CAST(nr AS DOUBLE)) * sqrt(CAST(nc AS DOUBLE)))
                 END, 6) AS centroid_cosine,
           ROUND(sqrt(CAST(d2 AS DOUBLE)), 6) AS centroid_l2
    FROM folded CROSS JOIN n
    ORDER BY n_ref
    """


@_register("embedding_drift_centroid", _emb_drift_oracle())
def embedding_drift_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid drift between the even/odd vec_id snapshot halves:
    cosine between the two corpus centroids and the L2 shift — the
    embedding-space drift monitor a pipeline reads next to the scalar
    PSI before accepting a new ingest (a re-embedding-model change or
    a topic shift moves the centroid long before scalar stats notice).

    Determinism: per-dim sums fold 6-dp-rounded components through
    DECIMAL (exact, order-free); the 64-term dot/norm folds are
    12-dp-rounded DECIMAL sums (the PSI-total pattern); the only
    doubles are the final divisions and square roots over identical
    inputs.

    Scale shape: one posexplode scan → (2×64)-key aggregate (map-side
    combinable, the embedding_centroid shape) → all remaining work on
    a 64-row frame."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        (F.col("vec_id") % 2 == 0).alias("is_ref"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
    ).select(
        "is_ref",
        (F.col("pos") + 1).alias("dim"),
        F.round("x", 6).cast("decimal(20,6)").alias("x6"),
    )
    per = ex.groupBy("is_ref", "dim").agg(
        F.sum("x6").alias("s"), F.count("*").cast("bigint").alias("cnt")
    )
    m = F.col("s").cast("double") / F.col("cnt")
    cents = per.groupBy("dim").agg(
        F.max(F.when(F.col("is_ref"), m)).alias("c_ref"),
        F.max(F.when(~F.col("is_ref"), m)).alias("c_cur"),
    )

    def _fold(expr, alias):
        return F.sum(F.round(expr, 12).cast("decimal(30,12)")).alias(alias)

    folded = cents.agg(
        _fold(F.col("c_ref") * F.col("c_cur"), "dp"),
        _fold(F.col("c_ref") * F.col("c_ref"), "nr"),
        _fold(F.col("c_cur") * F.col("c_cur"), "nc"),
        _fold((F.col("c_ref") - F.col("c_cur")) * (F.col("c_ref") - F.col("c_cur")), "d2"),
    )
    n = e.agg(
        F.sum(F.when(F.col("vec_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_ref"),
        F.sum(F.when(F.col("vec_id") % 2 != 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_cur"),
    )
    return (
        folded.crossJoin(F.broadcast(n))
        .select(
            "n_ref",
            "n_cur",
            # a degenerate all-zero centroid (nr or nc == 0) yields
            # NULL, never DIVIDE_BY_ZERO under ANSI — mirrored CASE in
            # the oracle (the roc_auc/kappa convention in this file)
            F.round(
                F.when(
                    (F.col("nr") == 0) | (F.col("nc") == 0), F.lit(None)
                ).otherwise(
                    F.col("dp").cast("double")
                    / (
                        F.sqrt(F.col("nr").cast("double"))
                        * F.sqrt(F.col("nc").cast("double"))
                    )
                ),
                6,
            ).alias("centroid_cosine"),
            F.round(F.sqrt(F.col("d2").cast("double")), 6).alias("centroid_l2"),
        )
        .orderBy("n_ref")
    )
