"""Round-6 operators: persisted-index maintenance (skew-triggered
re-cluster), and the other round-6 production surfaces.

Reference parity: the reference has no vector index at all — this is
engine-side forward surface (VERDICT r5 task list), held to the same
oracle bar as the reference-derived operators.
"""

import math
import os

import pyspark.sql.functions as F
import pytest


# ---------------------------------------------------------------------------
# ivf_index_recluster — the maintenance phase of the index lifecycle
# ---------------------------------------------------------------------------


def _build_and_append(spark, sf_dir, path, corpus):
    """The build+append prefix of the lifecycle (shared by the trigger
    tests): initial slice with seed centroids, then the rest of
    ``corpus`` appended against the STORED centroids."""
    from automated_dow30_earnings_reports_spark.operators.similarity import (
        IVF_APPEND_SPLIT,
        IVF_CELLS,
        _assign_cells,
    )
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        write_partitioned,
    )

    old = corpus.where(F.col("vec_id") < IVF_APPEND_SPLIT)
    cents = old.where(F.col("vec_id") < IVF_CELLS).select(
        F.col("vec_id").alias("cid"),
        F.col("emb").alias("ce"),
        F.col("norm").alias("cnorm"),
    )
    cents.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    write_partitioned(
        _assign_cells(old, cents), os.path.join(path, "postings"), ["cell"],
        dynamic=False,
    )
    idx_cents = spark.read.parquet(os.path.join(path, "centroids"))
    write_partitioned(
        _assign_cells(corpus.where(F.col("vec_id") >= IVF_APPEND_SPLIT), idx_cents),
        os.path.join(path, "postings"),
        ["cell"],
        mode="append",
    )


def test_adversarial_append_triggers_recluster(spark, sf_smoke, tmp_path):
    """A drifted ingest batch must push the stored index past the skew
    threshold (with margin — the gate is a real branch), and the
    re-cluster must actually rewrite the quantizer."""
    from automated_dow30_earnings_reports_spark.operators.similarity import (
        RECLUSTER_SKEW_THRESHOLD,
        _drifted_corpus,
        _emb,
        _index_skew_ratio,
        _recluster_index,
    )

    path = str(tmp_path / "idx")
    corpus = _drifted_corpus(_emb(spark, sf_smoke)).localCheckpoint(eager=True)
    _build_and_append(spark, sf_smoke, path, corpus)

    ratio = _index_skew_ratio(spark.read.parquet(os.path.join(path, "postings")))
    assert ratio >= RECLUSTER_SKEW_THRESHOLD * 1.25, ratio

    before = {
        (r["cid"], tuple(r["ce"]))
        for r in spark.read.parquet(os.path.join(path, "centroids")).collect()
    }
    _recluster_index(spark, path)
    after = {
        (r["cid"], tuple(r["ce"]))
        for r in spark.read.parquet(os.path.join(path, "centroids")).collect()
    }
    assert after != before  # the rewrite re-trained, not just re-wrote
    # re-clustering must relieve the skew it was triggered by
    relieved = _index_skew_ratio(spark.read.parquet(os.path.join(path, "postings")))
    assert relieved < ratio
    # layout contract survives the rewrite: postings stay cell-partitioned
    assert any(
        d.startswith("cell=") for d in os.listdir(os.path.join(path, "postings"))
    )


def test_natural_append_stays_under_threshold(spark, sf_smoke, tmp_path):
    """A non-drifted append must NOT trigger maintenance — the natural
    corpus's cell occupancy sits well under the threshold, so the gate
    distinguishes drift from noise."""
    from automated_dow30_earnings_reports_spark.operators.similarity import (
        RECLUSTER_SKEW_THRESHOLD,
        _emb,
        _index_skew_ratio,
    )

    path = str(tmp_path / "idx")
    corpus = _emb(spark, sf_smoke).localCheckpoint(eager=True)
    _build_and_append(spark, sf_smoke, path, corpus)
    ratio = _index_skew_ratio(spark.read.parquet(os.path.join(path, "postings")))
    assert ratio < RECLUSTER_SKEW_THRESHOLD * 0.75, ratio


def test_recluster_search_matches_pure_lloyd(spark, sf_smoke):
    """The registered lifecycle query (build -> drifted append -> skew
    gate -> re-cluster -> search) must equal the never-persisted Lloyd
    computation over the same drifted corpus — the persistence layer
    adds nothing and loses nothing."""
    from automated_dow30_earnings_reports_spark.operators.similarity import (
        IVF_CELLS,
        KMEANS_ROUNDS,
        TOP_K,
        N_QUERY_VECS,
        Window,
        _assign_cells,
        _drifted_corpus,
        _emb,
        _update_centroids,
        dot,
        ivf_index_recluster,
    )

    got = [tuple(r) for r in ivf_index_recluster(spark, sf_smoke).collect()]

    e = _drifted_corpus(_emb(spark, sf_smoke)).localCheckpoint(eager=True)
    cents = e.where(F.col("vec_id") < IVF_CELLS).select(
        F.col("vec_id").alias("cid"),
        F.col("emb").alias("ce"),
        F.col("norm").alias("cnorm"),
    )
    for _ in range(KMEANS_ROUNDS):
        cents = _update_centroids(_assign_cells(e, cents))
    cells = _assign_cells(e, cents)
    q = cells.where(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        "cell",
        F.col("emb").alias("qe"),
        F.col("norm").alias("qnorm"),
    )
    cand = cells.join(F.broadcast(q), "cell").where(
        F.col("vec_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    want = [
        tuple(r)
        for r in cand.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot(F.col("qe"), F.col("emb")) / (F.col("qnorm") * F.col("norm"))).alias(
                "cos"
            ),
        )
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cosine"),
            F.col("rnk").cast("int").alias("rnk"),
        )
        .orderBy("query_id", "rnk")
        .collect()
    ]
    assert got == want and got


# ---------------------------------------------------------------------------
# dedup_incremental_index — persisted signature index
# ---------------------------------------------------------------------------


def test_dedup_index_idempotent_and_batch_equivalent(spark, sf_smoke):
    """Running the lifecycle twice must not duplicate index rows (the
    build overwrite resets all three tables), and the persisted path
    must equal the never-persisted dedup_incremental_batch."""
    from automated_dow30_earnings_reports_spark.operators.dedup import (
        dedup_incremental_batch,
        dedup_incremental_index,
    )

    first = [tuple(r) for r in dedup_incremental_index(spark, sf_smoke).collect()]
    second = [tuple(r) for r in dedup_incremental_index(spark, sf_smoke).collect()]
    assert first == second and first
    pure = [tuple(r) for r in dedup_incremental_batch(spark, sf_smoke).collect()]
    assert first == pure


def test_dedup_index_layout_bucket_partitioned(spark, sf_smoke):
    """The band table is bucket-partitioned on disk (a probe with known
    buckets is a directory-pruned read) and holds BOTH corpus slices
    after the append."""
    from automated_dow30_earnings_reports_spark.operators.dedup import (
        DEDUP_INDEX_BUCKETS,
        _dedup_index_path,
        dedup_incremental_index,
    )

    dedup_incremental_index(spark, sf_smoke).collect()
    path = _dedup_index_path(sf_smoke)
    band_dirs = [
        d for d in os.listdir(os.path.join(path, "bands")) if d.startswith("bucket=")
    ]
    assert band_dirs and len(band_dirs) <= DEDUP_INDEX_BUCKETS
    bands = spark.read.parquet(os.path.join(path, "bands"))
    new_n = bands.where(F.col("doc_id") % 5 == 4).count()
    old_n = bands.where(F.col("doc_id") % 5 != 4).count()
    assert new_n > 0 and old_n > 0


# ---------------------------------------------------------------------------
# quality_classifier_linear — learned-gate tier of the quality stack
# ---------------------------------------------------------------------------


def test_classifier_gate_composes_with_curation_funnel(spark, sf_smoke):
    """The classifier keep-gate must slot into the curation funnel as a
    fourth stage: applied after the Gopher rules it keeps a non-trivial
    strict subset (a real learned gate, not a constant), and the funnel
    stays monotone."""
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        quality_classifier_cols,
        quality_pass_col,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    d = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    n_raw = d.count()
    rules = d.where(quality_pass_col(F.col("text")))
    n_rules = rules.count()
    _, keep = quality_classifier_cols(F.col("text"))
    n_both = rules.where(keep).count()
    assert n_raw >= n_rules >= n_both
    assert 0 < n_both < n_rules  # the gate splits, both classes populated


def test_classifier_score_bounds_and_gate_consistency(spark, sf_smoke):
    """Scores live in (0,1); the keep flag equals the >= 0.5 gate on
    the rounded score for every document; short docs (< 2 tokens, no
    bigram features) score exactly sigmoid(bias)=0.5 and are kept."""
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        quality_classifier_linear,
    )

    rows = quality_classifier_linear(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["qc_score"] < 1.0
        assert r["keep"] == (r["qc_score"] >= 0.5)
        if r["n_feats"] == 0:
            assert r["qc_score"] == 0.5 and r["keep"]


# ---------------------------------------------------------------------------
# streaming_ivf_ingest — streaming -> persisted-index composition
# ---------------------------------------------------------------------------


def test_streaming_ivf_restart_resume_and_replay_safety(spark, sf_smoke, tmp_path):
    """Two stream runs against one checkpoint: the second batch contains
    BOTH already-ingested arrival ids (duplicates/replay) and new ones.
    Committed ids must not re-append (anti-join replay safety), the new
    ids must land, and the final index must equal the never-streamed
    full-corpus IVF."""
    from automated_dow30_earnings_reports_spark.operators.similarity import (
        IVF_APPEND_SPLIT,
        IVF_CELLS,
        _assign_cells,
        _emb,
        _query_vectors,
        _search_index,
        similarity_ann_ivf,
    )
    from automated_dow30_earnings_reports_spark.sources.kv_datasource import register
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        write_partitioned,
    )
    from automated_dow30_earnings_reports_spark.streaming.incremental import (
        start_ivf_ingest_stream,
    )

    register(spark)
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    index_path = str(tmp_path / "index")

    e = _emb(spark, sf_smoke).localCheckpoint(eager=True)
    old = e.where(F.col("vec_id") < IVF_APPEND_SPLIT)
    cents = old.where(F.col("vec_id") < IVF_CELLS).select(
        F.col("vec_id").alias("cid"),
        F.col("emb").alias("ce"),
        F.col("norm").alias("cnorm"),
    )
    cents.write.mode("overwrite").parquet(os.path.join(index_path, "centroids"))
    write_partitioned(
        _assign_cells(old, cents),
        os.path.join(index_path, "postings"),
        ["cell"],
        dynamic=False,
    )

    mid = IVF_APPEND_SPLIT + 100
    # run 1: arrivals [SPLIT, mid)
    e.where(F.col("vec_id").between(IVF_APPEND_SPLIT, mid - 1)).select(
        "vec_id"
    ).write.format("kvlinks").option("path", landing).mode("append").save()
    start_ivf_ingest_stream(spark, landing, index_path, ckpt, e).awaitTermination(180)
    p1 = spark.read.parquet(os.path.join(index_path, "postings"))
    assert p1.where(F.col("vec_id") >= IVF_APPEND_SPLIT).count() == 100
    assert p1.groupBy("vec_id").count().where(F.col("count") > 1).count() == 0

    # run 2 (restart, same checkpoint): a new arrival file carrying
    # replayed ids from run 1 PLUS the remaining tail
    e.where(F.col("vec_id") >= mid - 50).select("vec_id").write.format(
        "kvlinks"
    ).option("path", landing).mode("append").save()
    start_ivf_ingest_stream(spark, landing, index_path, ckpt, e).awaitTermination(180)
    p2 = spark.read.parquet(os.path.join(index_path, "postings"))
    assert p2.groupBy("vec_id").count().where(F.col("count") > 1).count() == 0
    assert p2.count() == e.count()  # every vector present exactly once

    # the streamed index answers queries identically to the pure IVF
    idx_cents = spark.read.parquet(os.path.join(index_path, "centroids"))
    got = [
        tuple(r)
        for r in _search_index(p2, idx_cents, _query_vectors(e)).collect()
    ]
    want = [tuple(r) for r in similarity_ann_ivf(spark, sf_smoke).collect()]
    assert got == want and got


def test_streaming_dedup_ingest_matches_batch(spark, sf_smoke):
    """The streamed signature-index lifecycle must equal the batch
    index path and the never-persisted incremental dedup."""
    from automated_dow30_earnings_reports_spark.operators.dedup import (
        dedup_incremental_batch,
    )
    from automated_dow30_earnings_reports_spark.streaming.incremental import (
        streaming_dedup_ingest,
    )

    got = [tuple(r) for r in streaming_dedup_ingest(spark, sf_smoke).collect()]
    want = [tuple(r) for r in dedup_incremental_batch(spark, sf_smoke).collect()]
    assert got == want and got


# ---------------------------------------------------------------------------
# ivf_index_delete — tombstones + targeted compaction
# ---------------------------------------------------------------------------


def test_delete_merge_on_read_equals_compacted(spark, sf_smoke, tmp_path):
    """Both delete read paths must agree: searching with a tombstone
    anti-join (before compaction) equals searching the compacted
    postings — and the tombstoned ids are physically gone afterwards."""
    from automated_dow30_earnings_reports_spark.operators.similarity import (
        IVF_CELLS,
        IVF_DELETE_PRED,
        _assign_cells,
        _compact_deletes,
        _emb,
        _query_vectors,
        _search_index,
    )
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        write_partitioned,
    )

    path = str(tmp_path / "idx")
    e = _emb(spark, sf_smoke).localCheckpoint(eager=True)
    cents = e.where(F.col("vec_id") < IVF_CELLS).select(
        F.col("vec_id").alias("cid"),
        F.col("emb").alias("ce"),
        F.col("norm").alias("cnorm"),
    )
    cents.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    write_partitioned(
        _assign_cells(e, cents), os.path.join(path, "postings"), ["cell"],
        dynamic=False,
    )
    e.where(F.expr(IVF_DELETE_PRED)).select("vec_id").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "tombstones"))

    idx_cents = spark.read.parquet(os.path.join(path, "centroids"))
    tombs = spark.read.parquet(os.path.join(path, "tombstones"))
    qvec = _query_vectors(e.where(~F.expr(IVF_DELETE_PRED)))
    mor = spark.read.parquet(os.path.join(path, "postings")).join(
        tombs, "vec_id", "left_anti"
    )
    merge_on_read = [tuple(r) for r in _search_index(mor, idx_cents, qvec).collect()]

    _compact_deletes(spark, path)
    compacted_postings = spark.read.parquet(os.path.join(path, "postings"))
    compacted = [
        tuple(r)
        for r in _search_index(compacted_postings, idx_cents, qvec).collect()
    ]
    assert merge_on_read == compacted and compacted
    # tombstoned rows physically gone; survivors untouched
    assert compacted_postings.join(tombs, "vec_id").count() == 0
    assert compacted_postings.count() == e.where(~F.expr(IVF_DELETE_PRED)).count()


def test_compaction_drops_fully_deleted_cell(spark, sf_smoke, tmp_path):
    """A cell whose every posting is tombstoned must disappear from the
    directory tree (dynamic overwrite can't emit empty partitions — the
    explicit partition-drop covers it)."""
    from automated_dow30_earnings_reports_spark.operators.similarity import (
        IVF_CELLS,
        _assign_cells,
        _compact_deletes,
        _emb,
    )
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        write_partitioned,
    )

    path = str(tmp_path / "idx")
    e = _emb(spark, sf_smoke).localCheckpoint(eager=True)
    cents = e.where(F.col("vec_id") < IVF_CELLS).select(
        F.col("vec_id").alias("cid"),
        F.col("emb").alias("ce"),
        F.col("norm").alias("cnorm"),
    )
    cents.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    cells = _assign_cells(e, cents).localCheckpoint(eager=True)
    write_partitioned(cells, os.path.join(path, "postings"), ["cell"], dynamic=False)

    victim = cells.groupBy("cell").count().orderBy("count", "cell").first()["cell"]
    cells.where(F.col("cell") == victim).select("vec_id").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "tombstones"))
    assert os.path.isdir(os.path.join(path, "postings", f"cell={victim}"))
    _compact_deletes(spark, path)
    assert not os.path.isdir(os.path.join(path, "postings", f"cell={victim}"))
    left = spark.read.parquet(os.path.join(path, "postings"))
    assert left.where(F.col("cell") == victim).count() == 0
    assert left.count() == cells.where(F.col("cell") != victim).count()


# ---------------------------------------------------------------------------
# bpe_train_merges — greedy-merge semantics
# ---------------------------------------------------------------------------


def _py_bpe_merge(syms, px, py):
    """Reference greedy left-to-right non-overlapping merge."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == px and syms[i + 1] == py:
            out.append(px + py)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_bpe_merge_fold_matches_reference(spark):
    """The Spark array fold must implement exactly greedy left-to-right
    non-overlapping merging, including the adversarial shapes: runs of
    overlapping occurrences, merged-symbol collisions, and pairs of
    unequal symbols."""
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        _bpe_merge_fold,
    )

    cases = [
        (["a", "a", "a"], "a", "a"),          # odd run: merge (1,2) only
        (["a", "a", "a", "a"], "a", "a"),     # even run: two merges
        (["a", "b", "a", "b"], "a", "b"),     # back-to-back occurrences
        (["x", "a", "b", "c"], "a", "b"),     # interior occurrence
        (["a", "aa", "aa"], "a", "aa"),       # merged-symbol lookalikes
        (["b", "a"], "a", "b"),               # reversed: no merge
        (["a"], "a", "a"),                    # too short
        (["ab", "b", "a", "b"], "a", "b"),    # symbol equal to merged token
    ]
    df = spark.createDataFrame(
        [(i, syms, px, py) for i, (syms, px, py) in enumerate(cases)],
        "i int, syms array<string>, px string, py string",
    )
    got = {
        r["i"]: list(r["m"])
        for r in df.select(
            "i", _bpe_merge_fold(F.col("syms"), F.col("px"), F.col("py")).alias("m")
        ).collect()
    }
    for i, (syms, px, py) in enumerate(cases):
        assert got[i] == _py_bpe_merge(syms, px, py), (i, got[i])


def test_bpe_merges_are_real_and_ordered(spark, sf_smoke):
    """Three merges come back in round order, each with positive
    frequency, and round N's pair can reference symbols created by
    earlier rounds (or not) — but never an empty symbol."""
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        BPE_ROUNDS,
        bpe_train_merges,
    )

    rows = bpe_train_merges(spark, sf_smoke).collect()
    assert [r["merge_round"] for r in rows] == list(range(1, BPE_ROUNDS + 1))
    freqs = [r["pair_freq"] for r in rows]
    assert all(f > 0 for f in freqs)
    assert freqs == sorted(freqs, reverse=True)  # merge gains are monotone
    assert all(r["left_sym"] and r["right_sym"] for r in rows)


def test_bpe_merge_fold_fuzz(spark):
    """Seeded fuzz parity (the test_fuzz_scalars convention): the fold
    must equal the Python reference over hundreds of random symbol
    arrays drawn from a tiny alphabet (maximizing pair collisions and
    overlap runs), with pairs that include multi-char merged symbols."""
    import random

    from automated_dow30_earnings_reports_spark.operators.textstats import (
        _bpe_merge_fold,
    )

    rng = random.Random(13)
    alpha = ["a", "b", "c", "ab", "aa", "ba"]
    cases = []
    for i in range(400):
        syms = [rng.choice(alpha) for _ in range(rng.randint(1, 12))]
        px, py = rng.choice(alpha), rng.choice(alpha)
        cases.append((i, syms, px, py))
    df = spark.createDataFrame(
        cases, "i int, syms array<string>, px string, py string"
    )
    got = {
        r["i"]: list(r["m"])
        for r in df.select(
            "i", _bpe_merge_fold(F.col("syms"), F.col("px"), F.col("py")).alias("m")
        ).collect()
    }
    for i, syms, px, py in cases:
        assert got[i] == _py_bpe_merge(syms, px, py), (i, syms, px, py, got[i])


# ---------------------------------------------------------------------------
# char_entropy_filter — the gibberish gate of the quality stack
# ---------------------------------------------------------------------------


def test_char_entropy_matches_python_and_gates(spark, sf_smoke):
    """The registered query must reproduce a from-scratch Python
    Shannon entropy per document (6 dp), and the keep band must be the
    rounded-value gate."""
    import collections
    import math

    from automated_dow30_earnings_reports_spark.operators.textstats import (
        ENTROPY_HI,
        ENTROPY_LO,
        char_entropy_filter,
    )

    got = {r["doc_id"]: r for r in char_entropy_filter(spark, sf_smoke).collect()}
    docs = spark.read.parquet(os.path.join(sf_smoke, "documents.parquet")).collect()
    assert len(got) == len(docs)
    for d in docs:
        cnt = collections.Counter(c for c in (d["text"] or "") if c != "\n")
        n = sum(cnt.values())
        ent = (
            -sum(k / n * math.log2(k / n) for k in cnt.values()) if n else 0.0
        )
        r = got[d["doc_id"]]
        assert r["n_chars"] == n
        # engine rounds at 6 dp; tolerance absorbs formula-order ulps
        assert abs(r["char_entropy"] - ent) < 1e-6, (d["doc_id"], ent, r)
        assert r["keep"] == (ENTROPY_LO <= r["char_entropy"] <= ENTROPY_HI)


def test_char_entropy_edge_documents(spark, tmp_path):
    """Uniform text scores exactly 0.0 (not -0.0) and is rejected;
    newline-only and empty docs survive the left join with n_chars=0."""
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        char_entropy_filter,
    )

    p = str(tmp_path / "edge")
    os.makedirs(p)
    spark.createDataFrame(
        [(1, "aaaaaaaaaa"), (2, "\n\n"), (3, ""), (4, None)],
        "doc_id bigint, text string",
    ).write.parquet(os.path.join(p, "documents.parquet"))
    rows = {r["doc_id"]: r for r in char_entropy_filter(spark, p).collect()}
    assert len(rows) == 4
    assert rows[1]["char_entropy"] == 0.0 and not rows[1]["keep"]
    assert math.copysign(1.0, rows[1]["char_entropy"]) == 1.0  # normalized -0.0
    for i in (2, 3, 4):
        assert rows[i]["n_chars"] == 0 and rows[i]["char_entropy"] == 0.0
        assert not rows[i]["keep"]


# ---------------------------------------------------------------------------
# Round-6 second wave: IVM join view, optimizer stats, bigram LM,
# Zipf fit, classifier calibration
# ---------------------------------------------------------------------------


def test_mv_join_delta_equals_direct_join(spark, sf_smoke):
    """The delta decomposition must equal the one-join ground truth
    computed independently in Spark (the oracle checks vs DuckDB; this
    pins the algebra engine-side)."""
    from automated_dow30_earnings_reports_spark.plans.maintenance import (
        mv_join_delta_refresh,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    got = {
        r["o_orderpriority"]: (r["n_items"], round(r["revenue"], 2))
        for r in mv_join_delta_refresh(spark, sf_smoke).collect()
    }
    o = load_table(spark, sf_smoke, "orders")
    li = load_table(spark, sf_smoke, "lineitem")
    direct = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("rev"),
        )
        .collect()
    )
    assert got == {
        r["o_orderpriority"]: (r["n"], round(r["rev"], 2)) for r in direct
    }


def test_join_cardinality_buckets_cover_truth(spark, sf_smoke):
    """Per-bucket actuals must sum to the true join size, and the
    containment estimate must be exact wherever the bucket's key sets
    actually satisfy containment-with-uniformity (FK join: every order
    key hits one customer)."""
    from automated_dow30_earnings_reports_spark.plans.maintenance import (
        join_cardinality_estimate,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    rows = join_cardinality_estimate(spark, sf_smoke).collect()
    o = load_table(spark, sf_smoke, "orders")
    c = load_table(spark, sf_smoke, "customer")
    true_n = o.join(c, o.o_custkey == c.c_custkey).count()
    assert sum(r["actual_rows"] for r in rows) == true_n
    for r in rows:
        assert r["n_left"] + r["n_right"] > 0
        if r["n_left"] == 0 or r["n_right"] == 0:
            assert r["est_rows"] == 0.0 and r["actual_rows"] == 0


def test_bigram_logprob_matches_python(spark, tmp_path):
    """Hand-built corpus: the interpolated bigram score must equal the
    from-scratch Python computation."""
    import collections

    from automated_dow30_earnings_reports_spark.operators.textstats import (
        BIGRAM_LAMBDA,
        bigram_interpolated_logprob,
    )

    docs = [(1, "a b a b c"), (2, "a a a a"), (3, "c b a")]
    p = str(tmp_path / "bg")
    os.makedirs(p)
    spark.createDataFrame(docs, "doc_id bigint, text string").write.parquet(
        os.path.join(p, "documents.parquet")
    )
    toks = [t for _, x in docs for t in x.split()]
    uni = collections.Counter(toks)
    n = len(toks)
    bg = collections.Counter(
        (a, b) for _, x in docs for a, b in zip(x.split(), x.split()[1:])
    )
    got = {r["doc_id"]: r for r in bigram_interpolated_logprob(spark, p).collect()}
    for doc_id, x in docs:
        ws = x.split()
        lps = [
            math.log(
                BIGRAM_LAMBDA * bg[(a, b)] / uni[a]
                + (1.0 - BIGRAM_LAMBDA) * uni[b] / n
            )
            for a, b in zip(ws, ws[1:])
        ]
        r = got[doc_id]
        assert r["n_bigrams"] == len(lps)
        assert abs(r["avg_logprob"] - sum(lps) / len(lps)) < 1e-6


def test_zipf_fit_matches_python_ols(spark, sf_smoke):
    """Slope/intercept/R² must match a from-scratch OLS over the same
    top-K (rank, freq) points, and look like a Zipf tail."""
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        ZIPF_TOP,
        zipf_law_fit,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    row = zipf_law_fit(spark, sf_smoke).collect()[0]
    docs = load_table(spark, sf_smoke, "documents").collect()
    import collections

    cnt = collections.Counter(
        t for d in docs for t in d["text"].strip().lower().split()
    )
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOP]
    pts = [
        (round(math.log(i + 1), 12), round(math.log(c), 12))
        for i, (_, c) in enumerate(top)
    ]
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    intercept = (sy - slope * sx) / k
    assert row["n_terms"] == k
    assert abs(row["slope"] - slope) < 1e-4
    assert abs(row["intercept"] - intercept) < 1e-4
    assert row["slope"] < 0
    assert row["r_squared"] is not None and 0 < row["r_squared"] <= 1


def test_calibration_consistent_with_gates(spark, sf_smoke):
    """Bucket totals must cover the corpus, and the keep counts must
    equal the standalone classifier's keep count."""
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        quality_classifier_linear,
        quality_score_calibration,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    rows = quality_score_calibration(spark, sf_smoke).collect()
    n_docs = load_table(spark, sf_smoke, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    qc = quality_classifier_linear(spark, sf_smoke).collect()
    assert sum(r["n_qc_keep"] for r in rows) == sum(1 for r in qc if r["keep"])
    for r in rows:
        assert 0 <= r["n_agree"] <= r["n_docs"]
        assert abs(r["agree_rate"] - round(r["n_agree"] / r["n_docs"], 4)) < 1e-9
        # rounded-score bucketing: every keep-side bucket is >= 5
        if r["bucket"] < 5:
            assert r["n_qc_keep"] == 0


def test_top_pc_recovers_planted_direction(spark, tmp_path):
    """On a corpus with a planted dominant direction the fixed-round
    power iteration must recover it (|cos| > 0.99) and report a
    dominant variance share; on the isotropic testdata the contract is
    determinism, which the oracle hash already pins."""
    from automated_dow30_earnings_reports_spark.operators.similarity import (
        EMB_DIM,
        embedding_top_pc,
    )

    import numpy as np

    rng = np.random.default_rng(7)
    u = np.zeros(EMB_DIM)
    u[3], u[17] = 0.8, -0.6  # unit planted direction
    X = rng.normal(0, 0.05, (400, EMB_DIM)) + rng.normal(0, 1.0, (400, 1)) * u
    p = str(tmp_path / "pca")
    os.makedirs(p)
    spark.createDataFrame(
        [(i, [float(x) for x in row], 0) for i, row in enumerate(X)],
        "vec_id bigint, embedding array<float>, label int",
    ).write.parquet(os.path.join(p, "embeddings.parquet"))
    rows = embedding_top_pc(spark, p).collect()
    assert len(rows) == EMB_DIM
    v = np.array([r["loading"] for r in rows])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4
    assert abs(float(v @ u)) > 0.99
    share = rows[0]["pc_share"]
    assert all(r["pc_share"] == share for r in rows)
    assert share > 0.5  # planted direction dominates the variance


def test_text_index_layout_and_parity(spark, sf_smoke):
    """The postings land bucket-partitioned (a query probe is a
    directory-pruned read), the driver-side bucket twin matches the
    engine expression, and the persisted path equals the scan-side
    bm25_retrieval."""
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        BM25_QUERY,
        TEXT_INDEX_BUCKETS,
        _py_term_bucket,
        _text_index_path,
        bm25_retrieval,
        text_index_roundtrip,
    )

    got = [tuple(r) for r in text_index_roundtrip(spark, sf_smoke).collect()]
    want = [tuple(r) for r in bm25_retrieval(spark, sf_smoke).collect()]
    assert got == want and got

    root = os.path.join(_text_index_path(sf_smoke), "postings")
    cells = [d for d in os.listdir(root) if d.startswith("bucket=")]
    assert cells, root
    assert all(0 <= int(c.split("=")[1]) < TEXT_INDEX_BUCKETS for c in cells)

    # driver-side bucket twin == engine bucket (pinned on the stored rows)
    post = spark.read.parquet(root)
    sample = post.select("term", "bucket").limit(200).collect()
    for r in sample:
        assert _py_term_bucket(r["term"]) == r["bucket"]

    # the probe's scan must prune to the query terms' buckets
    q_buckets = sorted({_py_term_bucket(t) for t in BM25_QUERY})
    pruned = post.where(F.col("bucket").isin(q_buckets))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_hll_accuracy_and_merge_property(spark, sf_smoke):
    """The estimate must sit within ~3 sigma of exact (1.04/sqrt(256)
    ~ 6.5% per sigma), and the register summary must merge by
    per-register MAX: registers(A union B) == max-merge(registers(A),
    registers(B)) — the property that makes HLL shardable."""
    import collections
    import hashlib

    from automated_dow30_earnings_reports_spark.operators.sketches import (
        HLL_M,
        HLL_P,
        HLL_RANK_BITS,
        hll_distinct_users,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    for r in hll_distinct_users(spark, sf_smoke).collect():
        assert r["rel_err"] < 0.2, r

    # merge property, pinned with a from-scratch Python HLL
    ev = load_table(spark, sf_smoke, "events").select("event_type", "user_id")
    users = [r["user_id"] for r in ev.where(F.col("event_type") == "click").distinct().collect()]
    half = len(users) // 2

    def regs(us):
        m = collections.defaultdict(int)
        for u in us:
            dg = int(hashlib.md5(str(u).encode()).hexdigest()[:7], 16)
            reg, w = dg & (HLL_M - 1), dg >> HLL_P
            # rank = 21 - len(bin(w)) for w>0
            rank = (HLL_RANK_BITS + 1) - w.bit_length() if w > 0 else HLL_RANK_BITS + 1
            m[reg] = max(m[reg], rank)
        return dict(m)

    a, b, whole = regs(users[:half]), regs(users[half:]), regs(users)
    merged = {k: max(a.get(k, 0), b.get(k, 0)) for k in set(a) | set(b)}
    assert merged == whole
    assert len(whole) <= HLL_M


def test_bootstrap_ci_brackets_mean_and_weights_are_poisson(spark, sf_smoke):
    """CI must bracket the point mean; the deterministic replicate
    weights must match a from-scratch Python draw and average ~1
    (Poisson(1)), which is what makes the resample unbiased."""
    import hashlib

    from automated_dow30_earnings_reports_spark.operators.sketches import (
        _POIS_TH,
        bootstrap_ci_mean,
    )

    rows = bootstrap_ci_mean(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r["ci_lo"] <= r["mean_value"] <= r["ci_hi"], r
        assert r["ci_hi"] - r["ci_lo"] > 0

    def py_w(eid, b):
        dg = int(hashlib.md5(f"{eid}:{b}".encode()).hexdigest()[:7], 16)
        for k, t in _POIS_TH:
            if dg < t:
                return k
        return 8

    ws = [py_w(eid, b) for eid in range(200) for b in range(16)]
    assert abs(sum(ws) / len(ws) - 1.0) < 0.1  # Poisson(1) mean
