"""sf1 scale probe: 10x the bench data, prove ~linear growth.

The sf0.1 bench can't see a hidden quadratic — a bucket/cell/block
bound that only bites at 10x the rows. This script materializes an
sf1-scale dataset (~6M lineitem rows) under .scratch/sf1 by
replicating sf0.1 ten times with per-replica mutations chosen so the
WORKLOAD scales linearly instead of degenerating:

  - documents.text goes through a per-replica bijective vowel
    rotation: within a replica the original near-dup structure is
    preserved exactly (bijective char map => identical shingle
    overlap), across replicas no shingle collides — naive exact
    replication would instead make every doc a 10-way near-dup and
    grow LSH bucket candidates quadratically BY CONSTRUCTION, which
    would measure the synthetic data, not the plan.
  - embeddings rotate by k positions (norm- and distribution-
    preserving, neighbors change per replica); vec_id offsets.
  - star-schema keys offset by k * (max_key + 1) consistently across
    fact/dim so joins keep their selectivity; nation/region stay
    fixed (dims don't scale with corpus size).
  - events offset event_id/user_id; value untouched (sketch input).

Then it times the slowest dedup/ANN/sketch/TPC-H headline queries at
sf0.1 and sf1 (min of 2 runs each, same session) and prints a
markdown table of wall-clock ratio vs the 10x data ratio. A plan is
scale-safe when ratio <~ 10 (sublinear ratios are common at this
size: fixed per-query overhead amortizes).

Usage: python scripts/sf1_probe.py [--regen] [--sf2] [--index-search]
       [--index-verbs] [name-substring ...]

--sf2 adds a third column at 20 replicas (a second decade) for the
ratio-trend adjudication of claimed data-driven superlinear rows;
--index-verbs times ONLY the index-maintenance verbs (delete/purge/
compact/recluster) with their builds untimed, proving maintenance cost
tracks the request/fragment footprint rather than index size.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1"
)
REPLICAS = 10
# --sf2: a SECOND decade of scale (20 replicas) for the adjudicated
# superlinear rows — a ratio that keeps accelerating sf1→sf2 is a plan
# problem; one that flattens toward 2x is the claimed data-driven cost.
SF2 = os.path.join(os.path.dirname(SF1), "sf2")
REPLICAS2 = 20

# The families VERDICT r3 asked to probe: dedup, ANN, sketches, plus
# the heaviest relational shapes. Scratch-writing and effectful
# queries are excluded (they measure the sink, not the operator).
PROBE = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_ngram_dfcap",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_exact",
    "similarity_ann_lsh_buckets",
    "similarity_ann_ivf_kmeans",
    "similarity_pq_adc",
    "kmv_distinct_orders",
    "quantile_sketch_events",
    "cms_heavy_hitters",
    "q9_product_profit",
    "q19_disjunctive_revenue",
    # r4 additions with non-trivial fan-out characteristics
    "repeated_ngram_spans",
    "chunk_dedup_reconstruct",
    "co_occurrence_part_pairs",
    "triangle_count_cosupply",
    "session_stats_batch",
    "rolling_7d_distinct_users",
    "snapshot_diff_cdc",
    "q2_min_cost_supplier",
    # r4-tail + r5 additions (VERDICT r4 task 5). schema_evolution_read
    # and reports_http_filter are scratch-writing → excluded by policy.
    "bm25_retrieval",
    "file_skipping_stats",
    "multimodal_audio_fingerprint",
    "orderkey_islands",
    # r5 additions (scratch-writing reports_http_filter, dpp_partitioned_join
    # and schema_evolution_read stay excluded by the standing policy)
    "mv_incremental_refresh",
    "merge_on_read_deletes",
    "table_fingerprint",
    "interval_overlap_join",
    "skyline_price_date",
    "cluster_aware_split",
    "knn_classify_centroid",
    "phrase_search_postings",
    "supplier_hops_bfs",
    "k_anonymity_audit",
    "stratified_fixed_k",
    "winsorize_values",
    # r6 additions (the scratch-writing lifecycle queries —
    # dedup_incremental_index, ivf_index_recluster, ivf_index_delete,
    # ivf_index_stats, streaming_*_ingest — are excluded by the
    # standing policy; their search/probe hot paths are covered by
    # --index-search below and by the dedup/ANN family rows)
    "quality_classifier_linear",
    "bpe_train_merges",
    "bpe_encode_stats",
    "hard_negative_mining",
    "chunk_overlap_windows",
    "embedding_matryoshka_recall",
    # r6 second wave (text_index_roundtrip is scratch-writing → excluded)
    "char_entropy_filter",
    "mv_join_delta_refresh",
    "join_cardinality_estimate",
    "bigram_interpolated_logprob",
    "zipf_law_fit",
    "quality_score_calibration",
    "embedding_top_pc",
    "hll_distinct_users",
    "bootstrap_ci_mean",
    "roc_auc_binned",
    "cohen_kappa_gates",
    "psi_feature_drift",
    "hybrid_rrf_fusion",
    "mmr_diversified_topk",
    "dedup_lsh_quality",
    "ann_ndcg_at_k",
    "clustering_coefficient",
    "seasonal_hour_anomaly",
    "embedding_drift_centroid",
    "recursive_cte_reachability",
    "variant_props_stats",
    "sql_udf_len_band",
    "prf_query_expansion",
    "value_trend_grouped_pandas",
    "ps_api_doc_stats",
    "cache_table_reuse",
    # r8 plan-fix sweep: the checkpointed forms must stay linear at 10x
    # (an eager localCheckpoint is a materialization — the probe proves
    # the materialized grain scales with its claimed bound, not worse)
    "funnel_conversion",
    "gdpr_purge_report",
    "dq_constraint_report",
    "similarity_ann_ivf",
    "similarity_ann_ivf_probe2",
    "tfidf_top_terms",
    "q18_large_orders",
]

VOWELS = "aeiou"
# 7 consonants: composed with the 5 vowel rotations this yields 35
# distinct bijective char maps, so NO two replicas share a map even at
# 20 replicas (--sf2). The original 5-rotation scheme silently reused
# maps from replica 5 on, making replicas k and k+5 exact cross-replica
# duplicates — inflating the dedup families' sf1 workload beyond the
# intended linear scaling.
CONS = "bcdfjkm"


def _generate(spark, target: str = SF1, replicas: int = REPLICAS) -> None:
    from pyspark.sql import functions as F

    os.makedirs(target, exist_ok=True)

    def reps(df, build):
        out = None
        for k in range(replicas):
            part = build(df, k)
            out = part if out is None else out.unionByName(part)
        return out

    # documents: bijective per-replica vowel rotation + doc_id offset
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    n_docs = 5000

    def doc_rep(df, k):
        rot = VOWELS[k % 5 :] + VOWELS[: k % 5]
        c = (k // 5) % 7
        crot = CONS[c:] + CONS[:c]
        return df.select(
            (F.col("doc_id") + k * n_docs).alias("doc_id"),
            F.translate(F.col("text"), VOWELS + CONS, rot + crot).alias("text"),
            "lang",
            F.concat(F.col("source"), F.lit(f"_r{k}")).alias("source"),
            "n_chars",
        )

    reps(docs, doc_rep).repartition(8).write.mode("overwrite").parquet(
        f"{target}/documents.parquet"
    )

    # embeddings: rotate the vector by k, offset vec_id
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    n_emb = 2000

    def emb_rep(df, k):
        if k == 0:
            vec = F.col("embedding")
        else:
            vec = F.concat(
                F.slice(F.col("embedding"), k + 1, 10_000),
                F.slice(F.col("embedding"), 1, k),
            )
        return df.select(
            (F.col("vec_id") + k * n_emb).alias("vec_id"),
            vec.alias("embedding"),
            "label",
        )

    reps(emb, emb_rep).repartition(8).write.mode("overwrite").parquet(
        f"{target}/embeddings.parquet"
    )

    # events: offset ids, keep ts/value/type distributions
    ev = spark.read.parquet(f"{SF01}/events.parquet")
    n_ev, n_users = 100_000, 10_000

    def ev_rep(df, k):
        return df.select(
            (F.col("event_id") + k * n_ev).alias("event_id"),
            "ts",
            (F.col("user_id") + k * n_users).alias("user_id"),
            "event_type",
            "value",
            "props",
        )

    reps(ev, ev_rep).repartition(8).write.mode("overwrite").parquet(
        f"{target}/events.parquet"
    )

    # star schema: offset every key by k * (max+1), consistently
    offsets = {
        "orderkey": 150_000,
        "custkey": 15_000,
        "partkey": 20_000,
        "suppkey": 1_000,
    }
    li = spark.read.parquet(f"{SF01}/lineitem.parquet")

    def li_rep(df, k):
        return df.withColumns(
            {
                "l_orderkey": F.col("l_orderkey") + k * offsets["orderkey"],
                "l_partkey": F.col("l_partkey") + k * offsets["partkey"],
                "l_suppkey": F.col("l_suppkey") + k * offsets["suppkey"],
            }
        )

    reps(li, li_rep).repartition(16).write.mode("overwrite").parquet(
        f"{target}/lineitem.parquet"
    )

    orders = spark.read.parquet(f"{SF01}/orders.parquet")

    def o_rep(df, k):
        return df.withColumns(
            {
                "o_orderkey": F.col("o_orderkey") + k * offsets["orderkey"],
                "o_custkey": F.col("o_custkey") + k * offsets["custkey"],
            }
        )

    reps(orders, o_rep).repartition(8).write.mode("overwrite").parquet(
        f"{target}/orders.parquet"
    )

    cust = spark.read.parquet(f"{SF01}/customer.parquet")

    def c_rep(df, k):
        return df.withColumn("c_custkey", F.col("c_custkey") + k * offsets["custkey"])

    reps(cust, c_rep).repartition(4).write.mode("overwrite").parquet(
        f"{target}/customer.parquet"
    )

    part = spark.read.parquet(f"{SF01}/part.parquet")

    def p_rep(df, k):
        return df.withColumn("p_partkey", F.col("p_partkey") + k * offsets["partkey"])

    reps(part, p_rep).repartition(4).write.mode("overwrite").parquet(
        f"{target}/part.parquet"
    )

    supp = spark.read.parquet(f"{SF01}/supplier.parquet")

    def s_rep(df, k):
        return df.withColumn("s_suppkey", F.col("s_suppkey") + k * offsets["suppkey"])

    reps(supp, s_rep).repartition(2).write.mode("overwrite").parquet(
        f"{target}/supplier.parquet"
    )

    # dims: copy through unchanged
    for dim in ("nation", "region"):
        spark.read.parquet(f"{SF01}/{dim}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{target}/{dim}.parquet")


def _time_index_search(spark, sf_dir: str) -> float:
    """Search-only wall clock over a PRE-BUILT persisted IVF index:
    the loaded-index hot path (similarity._search_index) with the
    build amortized away — the standing scratch-writer exclusion is
    right for the build phase, but search is what runs per query
    batch in production, so it gets its own probe row."""
    from automated_dow30_earnings_reports_spark.operators.similarity import (
        _emb,
        _index_path,
        _query_vectors,
        _search_index,
        ivf_index_roundtrip,
    )

    path = _index_path(sf_dir, "")
    # rebuild unconditionally (untimed): a stale pre-existing index —
    # older data generation or layout — would make the timed search row
    # measure the wrong artifact
    ivf_index_roundtrip(spark, sf_dir).collect()
    qvec = _query_vectors(_emb(spark, sf_dir))
    best = None
    for _ in range(2):
        t0 = time.time()
        cents = spark.read.parquet(os.path.join(path, "centroids"))
        postings = spark.read.parquet(os.path.join(path, "postings"))
        _search_index(postings, cents, qvec).collect()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    return best


def _time_text_index_search(spark, sf_dir: str) -> float:
    """Search-only wall clock over a PRE-BUILT persisted text index —
    the bucket-pruned BM25 read (_search_text_index) with the build
    amortized away, the ivf_index_search treatment for the third index
    family."""
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        _search_text_index,
        _text_index_path,
        text_index_roundtrip,
    )

    # rebuild unconditionally (untimed): stale layouts must not be timed
    text_index_roundtrip(spark, sf_dir).collect()
    path = _text_index_path(sf_dir)
    best = None
    for _ in range(2):
        t0 = time.time()
        _search_text_index(spark, path).collect()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    return best


def _time_text_index_mor_search(spark, sf_dir: str) -> float:
    """Search-only wall clock over a pre-built text index with a
    STANDING tombstone set (merge_tombstones=True) — the read-time
    anti-join + stats fold every query pays between a merge-on-read
    forget and the next compaction. Compared against the plain
    text_index_search row: the delta must be tombstone-sized (a
    broadcast anti-join over the pruned buckets + a K-row stats
    adjustment), never corpus-sized."""
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        TEXT_DELETE_PRED,
        _search_text_index,
        _text_index_path,
        _write_text_index,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    path = _text_index_path(sf_dir) + "_morprobe"
    # rebuild unconditionally (untimed): stale layouts must not be timed
    _write_text_index(d, path, "overwrite")
    d.where(F.expr(TEXT_DELETE_PRED)).select("doc_id").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "tombstones"))
    best = None
    for _ in range(2):
        t0 = time.time()
        _search_text_index(spark, path, merge_tombstones=True).collect()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    return best


def _time_ledger_bootstrap(spark, sf_dir: str) -> float:
    """One-time cost of adopting a pre-ledger index for streaming
    ingest (_ensure_committed_ledger): a driver-side walk of the base
    table's files + one distinct over its keys. Probed against a
    FRAGMENTED index (base build + three appends -> 4x the docstats
    files) so the row reflects the worst realistic file count; the
    claim under test is that this is index-sized ONCE at stream start,
    never per batch."""
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        _text_index_path,
        _write_text_index,
    )
    from automated_dow30_earnings_reports_spark.streaming.incremental import (
        _ensure_committed_ledger,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    path = _text_index_path(sf_dir) + "_ledgerprobe"
    gen = F.col("doc_id") % 4
    _write_text_index(d.where(gen == 0), path, "overwrite")
    for g in (1, 2, 3):
        _write_text_index(d.where(gen == g), path, "append")
    best = None
    for _ in range(2):
        shutil.rmtree(os.path.join(path, "committed"), ignore_errors=True)
        t0 = time.time()
        _ensure_committed_ledger(spark, path, "docstats")
        el = time.time() - t0
        best = el if best is None else min(best, el)
    return best


def _time_ttl_enforce(spark, fresh_rows_per_year: int) -> float:
    """TTL enforcement cost with the RETAINED data scaled and the
    expiring data held constant — the claim under test is the inverse
    of the usual linearity probe: `enforce_ttl` must NOT get slower as
    the lake's fresh partitions grow, because it never reads them
    (expired partitions unlink at directory level, only the boundary
    partition is rewritten). Expired (1995-97) and boundary (1998)
    partitions are a fixed 30k rows each; fresh (1999-2001) partitions
    carry ``fresh_rows_per_year``. A flat sf-independent time is the
    pass condition."""
    from automated_dow30_earnings_reports_spark.plans.maintenance import enforce_ttl
    from pyspark.sql import functions as F

    path = os.path.join(os.path.dirname(SF1), "ttl_probe")
    best = None
    for _ in range(2):
        shutil.rmtree(path, ignore_errors=True)
        fixed = spark.range(4 * 30_000).select(
            (F.lit(1995) + F.col("id") % 4).cast("int").alias("y"),
            (F.col("id") % 12 + 1).cast("int").alias("month"),
            F.col("id").alias("v"),
        )
        fresh = spark.range(3 * fresh_rows_per_year).select(
            (F.lit(1999) + F.col("id") % 3).cast("int").alias("y"),
            (F.col("id") % 12 + 1).cast("int").alias("month"),
            F.col("id").alias("v"),
        )
        fixed.unionByName(fresh).repartition(F.col("y")).write.partitionBy(
            "y"
        ).parquet(path)
        t0 = time.time()
        enforce_ttl(spark, path, "y", 1998, F.col("month") >= 4)
        el = time.time() - t0
        best = el if best is None else min(best, el)
    shutil.rmtree(path, ignore_errors=True)
    return best


def _time_snapshot_read_with_junk(spark, n_junk_commits: int) -> float:
    """Manifest-pinned snapshot read with a GROWING pile of garbage in
    the data directory — crashed writers' orphan commits the manifests
    never name. The claim under test is time_travel_read's central
    scale property: a reader resolves the version from one manifest
    and scans exactly its files, so read cost must be independent of
    how much junk accumulates beside them (a directory-listing reader
    pays the LIST — the object-store killer — and would also read the
    junk). Flat time across junk counts is the pass condition."""
    from automated_dow30_earnings_reports_spark.plans.maintenance import (
        read_snapshot,
        seal_manifest,
    )
    from pyspark.sql import functions as F

    path = os.path.join(os.path.dirname(SF1), "tt_junk_probe")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(200_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    out = os.path.join(path, "data", "c1")
    df.write.parquet(out)
    files = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    )
    seal_manifest(path, 1, files)
    for j in range(n_junk_commits):
        d = os.path.join(path, "data", f"c-orphan-{j}")
        os.makedirs(d)
        for i in range(20):
            with open(os.path.join(d, f"part-{i:05d}.parquet"), "wb") as fh:
                fh.write(b"\x00" * 4096)  # never opened: content irrelevant
    best = None
    for _ in range(3):
        t0 = time.time()
        read_snapshot(spark, path, 1).agg(F.sum("v")).collect()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    shutil.rmtree(path, ignore_errors=True)
    return best


def _timed_inner(mod, attr, query_fn, spark, sf_dir) -> float:
    """Run ``query_fn`` end-to-end but report ONLY the wall-clock spent
    inside ``mod.attr`` (the maintenance verb) — the build/ingest that
    precedes it stays untimed, the --index-search treatment applied to
    the write-side verbs."""
    orig = getattr(mod, attr)
    holder = {"t": 0.0}

    def wrapper(*a, **k):
        t0 = time.time()
        out = orig(*a, **k)
        holder["t"] += time.time() - t0
        return out

    setattr(mod, attr, wrapper)
    try:
        query_fn(spark, sf_dir).collect()
    finally:
        setattr(mod, attr, orig)
    return holder["t"]


# (label, module, verb attr, registered query that drives it)
MAINTENANCE_VERBS = [
    ("ivf delete compaction", "operators.similarity", "_compact_deletes",
     "ivf_index_delete"),
    ("ivf recluster (Lloyd retrain + rewrite)", "operators.similarity",
     "_recluster_index", "ivf_index_recluster"),
    ("dedup purge (3-table rewrite)", "operators.dedup",
     "_purge_signature_index", "dedup_index_purge"),
    ("text compact (bucket+partial fold)", "operators.textstats",
     "_compact_text_index", "text_index_compact"),
    ("text delete (forget verb)", "operators.textstats",
     "_delete_from_text_index", "text_index_delete"),
]


def _time_maintenance_verbs(spark, qs) -> None:
    import importlib

    print("| maintenance verb (build untimed) | sf0.1 s | sf1 s | ratio (10x data) |")
    print("|---|---|---|---|")
    for label, modname, attr, qname in MAINTENANCE_VERBS:
        mod = importlib.import_module(
            f"automated_dow30_earnings_reports_spark.{modname}"
        )
        ts = {}
        for sf_dir, tag in ((SF01, "small"), (SF1, "big")):
            best = None
            for _ in range(2):
                t = _timed_inner(mod, attr, qs[qname], spark, sf_dir)
                best = t if best is None else min(best, t)
            ts[tag] = best
        print(
            f"| {label} | {ts['small']:.2f} | {ts['big']:.2f} "
            f"| {ts['big'] / ts['small']:.1f}x |"
        )


def main() -> int:
    from automated_dow30_earnings_reports_spark.session import get_spark

    import __spark_entry__ as e

    spark = get_spark("sf1-probe")
    if "--regen" in sys.argv:
        for d in (SF1, SF2):
            if os.path.isdir(d):
                shutil.rmtree(d)
    if not os.path.isdir(os.path.join(SF1, "lineitem.parquet")):
        t0 = time.time()
        _generate(spark)
        print(f"generated {SF1} in {time.time()-t0:.0f}s", file=sys.stderr)

    dirs = [(SF01, "sf0.1"), (SF1, "sf1")]
    if "--sf2" in sys.argv:
        if not os.path.isdir(os.path.join(SF2, "lineitem.parquet")):
            t0 = time.time()
            _generate(spark, SF2, REPLICAS2)
            print(f"generated {SF2} in {time.time()-t0:.0f}s", file=sys.stderr)
        dirs.append((SF2, "sf2"))

    qs = e.queries()
    if "--index-verbs" in sys.argv:
        _time_maintenance_verbs(spark, qs)
        spark.stop()
        return 0

    filters = [a for a in sys.argv[1:] if not a.startswith("--")]
    probe = (
        [n for n in PROBE if any(f in n for f in filters)] if filters else PROBE
    )
    header = " | ".join(f"{tag} s" for _d, tag in dirs)
    ratios = " | ".join(
        f"{dirs[i][1]}/{dirs[i - 1][1]}" for i in range(1, len(dirs))
    )
    print(f"| query | {header} | {ratios} |")
    print("|---|" + "---|" * (len(dirs) + len(dirs) - 1))
    for name in probe:
        times = []
        for sf_dir, _tag in dirs:
            best = None
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, sf_dir).collect()
                el = time.time() - t0
                best = el if best is None else min(best, el)
            times.append(best)
        cells = " | ".join(f"{t:.2f}" for t in times)
        rcells = " | ".join(
            f"{times[i] / times[i - 1]:.1f}x" for i in range(1, len(times))
        )
        print(f"| {name} | {cells} | {rcells} |")
    if not filters or "--index-search" in sys.argv:
        t_small = _time_index_search(spark, SF01)
        t_big = _time_index_search(spark, SF1)
        print(
            f"| ivf_index_search (loaded, build amortized) | {t_small:.2f} "
            f"| {t_big:.2f} | {t_big / t_small:.1f}x |"
        )
        t_small = _time_text_index_search(spark, SF01)
        t_big = _time_text_index_search(spark, SF1)
        print(
            f"| text_index_search (loaded, build amortized) | {t_small:.2f} "
            f"| {t_big:.2f} | {t_big / t_small:.1f}x |"
        )
        t_small = _time_text_index_mor_search(spark, SF01)
        t_big = _time_text_index_mor_search(spark, SF1)
        print(
            f"| text_index_search +standing tombstones (MOR read) | {t_small:.2f} "
            f"| {t_big:.2f} | {t_big / t_small:.1f}x |"
        )
    if "--snapshot-junk" in sys.argv:
        t_clean = _time_snapshot_read_with_junk(spark, 0)
        t_junk = _time_snapshot_read_with_junk(spark, 50)
        print(
            f"| snapshot read (0 vs 50 orphan commits beside the data) | {t_clean:.2f} "
            f"| {t_junk:.2f} | {t_junk / t_clean:.1f}x |"
        )
    if "--ttl" in sys.argv:
        t_small = _time_ttl_enforce(spark, 30_000)
        t_big = _time_ttl_enforce(spark, 300_000)
        print(
            f"| ttl enforce (expired+boundary fixed, retained 10x) | {t_small:.2f} "
            f"| {t_big:.2f} | {t_big / t_small:.1f}x |"
        )
    if not filters or "--ledger-bootstrap" in sys.argv:
        t_small = _time_ledger_bootstrap(spark, SF01)
        t_big = _time_ledger_bootstrap(spark, SF1)
        print(
            f"| ledger bootstrap (fragmented index, one-time) | {t_small:.2f} "
            f"| {t_big:.2f} | {t_big / t_small:.1f}x |"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
