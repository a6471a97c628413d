"""Round-7 operator tests: the text index's forget verb
(text_index_delete) and the shared affected-partition rewrite it rides
on (sources/parquet_lake.py rewrite_affected_partitions)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "test_round7",
)


# ---------------------------------------------------------------------------
# text_index_delete
# ---------------------------------------------------------------------------


def test_text_index_delete_equals_from_scratch_rebuild(spark, sf_smoke):
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        TEXT_DELETE_PRED,
        _search_text_index,
        _text_index_path,
        _write_text_index,
        text_index_delete,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    got = [tuple(r) for r in text_index_delete(spark, sf_smoke).collect()]

    # from-scratch rebuild over the survivors is the ground truth for
    # EVERY score term (df and avgdl shift for all docs on any delete)
    d = load_table(spark, sf_smoke, "documents")
    rebuild_path = _text_index_path(sf_smoke) + "_delete_rebuild"
    _write_text_index(d.where(~F.expr(TEXT_DELETE_PRED)), rebuild_path, "overwrite")
    expected = [tuple(r) for r in _search_text_index(spark, rebuild_path).collect()]
    assert got == expected

    # the victims are erased from every table and the merged stats
    # partials equal the rebuild's integers exactly
    path = _text_index_path(sf_smoke) + "_delete"
    for table in ("postings", "docstats"):
        tbl = spark.read.parquet(os.path.join(path, table))
        assert tbl.where(F.expr(TEXT_DELETE_PRED)).count() == 0

    def merged_stats(p):
        row = (
            spark.read.parquet(os.path.join(p, "stats"))
            .agg(F.sum("n_docs").alias("n"), F.sum("sum_dl").alias("s"))
            .collect()[0]
        )
        return (row["n"], row["s"])

    assert merged_stats(path) == merged_stats(rebuild_path)
    # the delete path keeps the build partial + one negative partial
    assert spark.read.parquet(os.path.join(path, "stats")).count() == 2


def test_text_index_delete_rewrites_only_affected_buckets(spark):
    """Synthetic corpus with per-doc terms pinned to known md5 buckets:
    deleting one doc must leave every bucket it never touched
    byte-untouched (identical part-file listing) and rewrite or drop
    only its own buckets."""
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        _delete_from_text_index,
        _py_term_bucket,
        _write_text_index,
    )

    # pick three words in three DISTINCT buckets
    words: dict[int, str] = {}
    i = 0
    while len(words) < 3 and i < 500:
        w = f"w{i}"
        b = _py_term_bucket(w)
        words.setdefault(b, w)
        i += 1
    (b1, w1), (b2, w2), (b3, w3) = sorted(words.items())[:3]

    docs = spark.createDataFrame(
        [
            (1, f"{w1} {w1} {w1}"),  # victim: only bucket b1
            (2, f"{w2} {w2}"),
            (3, f"{w3}"),
        ],
        "doc_id bigint, text string",
    )
    path = os.path.join(SCRATCH, "bucket_surgery")
    shutil.rmtree(path, ignore_errors=True)
    _write_text_index(docs, path, "overwrite")

    def listing(bucket):
        p = os.path.join(path, "postings", f"bucket={bucket}")
        return sorted(os.listdir(p)) if os.path.isdir(p) else None

    before = {b: listing(b) for b in (b1, b2, b3)}
    assert before[b1] and before[b2] and before[b3]

    victims = docs.where(F.col("doc_id") == 1).select("doc_id")
    _delete_from_text_index(spark, path, victims)

    # untouched buckets keep their exact part files; the victim's
    # bucket (now empty of survivors) is dropped at the directory level
    assert listing(b2) == before[b2]
    assert listing(b3) == before[b3]
    assert listing(b1) is None

    # stats fold to (2 docs, 3 tokens); docstats lost exactly doc 1
    stats = (
        spark.read.parquet(os.path.join(path, "stats"))
        .agg(F.sum("n_docs").alias("n"), F.sum("sum_dl").alias("s"))
        .collect()[0]
    )
    assert (stats["n"], stats["s"]) == (2, 3)
    left = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(path, "docstats")).collect()
    }
    assert left == {2, 3}


def test_rewrite_affected_partitions_noop_on_unmatched_victims(spark):
    """A forget request that matches nothing must not touch the table."""
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        rewrite_affected_partitions,
        write_partitioned,
    )

    path = os.path.join(SCRATCH, "noop_rewrite")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("p")
    )
    write_partitioned(df, path, ["p"], dynamic=False)

    def full_listing():
        out = []
        for dirpath, _, files in os.walk(path):
            for f in sorted(files):
                out.append(os.path.join(os.path.relpath(dirpath, path), f))
        return sorted(out)

    before = full_listing()
    victims = spark.createDataFrame([(999,)], "k bigint")
    rewrite_affected_partitions(spark, path, "p", victims, "k")
    assert full_listing() == before


# ---------------------------------------------------------------------------
# streaming ingest: exactly-once recovery from a crash MID-PUBLISH
# (the r6 ADVICE inversion: an anti-join keyed on the first-written
# data table made a half-committed batch look ingested, permanently
# dropping the other tables' rows)
# ---------------------------------------------------------------------------


def test_streaming_text_ingest_recovers_from_crashed_publish(
    spark, sf_smoke, tmp_path
):
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        _search_text_index,
        _write_text_index,
        bm25_retrieval,
    )
    from automated_dow30_earnings_reports_spark.sources.kv_datasource import register
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        publish_staged_batch,
    )
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
    base = d.where(F.col("doc_id") < n // 2)
    batch = d.where(F.col("doc_id") >= n // 2)
    _write_text_index(base, index_path, "overwrite")
    batch.select("doc_id").write.format("kvlinks").option("path", landing).mode(
        "append"
    ).save()

    # --- simulate attempt 1 of batch 0 crashing after the FIRST table
    # published: docstats rows for the whole batch are live, postings
    # and the stats partial never made it, no ledger entry ---
    staging = os.path.join(index_path, ".staging", "batch-0")
    _write_text_index(batch, staging, "overwrite")
    publish_staged_batch(staging, index_path, ("docstats",), 0)
    ds_partial = spark.read.parquet(os.path.join(index_path, "docstats"))
    assert ds_partial.count() == n  # the half-committed state is live
    assert spark.read.parquet(os.path.join(index_path, "stats")).count() == 1

    # --- the real stream replays batch 0 against the same landing ---
    q = start_text_ingest_stream(spark, landing, index_path, ckpt, d)
    assert q.awaitTermination(180)

    ds = spark.read.parquet(os.path.join(index_path, "docstats"))
    assert ds.count() == n
    assert ds.groupBy("doc_id").count().where(F.col("count") > 1).count() == 0
    post = spark.read.parquet(os.path.join(index_path, "postings"))
    assert (
        post.groupBy("term", "doc_id").count().where(F.col("count") > 1).count() == 0
    )
    # the batch's postings DID land (the old code dropped them forever)
    assert post.where(F.col("doc_id") >= n // 2).count() > 0
    # two stats partials (base + batch), and the search equals the scan
    assert spark.read.parquet(os.path.join(index_path, "stats")).count() == 2
    got = [tuple(r) for r in _search_text_index(spark, index_path).collect()]
    scan = [tuple(r) for r in bm25_retrieval(spark, sf_smoke).collect()]
    assert got == scan


def test_streaming_dedup_ingest_recovers_from_crashed_publish(
    spark, sf_smoke, tmp_path
):
    from automated_dow30_earnings_reports_spark.operators.dedup import (
        _build_signature_index,
        _probe_signature_index,
        _shingle_hashes_of,
        dedup_incremental_index,
    )
    from automated_dow30_earnings_reports_spark.sources.kv_datasource import register
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        publish_staged_batch,
    )
    from automated_dow30_earnings_reports_spark.streaming.incremental import (
        start_dedup_ingest_stream,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    register(spark)
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    index_path = str(tmp_path / "index")

    docs = (
        load_table(spark, sf_smoke, "documents")
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    is_new = F.col("doc_id") % 5 == 4
    shd_old = _shingle_hashes_of(docs.where(~is_new)).localCheckpoint(eager=True)
    _build_signature_index(shd_old, index_path)
    docs.where(is_new).select("doc_id").write.format("kvlinks").option(
        "path", landing
    ).mode("append").save()

    # crash after only the bands table of batch 0 published
    shd_new = _shingle_hashes_of(docs.where(is_new)).localCheckpoint(eager=True)
    staging = os.path.join(index_path, ".staging", "batch-0")
    _build_signature_index(shd_new, staging)
    publish_staged_batch(staging, index_path, ("bands",), 0)

    q = start_dedup_ingest_stream(spark, landing, index_path, ckpt, docs)
    assert q.awaitTermination(180)

    bands = spark.read.parquet(os.path.join(index_path, "bands"))
    dup_bands = (
        bands.groupBy("doc_id", "band_id", "band_key")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dup_bands == 0
    # shd/sizes DID land for the batch (the old code dropped them)
    shd = spark.read.parquet(os.path.join(index_path, "shd"))
    assert shd.where(is_new).count() > 0
    got = [
        tuple(r) for r in _probe_signature_index(spark, index_path, is_new).collect()
    ]
    expected = [tuple(r) for r in dedup_incremental_index(spark, sf_smoke).collect()]
    assert got == expected


def test_text_index_merge_on_read_equals_compacted_delete(spark, sf_smoke):
    """The two forget read paths — tombstone merge-on-read and
    post-compaction — must return identical rows (the ivf_index_delete
    cross-check applied to the text index)."""
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        text_index_delete,
        text_index_delete_mor,
    )

    mor = [tuple(r) for r in text_index_delete_mor(spark, sf_smoke).collect()]
    compacted = [tuple(r) for r in text_index_delete(spark, sf_smoke).collect()]
    assert mor == compacted and mor


def test_text_index_crud_final_state_and_partials(spark, sf_smoke):
    """The composed lifecycle's stats table must hold exactly 4
    partials (build + append + negative delete + append) whose sums
    equal a from-scratch rebuild over the final survivor set, and
    gen-2 docs matching the forget predicate must be RETAINED."""
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        TEXT_DELETE_PRED,
        _search_text_index,
        _text_index_path,
        _write_text_index,
        text_index_crud_lifecycle,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    got = [tuple(r) for r in text_index_crud_lifecycle(spark, sf_smoke).collect()]

    d = load_table(spark, sf_smoke, "documents")
    survivors = d.where(~(F.expr(TEXT_DELETE_PRED) & (F.col("doc_id") % 3 < 2)))
    rebuild_path = _text_index_path(sf_smoke) + "_crud_rebuild"
    _write_text_index(survivors, rebuild_path, "overwrite")
    expected = [tuple(r) for r in _search_text_index(spark, rebuild_path).collect()]
    assert got == expected and got

    path = _text_index_path(sf_smoke) + "_crud"
    stats = spark.read.parquet(os.path.join(path, "stats"))
    assert stats.count() == 4

    ds = spark.read.parquet(os.path.join(path, "docstats"))
    retained = ds.where(F.expr(TEXT_DELETE_PRED) & (F.col("doc_id") % 3 == 2))
    assert retained.count() > 0  # delete must not tombstone future appends
    purged = ds.where(F.expr(TEXT_DELETE_PRED) & (F.col("doc_id") % 3 < 2))
    assert purged.count() == 0


def test_ivf_crud_retains_post_delete_appends(spark, sf_smoke):
    """Gen-2 vectors matching the forget predicate must survive the
    earlier compaction, and no gen-0/1 victim may linger."""
    from automated_dow30_earnings_reports_spark.operators.similarity import (
        IVF_CRUD_DEAD,
        _index_path,
        ivf_index_crud_lifecycle,
    )

    rows = [tuple(r) for r in ivf_index_crud_lifecycle(spark, sf_smoke).collect()]
    assert rows
    post = spark.read.parquet(
        os.path.join(_index_path(sf_smoke, "_crud"), "postings")
    )
    assert post.where(F.expr(IVF_CRUD_DEAD)).count() == 0
    retained = post.where(
        F.expr("vec_id % 7 = 3") & (F.col("vec_id") % 3 == 2)
    )
    assert retained.count() > 0


def test_dedup_crud_matches_single_verb_purge(spark, sf_smoke):
    """Purge-mid-ingest must converge to the same probe as the
    purge-last ordering (dedup_index_purge) — same oracle, different
    verb order."""
    from automated_dow30_earnings_reports_spark.operators.dedup import (
        PURGE_PRED_SQL,
        _dedup_index_path,
        dedup_index_crud_lifecycle,
        dedup_index_purge,
    )

    crud = [tuple(r) for r in dedup_index_crud_lifecycle(spark, sf_smoke).collect()]
    single = [tuple(r) for r in dedup_index_purge(spark, sf_smoke).collect()]
    assert crud == single and crud
    # purged OLD docs gone from every table; NEW docs matching the
    # pattern (appended after the purge) retained
    path = _dedup_index_path(sf_smoke) + "_crud"
    old_purged = F.expr(PURGE_PRED_SQL) & ~(F.col("doc_id") % 5 == 4)
    new_kept = F.expr(PURGE_PRED_SQL) & (F.col("doc_id") % 5 == 4)
    for table in ("bands", "shd", "sizes"):
        tbl = spark.read.parquet(os.path.join(path, table))
        assert tbl.where(old_purged).count() == 0
        assert tbl.where(new_kept).count() > 0


def test_publish_staged_batch_is_idempotent_per_batch_id(spark):
    """Republishing the same batch id must scrub the previous attempt's
    files (no duplicate rows), even when the retry stages a DIFFERENT
    file layout; distinct batch ids coexist."""
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        publish_staged_batch,
    )

    live = os.path.join(SCRATCH, "publish_live")
    shutil.rmtree(live, ignore_errors=True)

    def stage(n_files, lo, hi):
        staging = os.path.join(SCRATCH, "publish_staging")
        shutil.rmtree(staging, ignore_errors=True)
        spark.range(lo, hi).repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(staging, "t")
        )
        return staging

    # attempt 1 of batch 7: 4 files
    publish_staged_batch(stage(4, 0, 10), live, ("t",), 7)
    # retry of batch 7 (simulated replay): 2 files, same rows
    publish_staged_batch(stage(2, 0, 10), live, ("t",), 7)
    got = sorted(r["id"] for r in spark.read.parquet(os.path.join(live, "t")).collect())
    assert got == list(range(10))  # no duplicates from attempt 1

    # batch 8 lands beside batch 7 (prefix "ingest-7-" must not match it)
    publish_staged_batch(stage(1, 10, 15), live, ("t",), 8)
    got = sorted(r["id"] for r in spark.read.parquet(os.path.join(live, "t")).collect())
    assert got == list(range(15))

    # batch 77's tag must not be scrubbed by a batch-7 replay
    publish_staged_batch(stage(1, 15, 20), live, ("t",), 77)
    publish_staged_batch(stage(3, 0, 10), live, ("t",), 7)
    got = sorted(r["id"] for r in spark.read.parquet(os.path.join(live, "t")).collect())
    assert got == list(range(20))


def test_committed_ledger_bootstrap_excludes_batch_published_files(spark, tmp_path):
    """An index that predates the ledger bootstraps it from BASE files
    only: doc_ids present solely in ingest-<batch>- files (a crashed
    half-published batch) must NOT be marked committed, so the batch
    replays instead of being silently half-dropped."""
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        publish_staged_batch,
    )
    from automated_dow30_earnings_reports_spark.streaming.incremental import (
        _ensure_committed_ledger,
    )

    index = str(tmp_path / "index")
    spark.range(0, 5).select(F.col("id").alias("doc_id")).write.parquet(
        os.path.join(index, "docstats")
    )
    staging = str(tmp_path / "staging")
    spark.range(5, 10).select(F.col("id").alias("doc_id")).write.parquet(
        os.path.join(staging, "docstats")
    )
    publish_staged_batch(staging, index, ("docstats",), 3)

    ledger = _ensure_committed_ledger(spark, index, "docstats")
    got = {r["doc_id"] for r in spark.read.parquet(ledger).collect()}
    assert got == {0, 1, 2, 3, 4}
    # idempotent: a second call must not rebuild or widen the ledger
    assert _ensure_committed_ledger(spark, index, "docstats") == ledger
    got = {r["doc_id"] for r in spark.read.parquet(ledger).collect()}
    assert got == {0, 1, 2, 3, 4}
