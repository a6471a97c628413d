"""Round-8 pins: publish_staged_batch's idempotency scrub is bounded by
the staged delta's partition footprint (never an O(index) walk of the
live table), the per-batch manifest recovers a crashed attempt's
touched-set, and the committed-ledger seed is atomic (temp + rename)."""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import functions as F

SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "test_round8",
)


def _stage_cells(spark, staging, cells, table="t"):
    """Stage one file per requested cell under staging/<table>/cell=N."""
    shutil.rmtree(staging, ignore_errors=True)
    df = spark.createDataFrame(
        [(c, i) for c in cells for i in range(3)], "cell int, v int"
    )
    df.repartition(*[F.col("cell")]).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(os.path.join(staging, table))
    return staging


def test_publish_scrub_is_bounded_by_staged_partitions(spark, monkeypatch):
    """The scrub must list ONLY the partition directories present in the
    staged delta (plus the manifest's, absent here) — a fragmented live
    index's untouched partitions are never listed, and the live tree is
    never os.walk'd. This pins the O(batch-footprint) claim in the
    docstring: on an object store an O(index-files) recursive listing
    per micro-batch would dominate continuous-ingest latency."""
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        publish_staged_batch,
    )

    live = os.path.join(SCRATCH, "bounded_live")
    shutil.rmtree(live, ignore_errors=True)
    # fragmented live index: 12 partitions, several files each
    base = spark.createDataFrame(
        [(c, i) for c in range(12) for i in range(4)], "cell int, v int"
    )
    base.repartition(8).write.partitionBy("cell").parquet(os.path.join(live, "t"))

    staging = _stage_cells(spark, os.path.join(SCRATCH, "bounded_staging"), [3, 7])

    listed: list[str] = []
    walked: list[str] = []
    real_listdir, real_walk = os.listdir, os.walk

    def spy_listdir(path):
        listed.append(os.path.abspath(str(path)))
        return real_listdir(path)

    def spy_walk(path, **kw):
        walked.append(os.path.abspath(str(path)))
        return real_walk(path, **kw)

    # publish_staged_batch is pure driver-side Python (no Spark calls),
    # so patching the os module for its duration is safe
    monkeypatch.setattr(os, "listdir", spy_listdir)
    monkeypatch.setattr(os, "walk", spy_walk)
    publish_staged_batch(staging, live, ("t",), 5)
    monkeypatch.setattr(os, "listdir", real_listdir)
    monkeypatch.setattr(os, "walk", real_walk)

    touched = {
        os.path.abspath(os.path.join(live, "t", "cell=3")),
        os.path.abspath(os.path.join(live, "t", "cell=7")),
    }
    assert set(listed) <= touched, f"scrub listed untouched dirs: {set(listed) - touched}"
    # the live tree is never walked — only the staged delta is
    stage_abs = os.path.abspath(staging)
    assert all(w.startswith(stage_abs) for w in walked), (
        f"live tree walked: {[w for w in walked if not w.startswith(stage_abs)]}"
    )

    # and the publish itself is correct: new rows landed, old rows kept
    got = spark.read.parquet(os.path.join(live, "t"))
    assert got.count() == 12 * 4 + 2 * 3
    assert got.where("cell = 3").count() == 4 + 3


def test_publish_manifest_recovers_crashed_attempt_partitions(spark):
    """A crashed attempt's manifest widens the scrub: if the replayed
    stage touches FEWER partitions than the crashed attempt managed to
    move into, the manifest (written before any move) still directs the
    scrub at the orphaned partition, so no stale ingest-<id> file
    survives. The manifest is removed once a publish completes."""
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        publish_staged_batch,
    )

    live = os.path.join(SCRATCH, "manifest_live")
    shutil.rmtree(live, ignore_errors=True)
    os.makedirs(os.path.join(live, "t", "cell=3"))
    os.makedirs(os.path.join(live, "t", "cell=7"))

    # simulate attempt 1 of batch 9 crashing mid-move: it moved one file
    # into cell=7 and left its manifest behind
    with open(os.path.join(live, "t", "cell=7", "ingest-9-0.parquet"), "wb") as fh:
        fh.write(b"partial attempt")
    with open(os.path.join(live, ".publish-manifest-9.json"), "w") as fh:
        json.dump({"t": ["cell=3", "cell=7"]}, fh)

    # the replayed stage only touches cell=3 (narrower than attempt 1)
    staging = _stage_cells(spark, os.path.join(SCRATCH, "manifest_staging"), [3])
    publish_staged_batch(staging, live, ("t",), 9)

    # the orphan in cell=7 was scrubbed via the manifest
    assert os.listdir(os.path.join(live, "t", "cell=7")) == []
    got = spark.read.parquet(os.path.join(live, "t", "cell=3"))
    assert got.count() == 3
    # completed publish removes its manifest
    assert not os.path.exists(os.path.join(live, ".publish-manifest-9.json"))


def test_dedup_mor_probe_equals_compacted_purge(spark, sf_smoke):
    """Both forget phases of the signature index must answer the
    standing probe identically: the merge-on-read read (tombstones
    anti-joined at query time, index untouched) and the compacted read
    (bucket partitions rewritten). The MOR path must also leave every
    index table byte-identical to the pre-delete build."""
    import __spark_entry__ as e

    qs = e.queries()
    mor = [tuple(r) for r in qs["dedup_index_purge_mor"](spark, sf_smoke).collect()]
    compacted = [
        tuple(r) for r in qs["dedup_index_purge"](spark, sf_smoke).collect()
    ]
    assert mor == compacted
    # the request path wrote only the tombstone table: victims' rows
    # are still physically present in the MOR index
    from automated_dow30_earnings_reports_spark.operators.dedup import (
        PURGE_PRED_SQL,
        _dedup_index_path,
    )

    path = _dedup_index_path(sf_smoke) + "_mor"
    for table in ("bands", "shd", "sizes"):
        tbl = spark.read.parquet(os.path.join(path, table))
        assert tbl.where(F.expr(PURGE_PRED_SQL)).count() > 0


def test_text_mor_compact_retires_tombstones(spark, sf_smoke):
    """Compaction must consume the tombstone table: after
    text_index_mor_compact the tombstones directory is gone, the plain
    read path answers without it, and the result equals the eager
    delete path's (text_index_delete) — the three forget phases (MOR
    read, eager delete, tombstone-folding compaction) converge."""
    import __spark_entry__ as e

    from automated_dow30_earnings_reports_spark.operators.textstats import (
        TEXT_DELETE_PRED,
        _text_index_path,
    )

    qs = e.queries()
    got = [tuple(r) for r in qs["text_index_mor_compact"](spark, sf_smoke).collect()]
    eager = [tuple(r) for r in qs["text_index_delete"](spark, sf_smoke).collect()]
    assert got == eager

    path = _text_index_path(sf_smoke) + "_morcompact"
    assert not os.path.exists(os.path.join(path, "tombstones"))
    for table in ("postings", "docstats"):
        tbl = spark.read.parquet(os.path.join(path, table))
        assert tbl.where(F.expr(TEXT_DELETE_PRED)).count() == 0


def test_vacuum_is_a_noop_on_a_clean_index(spark, tmp_path):
    """rollback_orphan_publishes on an index with no crashed state must
    report zeros and leave the tables untouched; a completed publish's
    files are never scrubbed (its manifest is gone)."""
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        publish_staged_batch,
        rollback_orphan_publishes,
    )

    live = str(tmp_path / "idx")
    staging = str(tmp_path / "staging")
    spark.range(0, 8).selectExpr("id AS doc_id").write.parquet(
        os.path.join(live, "t")
    )
    spark.range(8, 12).selectExpr("id AS doc_id").write.parquet(
        os.path.join(staging, "t")
    )
    publish_staged_batch(staging, live, ("t",), 4)

    report = rollback_orphan_publishes(live)
    assert report == {
        "rolled_back_batches": 0,
        "scrubbed_files": 0,
        "scratch_dirs": 0,
        "young_spared": 0,
        "tmp_files_removed": 0,
    }
    got = {r["doc_id"] for r in spark.read.parquet(os.path.join(live, "t")).collect()}
    assert got == set(range(12))


def test_recluster_if_skewed_is_a_noop_on_healthy_index(spark, sf_smoke, tmp_path):
    """The reusable maintenance verb must treat 'index not skewed' as a
    legitimate no-maintenance state — return (False, skew) and leave
    the index byte-untouched — not an error (only the registered
    benchmark query asserts the gate fires, because ITS oracle
    re-clusters unconditionally). On a drifted index it reclusters and
    reports True."""
    from automated_dow30_earnings_reports_spark.operators.similarity import (
        RECLUSTER_SKEW_THRESHOLD,
        _drifted_corpus,
        _emb,
        recluster_if_skewed,
    )
    from tests.test_round6_ops import _build_and_append

    # healthy: natural corpus, no drift
    path = str(tmp_path / "healthy")
    corpus = _emb(spark, sf_smoke).localCheckpoint(eager=True)
    _build_and_append(spark, sf_smoke, path, corpus)

    def listing(sub):
        out = []
        for dp, _dirs, files in os.walk(os.path.join(path, sub)):
            out += [os.path.join(dp, f) for f in sorted(files)]
        return sorted(out)

    before = (listing("centroids"), listing("postings"))
    reclustered, skew = recluster_if_skewed(spark, path)
    assert reclustered is False
    assert skew < RECLUSTER_SKEW_THRESHOLD
    assert (listing("centroids"), listing("postings")) == before

    # drifted: the verb reclusters and says so
    path2 = str(tmp_path / "drifted")
    corpus2 = _drifted_corpus(_emb(spark, sf_smoke)).localCheckpoint(eager=True)
    _build_and_append(spark, sf_smoke, path2, corpus2)
    reclustered2, skew2 = recluster_if_skewed(spark, path2)
    assert reclustered2 is True
    assert skew2 >= RECLUSTER_SKEW_THRESHOLD


def test_stream_recovers_from_crash_between_publish_and_ledger(
    spark, sf_smoke, tmp_path
):
    """The last crash window in the commit protocol: the batch's delta
    is FULLY published (all tables, manifest retired) but the process
    dies before the ledger append. The replay's anti-join sees the keys
    as uncommitted and re-publishes the whole batch — the scrub must
    swallow the previous complete publish so nothing duplicates, and
    the ledger finally records the batch."""
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

    # attempt 1 of batch 0: publish COMPLETES across all three tables,
    # then the crash lands before the ledger append
    staging = os.path.join(index_path, ".staging", "batch-0")
    _write_text_index(batch, staging, "overwrite")
    publish_staged_batch(
        staging, index_path, ("docstats", "stats", "postings"), 0
    )
    assert spark.read.parquet(os.path.join(index_path, "docstats")).count() == n
    assert not os.path.exists(os.path.join(index_path, "committed"))

    q = start_text_ingest_stream(spark, landing, index_path, ckpt, d)
    assert q.awaitTermination(180)

    ds = spark.read.parquet(os.path.join(index_path, "docstats"))
    assert ds.count() == n
    assert ds.groupBy("doc_id").count().where(F.col("count") > 1).count() == 0
    # stats: base partial + exactly ONE batch partial (not two)
    assert spark.read.parquet(os.path.join(index_path, "stats")).count() == 2
    got = [tuple(r) for r in _search_text_index(spark, index_path).collect()]
    scan = [tuple(r) for r in bm25_retrieval(spark, sf_smoke).collect()]
    assert got == scan


def test_publish_replays_to_exactly_once_from_every_crash_point(spark, tmp_path):
    """Sweep EVERY move-crash offset of a multi-table publish (not just
    the hand-picked ones): for each k, attempt 1 dies after its k-th
    os.replace, then the batch replays from a re-staged delta. The
    final state must be byte-identical in CONTENT to a never-crashed
    publish for every k — no duplicate rows, no missing table's rows,
    no leftover manifest."""
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        publish_staged_batch,
    )

    def stage(root):
        staging = os.path.join(root, "staging")
        shutil.rmtree(staging, ignore_errors=True)
        spark.createDataFrame(
            [(c, i) for c in (0, 1) for i in range(2)], "cell int, v int"
        ).repartition(F.col("cell")).write.partitionBy("cell").parquet(
            os.path.join(staging, "a")
        )
        spark.range(100, 103).selectExpr("id AS v").coalesce(1).write.parquet(
            os.path.join(staging, "b")
        )
        return staging

    def table_rows(live):
        a = sorted(
            (r["cell"], r["v"])
            for r in spark.read.parquet(os.path.join(live, "a")).collect()
        )
        b = sorted(r["v"] for r in spark.read.parquet(os.path.join(live, "b")).collect())
        return a, b

    # ground truth: a never-crashed publish
    clean = str(tmp_path / "clean")
    publish_staged_batch(stage(clean), clean, ("a", "b"), 1)
    want = table_rows(clean)
    total_moves = 3  # 2 'a' partition files + 1 'b' file

    import os as _osmod

    real_replace = _osmod.replace
    for k in range(total_moves):
        live = str(tmp_path / f"crash_at_{k}")
        staging = stage(live)
        left = {"n": k}

        def crashing(src, dst, _left=left):
            if _left["n"] == 0:
                raise OSError("simulated crash")
            _left["n"] -= 1
            return real_replace(src, dst)

        _osmod.replace = crashing
        try:
            publish_staged_batch(staging, live, ("a", "b"), 1)
            raise AssertionError(f"k={k}: publish was supposed to crash")
        except OSError:
            pass
        finally:
            _osmod.replace = real_replace
        # replay from a re-staged delta (overwrite semantics upstream)
        publish_staged_batch(stage(live), live, ("a", "b"), 1)
        assert table_rows(live) == want, f"crash at move {k}"
        assert not any(
            f.startswith(".publish-manifest") for f in os.listdir(live)
        ), f"crash at move {k}: manifest not retired"


def test_ledger_compaction_preserves_keys_and_recovers_from_crash(spark, tmp_path):
    """compact_committed_ledger folds the O(batches)-file replay ledger
    to one file with an identical key set; a crash between its two
    renames (ledger parked at .committed-old, swap incomplete) must be
    recovered by _ensure_committed_ledger restoring the parked ledger —
    NOT re-seeding from base files, which would forget streamed keys
    and let a later duplicate arrival re-ingest them."""
    from automated_dow30_earnings_reports_spark.streaming.incremental import (
        _ensure_committed_ledger,
        compact_committed_ledger,
    )

    index = str(tmp_path / "index")
    spark.range(0, 4).selectExpr("id AS doc_id").write.parquet(
        os.path.join(index, "docstats")
    )
    ledger = _ensure_committed_ledger(spark, index, "docstats")
    # three committed batches -> three one-file appends
    for lo in (4, 8, 12):
        spark.range(lo, lo + 4).selectExpr("id AS doc_id").coalesce(1).write.mode(
            "append"
        ).parquet(ledger)

    def keys():
        return {r["doc_id"] for r in spark.read.parquet(ledger).collect()}

    def n_files():
        return sum(
            1
            for dp, _d, fs in os.walk(ledger)
            for f in fs
            if f.endswith(".parquet")
        )

    before = keys()
    assert n_files() >= 4
    reclaimed = compact_committed_ledger(spark, index)
    assert reclaimed >= 3
    assert n_files() == 1
    assert keys() == before
    # idempotent: already-compacted ledger is a no-op
    assert compact_committed_ledger(spark, index) == 0

    # crash between the two renames: ledger missing, .committed-old holds
    # the complete pre-compaction ledger
    os.rename(ledger, os.path.join(index, ".committed-old"))
    restored = _ensure_committed_ledger(spark, index, "docstats")
    assert restored == ledger
    assert keys() == before
    assert not os.path.exists(os.path.join(index, ".committed-old"))


def test_streaming_ivf_ingest_recovers_from_crashed_publish(
    spark, sf_smoke, tmp_path, monkeypatch
):
    """The ivf stream now rides the shared _ingest_batch protocol; this
    is its crash drill (the text/dedup twins live in test_round7_ops):
    attempt 1 of batch 0 dies MID-MOVE — manifest on disk, exactly one
    ingest-0-* file moved into a live cell, no ledger entry — and the
    real stream must replay the batch to an index identical to the
    never-streamed full-corpus IVF (the manifest-directed scrub removes
    the partial file before the republish)."""
    import os as _osmod

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
        publish_staged_batch,
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
    batch = e.where(F.col("vec_id") >= IVF_APPEND_SPLIT)
    batch.select("vec_id").write.format("kvlinks").option("path", landing).mode(
        "append"
    ).save()

    # --- attempt 1 of batch 0: stage the real delta, then crash after
    # the FIRST os.replace (manifest written, one partial file live) ---
    staging = os.path.join(index_path, ".staging", "batch-0")
    idx_cents = spark.read.parquet(os.path.join(index_path, "centroids"))
    write_partitioned(
        _assign_cells(batch, idx_cents),
        os.path.join(staging, "postings"),
        ["cell"],
        dynamic=False,
    )
    real_replace = _osmod.replace
    moves = {"n": 0}

    def crashing_replace(src, dst):
        if moves["n"] >= 1:
            raise OSError("simulated crash mid-move")
        moves["n"] += 1
        return real_replace(src, dst)

    monkeypatch.setattr(_osmod, "replace", crashing_replace)
    try:
        publish_staged_batch(staging, index_path, ("postings",), 0)
        raise AssertionError("publish was supposed to crash mid-move")
    except OSError:
        pass
    monkeypatch.setattr(_osmod, "replace", real_replace)
    manifest = os.path.join(index_path, ".publish-manifest-0.json")
    assert os.path.exists(manifest)  # the crash left its touched-set

    # --- the real stream replays batch 0 against the same landing ---
    q = start_ivf_ingest_stream(spark, landing, index_path, ckpt, e)
    assert q.awaitTermination(180)

    p = spark.read.parquet(os.path.join(index_path, "postings"))
    assert p.groupBy("vec_id").count().where(F.col("count") > 1).count() == 0
    assert p.count() == e.count()
    assert not os.path.exists(manifest)  # the republish retired it
    got = [
        tuple(r) for r in _search_index(p, idx_cents, _query_vectors(e)).collect()
    ]
    want = [tuple(r) for r in similarity_ann_ivf(spark, sf_smoke).collect()]
    assert got == want and got


def test_text_index_delete_is_retry_safe(spark):
    """Replaying a forget request must be a no-op at every crash point:
    (a) full-op replay after completion — the retry must NOT re-derive
    the negative stats partial from the already-erased docstats (that
    wrote zeros over the real partial) nor append a second one (that
    double-subtracted); (b) replay from the crash point between the
    stats append and the rewrites — the deterministic partial file is
    reused, not duplicated. Distinct requests coexist under distinct
    request_ids."""
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        _delete_from_text_index,
        _write_text_index,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} common word{i % 3}") for i in range(12)],
        "doc_id bigint, text string",
    )
    path = os.path.join(SCRATCH, "retry_safe_delete")
    shutil.rmtree(path, ignore_errors=True)
    _write_text_index(docs, path, "overwrite")

    def stats():
        row = (
            spark.read.parquet(os.path.join(path, "stats"))
            .agg(F.sum("n_docs").alias("n"), F.sum("sum_dl").alias("s"))
            .collect()[0]
        )
        return (row["n"], row["s"])

    victims = docs.where(F.col("doc_id") < 4).select("doc_id")
    _delete_from_text_index(spark, path, victims, request_id="req-a")
    after_first = stats()
    assert after_first == (8, 8 * 3)

    # (a) full replay of the SAME request after completion
    _delete_from_text_index(spark, path, victims, request_id="req-a")
    assert stats() == after_first
    # exactly one negative partial for req-a, under its deterministic name
    partials = [
        f
        for f in os.listdir(os.path.join(path, "stats"))
        if f.startswith("forget-")
    ]
    assert partials == ["forget-req-a.parquet"]

    # (b) crash-point replay: the partial exists but the rewrites did
    # not run — rerunning completes them without touching the partial
    victims_b = docs.where(F.col("doc_id") == 7).select("doc_id")
    _delete_from_text_index(spark, path, victims_b, request_id="req-b")
    _delete_from_text_index(spark, path, victims_b, request_id="req-b")
    assert stats() == (7, 7 * 3)
    left = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(path, "docstats")).collect()
    }
    assert left == {4, 5, 6, 8, 9, 10, 11}


def test_ledger_seed_is_atomic_against_partial_seed_dirs(spark, tmp_path):
    """A crash during the ledger bootstrap's seed write must not leave a
    directory that a restart trusts as a complete ledger (a partial seed
    re-admits already-indexed keys as fresh: duplicates). The seed is
    written to a temp dir and renamed into place, so a leftover partial
    temp dir is rebuilt, and only a completed rename is ever trusted."""
    from automated_dow30_earnings_reports_spark.streaming.incremental import (
        _ensure_committed_ledger,
    )

    index = str(tmp_path / "index")
    spark.range(0, 6).select(F.col("id").alias("doc_id")).write.parquet(
        os.path.join(index, "docstats")
    )
    # leftover partial temp seed from a crashed bootstrap (one stray file)
    tmp_seed = os.path.join(index, ".committed-seed-tmp")
    os.makedirs(tmp_seed)
    with open(os.path.join(tmp_seed, "part-stale.parquet"), "wb") as fh:
        fh.write(b"garbage")

    ledger = _ensure_committed_ledger(spark, index, "docstats")
    got = {r["doc_id"] for r in spark.read.parquet(ledger).collect()}
    assert got == {0, 1, 2, 3, 4, 5}
    # the temp dir was consumed by the rename — nothing half-built left
    assert not os.path.exists(tmp_seed)


# ---------------------------------------------------------------------------
# Retention / TTL enforcement (plans/maintenance.py enforce_ttl)
# ---------------------------------------------------------------------------


def _file_inventory(root):
    """(relpath, size, md5) for every parquet file under root."""
    import hashlib

    out = []
    for dirpath, _dirs, files in sorted(os.walk(root)):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                digest = hashlib.md5(fh.read()).hexdigest()
            out.append((os.path.relpath(p, root), os.path.getsize(p), digest))
    return out


def test_ttl_enforce_touches_only_expired_and_boundary_partitions(spark, sf_smoke):
    """Fresh partitions must keep their EXACT part files (TTL cost is
    O(boundary + directory unlinks), so untouched partitions must be
    provably untouched), expired partitions must vanish at directory
    level, and the boundary partition must hold exactly its
    survivors."""
    from automated_dow30_earnings_reports_spark.plans import maintenance as m
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        write_partitioned,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    path = os.path.join(SCRATCH, "ttl_pin")
    shutil.rmtree(path, ignore_errors=True)
    o = load_table(spark, sf_smoke, "orders")
    write_partitioned(
        o.withColumn("o_year", F.year("o_orderdate").cast("int")), path, ["o_year"]
    )
    years = sorted(
        int(e.split("=")[1]) for e in os.listdir(path) if e.startswith("o_year=")
    )
    fresh = [y for y in years if y > m.TTL_CUTOFF_YEAR]
    assert fresh and min(years) < m.TTL_CUTOFF_YEAR, "need expired+fresh years"
    before = {
        y: _file_inventory(os.path.join(path, f"o_year={y}")) for y in fresh
    }

    m.enforce_ttl(
        spark, path, "o_year", m.TTL_CUTOFF_YEAR,
        F.col("o_orderdate") >= F.lit(m.TTL_CUTOFF),
    )

    # expired: gone at directory level
    for y in years:
        if y < m.TTL_CUTOFF_YEAR:
            assert not os.path.isdir(os.path.join(path, f"o_year={y}"))
    # fresh: byte-identical part files
    for y in fresh:
        assert _file_inventory(os.path.join(path, f"o_year={y}")) == before[y]
    # boundary: exactly the survivors
    got = (
        spark.read.parquet(os.path.join(path, f"o_year={m.TTL_CUTOFF_YEAR}"))
        .agg(F.count("*"), F.sum(F.crc32(F.col("o_orderkey").cast("string"))))
        .collect()[0]
    )
    want = (
        o.where(
            (F.year("o_orderdate") == m.TTL_CUTOFF_YEAR)
            & (F.col("o_orderdate") >= F.lit(m.TTL_CUTOFF))
        )
        .agg(F.count("*"), F.sum(F.crc32(F.col("o_orderkey").cast("string"))))
        .collect()[0]
    )
    assert tuple(got) == tuple(want)


def test_ttl_enforce_unlinks_boundary_with_no_survivors(spark):
    """A boundary partition whose every row expired is unlinked, not
    rewritten empty (dynamic overwrite cannot emit an empty
    partition — same contract as rewrite_affected_partitions)."""
    from automated_dow30_earnings_reports_spark.plans import maintenance as m

    path = os.path.join(SCRATCH, "ttl_empty_boundary")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.createDataFrame(
        [(1997, 5, "old"), (1998, 2, "boundary-expired"), (1999, 9, "fresh")],
        "y int, month int, tag string",
    )
    df.repartition(F.col("y")).write.partitionBy("y").parquet(path)
    m.enforce_ttl(spark, path, "y", 1998, F.col("month") >= 4)
    assert not os.path.isdir(os.path.join(path, "y=1997"))
    assert not os.path.isdir(os.path.join(path, "y=1998"))
    assert [r.tag for r in spark.read.parquet(path).collect()] == ["fresh"]


# ---------------------------------------------------------------------------
# Time travel (plans/maintenance.py read_snapshot): manifest-pinned
# snapshot reads — orphans invisible, old versions stay readable after
# a delete commit.
# ---------------------------------------------------------------------------


def test_time_travel_snapshots_are_manifest_pinned(spark, sf_smoke):
    from automated_dow30_earnings_reports_spark.plans import maintenance as m
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        scratch_path,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    m.time_travel_read(spark, sf_smoke).collect()  # builds the versioned lake
    path = scratch_path(os.path.join(m._SCRATCH, "time_travel"), sf_smoke)
    o = load_table(spark, sf_smoke, "orders")

    # the crashed writer's files ARE on disk...
    orphan = os.path.join(path, "data", "c-orphan")
    assert any(f.endswith(".parquet") for f in os.listdir(orphan))
    # ...but no manifest names them: v2 contains zero post-V2 rows
    v2 = m.read_snapshot(spark, path, 2)
    assert v2.where(F.col("o_orderdate") >= F.lit(m.TT_V2_CUTOFF)).isEmpty()
    assert v2.count() == o.where(F.col("o_orderdate") < F.lit(m.TT_V2_CUTOFF)).count()

    # the delete commit removed its keys from v3 ONLY — v2, read after
    # commit 3 sealed, still sees them (old snapshots stay consistent)
    deleted = F.col("o_orderkey") % m.TT_DELETE_MOD == 0
    assert m.read_snapshot(spark, path, 3).where(deleted).isEmpty()
    assert v2.where(deleted).count() > 0

    # rollback is a manifest re-read: v1 == the v1-cutoff filter exactly
    assert (
        m.read_snapshot(spark, path, 1).count()
        == o.where(F.col("o_orderdate") < F.lit(m.TT_V1_CUTOFF)).count()
    )


def test_ttl_boundary_swap_recovers_from_every_crash_point(spark):
    """The staged boundary rewrite must replay to the same final lake
    from each crash window: (A) complete stage left beside an intact
    partition (crash before the unlink), (B) complete stage with the
    partition already unlinked (crash between unlink and rename), (C)
    partial stage — no _SUCCESS — beside an intact partition (crash
    mid-stage-write)."""
    from automated_dow30_earnings_reports_spark.plans import maintenance as m

    def build(path):
        shutil.rmtree(path, ignore_errors=True)
        df = spark.createDataFrame(
            [(1997, 1, "expired"), (1998, 2, "old"), (1998, 9, "keep"),
             (1999, 5, "fresh")],
            "y int, month int, tag string",
        )
        df.repartition(F.col("y")).write.partitionBy("y").parquet(path)

    def final_tags(path):
        return sorted(r.tag for r in spark.read.parquet(path).collect())

    base = os.path.join(SCRATCH, "ttl_crash")

    # A: complete stage + live partition intact
    build(base)
    stage = os.path.join(base, ".ttl-stage-1998")
    spark.read.parquet(os.path.join(base, "y=1998")).where(
        F.col("month") >= 4
    ).write.parquet(stage)
    assert os.path.exists(os.path.join(stage, "_SUCCESS"))
    m.enforce_ttl(spark, base, "y", 1998, F.col("month") >= 4)
    assert final_tags(base) == ["fresh", "keep"] and not os.path.isdir(stage)

    # B: complete stage, partition unlinked
    build(base)
    spark.read.parquet(os.path.join(base, "y=1998")).where(
        F.col("month") >= 4
    ).write.parquet(stage)
    shutil.rmtree(os.path.join(base, "y=1998"))
    m.enforce_ttl(spark, base, "y", 1998, F.col("month") >= 4)
    assert final_tags(base) == ["fresh", "keep"] and not os.path.isdir(stage)

    # C: partial stage (no _SUCCESS), partition intact
    build(base)
    os.makedirs(stage)
    with open(os.path.join(stage, "part-00000.parquet"), "wb") as fh:
        fh.write(b"torn")
    m.enforce_ttl(spark, base, "y", 1998, F.col("month") >= 4)
    assert final_tags(base) == ["fresh", "keep"] and not os.path.isdir(stage)


def test_seal_manifest_rename_is_the_commit_point(spark, tmp_path):
    """A version either has a complete manifest or none: seal leaves no
    tmp behind, a torn tmp from a crashed seal is never visible to
    read_snapshot, and an unsealed version raises cleanly instead of
    half-reading."""
    import pytest as _pytest

    from automated_dow30_earnings_reports_spark.plans import maintenance as m

    table = str(tmp_path / "tt")
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    files = []
    out = os.path.join(table, "data", "c1")
    df.write.parquet(out)
    files = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    )
    # a crashed seal's torn tmp for v2 sits in the manifest dir
    os.makedirs(os.path.join(table, "manifests"))
    with open(os.path.join(table, "manifests", "v2.json.tmp"), "w") as fh:
        fh.write('{"files": [')  # torn mid-write
    m.seal_manifest(table, 1, files)
    assert sorted(os.listdir(os.path.join(table, "manifests"))) == [
        "v1.json",
        "v2.json.tmp",
    ]
    assert m.read_snapshot(spark, table, 1).count() == 1
    with _pytest.raises(FileNotFoundError):
        m.read_snapshot(spark, table, 2)  # torn tmp is not a version


def test_ttl_enforce_never_deletes_undatable_partitions(spark):
    """A null partition value (__HIVE_DEFAULT_PARTITION__) or a foreign
    directory has no age — retention must leave it untouched rather
    than guess."""
    from automated_dow30_earnings_reports_spark.plans import maintenance as m

    path = os.path.join(SCRATCH, "ttl_null_part")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.createDataFrame(
        [(1995, 1, "expired"), (None, 6, "undated"), (1999, 3, "fresh")],
        "y int, month int, tag string",
    )
    df.repartition(F.col("y")).write.partitionBy("y").parquet(path)
    assert os.path.isdir(os.path.join(path, "y=__HIVE_DEFAULT_PARTITION__"))
    m.enforce_ttl(spark, path, "y", 1998, F.col("month") >= 4)
    got = sorted(r.tag for r in spark.read.parquet(path).collect())
    assert got == ["fresh", "undated"]


def test_time_travel_table_is_relocatable(spark, tmp_path):
    """Manifests store table-root-relative paths, so moving the whole
    table directory (manifests + data) must keep every version
    readable — the replication/DR contract."""
    from automated_dow30_earnings_reports_spark.plans import maintenance as m

    src = str(tmp_path / "orig")
    df = spark.createDataFrame([(i, "x") for i in range(7)], "k int, v string")
    out = os.path.join(src, "data", "c1")
    df.write.parquet(out)
    files = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    )
    m.seal_manifest(src, 1, files)
    dst = str(tmp_path / "moved")
    shutil.move(src, dst)
    assert m.read_snapshot(spark, dst, 1).count() == 7


def test_ttl_enforce_equals_filter_oracle_randomized(spark):
    """Seeded randomized layouts: whatever the (year, month) spread —
    empty boundary, missing years, all-expired, all-fresh — the
    enforced lake must equal the plain filter of the input."""
    import random

    from automated_dow30_earnings_reports_spark.plans import maintenance as m

    path = os.path.join(SCRATCH, "ttl_fuzz")
    for seed in range(5):
        rng = random.Random(seed)
        years = rng.sample(range(1994, 2003), rng.randint(2, 6))
        rows = [
            (y, rng.randint(1, 12), i)
            for i, y in enumerate(rng.choices(years, k=rng.randint(5, 60)))
        ]
        cutoff_year = rng.choice(range(1995, 2002))
        cutoff_month = rng.randint(1, 12)
        shutil.rmtree(path, ignore_errors=True)
        df = spark.createDataFrame(rows, "y int, month int, rid int")
        df.repartition(F.col("y")).write.partitionBy("y").parquet(path)
        m.enforce_ttl(
            spark, path, "y", cutoff_year, F.col("month") >= cutoff_month
        )
        keep = (F.col("y") > cutoff_year) | (
            (F.col("y") == cutoff_year) & (F.col("month") >= cutoff_month)
        )
        want = sorted(r.rid for r in df.where(keep).collect())
        survivors = (
            [] if not os.path.isdir(path) or not any(
                e.startswith("y=") for e in os.listdir(path)
            )
            else sorted(r.rid for r in spark.read.parquet(path).collect())
        )
        assert survivors == want, f"seed {seed}: {survivors} != {want}"


def test_mor_read_single_fold_when_compaction_crashes_midway(
    spark, sf_smoke, monkeypatch
):
    """The one crash window where a MOR reader could double-subtract
    the victims' stats: tombstone compaction writes its negative
    partial, then dies before the postings/docstats rewrite. The read
    path must detect the persisted partial (content-hash request id)
    and skip its read-time fold — answers before the crash, inside the
    window, and after the retried compaction must all be identical."""
    import pytest as _pytest

    from automated_dow30_earnings_reports_spark.operators import textstats as tx
    from automated_dow30_earnings_reports_spark.sources import parquet_lake as pl
    from automated_dow30_earnings_reports_spark.tables import load_table

    d = load_table(spark, sf_smoke, "documents")
    path = tx._text_index_path(sf_smoke) + "_morcrash"
    shutil.rmtree(path, ignore_errors=True)
    tx._write_text_index(d, path, "overwrite")
    d.where(F.expr(tx.TEXT_DELETE_PRED)).select("doc_id").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "tombstones"))

    want = [
        tuple(r)
        for r in tx._search_text_index(spark, path, merge_tombstones=True).collect()
    ]

    def boom(*_a, **_k):
        raise RuntimeError("crash before the postings rewrite")

    monkeypatch.setattr(pl, "rewrite_affected_partitions", boom)
    with _pytest.raises(RuntimeError, match="crash before"):
        tx._compact_text_tombstones(spark, path)
    monkeypatch.undo()

    # the window's exact state: partial persisted, tombstones standing,
    # victims' docstats rows still present
    victims = spark.read.parquet(os.path.join(path, "tombstones"))
    rid = tx._tombstone_request_id(victims)
    assert os.path.exists(os.path.join(path, "stats", f"forget-{rid}.parquet"))
    assert (
        spark.read.parquet(os.path.join(path, "docstats"))
        .join(victims, "doc_id")
        .count()
        > 0
    )
    got = [
        tuple(r)
        for r in tx._search_text_index(spark, path, merge_tombstones=True).collect()
    ]
    assert got == want  # single fold — the persisted partial is not doubled

    # retry converges: compacted index, plain read path, same answer
    tx._compact_text_tombstones(spark, path)
    assert not os.path.exists(os.path.join(path, "tombstones"))
    assert [
        tuple(r) for r in tx._search_text_index(spark, path).collect()
    ] == want


def test_vacuum_retires_torn_manifests_without_touching_data(spark, tmp_path):
    """A publish that died MID-manifest-write left a torn (unparseable)
    manifest and — because the manifest is written before any file
    move — zero ingest files. Vacuum must retire the torn manifest,
    count the batch rolled back, and leave every data file exactly as
    it found it."""
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        rollback_orphan_publishes,
    )

    live = str(tmp_path / "idx")
    spark.createDataFrame([(1, 10), (2, 20)], "k int, v int").write.parquet(
        os.path.join(live, "t")
    )
    before = _file_inventory(live)
    with open(os.path.join(live, ".publish-manifest-7.json"), "w") as fh:
        fh.write('{"t": ["cell=')  # torn mid-write
    report = rollback_orphan_publishes(live)
    assert report["rolled_back_batches"] == 1
    assert not os.path.exists(os.path.join(live, ".publish-manifest-7.json"))
    assert _file_inventory(live) == before


def test_ttl_recovery_prefers_complete_stage_over_truncated_partition(spark):
    """Crash window D (found in review): the unlink of the boundary
    partition dies PARTWAY — live dir still exists but is truncated.
    Recovery must complete the swap from the complete stage; discarding
    the stage and recomputing survivors from the remnant would silently
    lose every already-unlinked survivor row."""
    from automated_dow30_earnings_reports_spark.plans import maintenance as m

    path = os.path.join(SCRATCH, "ttl_truncated")
    shutil.rmtree(path, ignore_errors=True)
    rows = [(1998, mth, i) for i, mth in enumerate([1, 2, 5, 6, 7, 8, 9, 10])]
    rows += [(1999, 3, 100)]
    df = spark.createDataFrame(rows, "y int, month int, rid int")
    # several files per partition so a partial unlink is constructible
    df.repartition(4).write.partitionBy("y").parquet(path)
    live = os.path.join(path, "y=1998")
    files = sorted(f for f in os.listdir(live) if f.endswith(".parquet"))
    assert len(files) >= 2, "need a multi-file partition for this pin"

    # a previous run staged the complete survivor set...
    stage = os.path.join(path, ".ttl-stage-1998")
    spark.read.parquet(live).where(F.col("month") >= 4).write.parquet(stage)
    assert os.path.exists(os.path.join(stage, "_SUCCESS"))
    # ...then crashed after unlinking only SOME of the live files
    for f in files[: len(files) // 2]:
        os.remove(os.path.join(live, f))

    m.enforce_ttl(spark, path, "y", 1998, F.col("month") >= 4)
    got = sorted(r.rid for r in spark.read.parquet(path).collect())
    want = sorted(r.rid for r in df.where(
        (F.col("y") > 1998) | (F.col("month") >= 4)
    ).collect())
    assert got == want and not os.path.isdir(stage)


def test_file_compaction_preserves_standing_forget_marker(
    spark, sf_smoke, monkeypatch
):
    """Found in review: routine FILE compaction (_compact_text_index)
    used to fold the forget-<id> negative partial anonymously into the
    single stats row, erasing the marker the MOR read path's
    double-fold guard keys on. With tombstones still standing (crashed
    tombstone compaction), a subsequent MOR read then re-subtracted the
    victims' stats. The file compaction must keep standing markers as
    separate files — numerically identical, marker intact."""
    import pytest as _pytest

    from automated_dow30_earnings_reports_spark.operators import textstats as tx
    from automated_dow30_earnings_reports_spark.sources import parquet_lake as pl
    from automated_dow30_earnings_reports_spark.tables import load_table

    d = load_table(spark, sf_smoke, "documents")
    path = tx._text_index_path(sf_smoke) + "_morfilecompact"
    shutil.rmtree(path, ignore_errors=True)
    tx._write_text_index(d, path, "overwrite")
    tx._write_tombstone_set(
        d.where(F.expr(tx.TEXT_DELETE_PRED)).select("doc_id"), path
    )
    want = [
        tuple(r)
        for r in tx._search_text_index(spark, path, merge_tombstones=True).collect()
    ]

    def boom(*_a, **_k):
        raise RuntimeError("crash before the postings rewrite")

    monkeypatch.setattr(pl, "rewrite_affected_partitions", boom)
    with _pytest.raises(RuntimeError, match="crash before"):
        tx._compact_text_tombstones(spark, path)
    monkeypatch.undo()
    victims = spark.read.parquet(os.path.join(path, "tombstones"))
    rid = tx._tombstone_set_request_id(path, victims)
    marker = os.path.join(path, "stats", f"forget-{rid}.parquet")
    assert os.path.exists(marker)

    # routine file compaction runs over the crashed-window state
    tx._compact_text_index(spark, path)
    assert os.path.exists(marker), "file compaction must keep the standing marker"
    got = [
        tuple(r)
        for r in tx._search_text_index(spark, path, merge_tombstones=True).collect()
    ]
    assert got == want  # still a single fold

    # once tombstones are retired the spent marker folds away
    tx._compact_text_tombstones(spark, path)
    tx._compact_text_index(spark, path)
    stats_files = [
        f for f in os.listdir(os.path.join(path, "stats")) if f.endswith(".parquet")
    ]
    assert len(stats_files) == 1 and not stats_files[0].startswith("forget-")
    assert [
        tuple(r) for r in tx._search_text_index(spark, path).collect()
    ] == want


def test_mor_read_uses_persisted_request_id_sidecar(spark, sf_smoke, monkeypatch):
    """The tombstone set's content-hash id is persisted at WRITE time
    (_write_tombstone_set sidecar); the MOR read path must use it
    instead of re-collecting the tombstone table per query — the
    derivation collect is request-path cost, not read-path cost."""
    from automated_dow30_earnings_reports_spark.operators import textstats as tx
    from automated_dow30_earnings_reports_spark.tables import load_table

    d = load_table(spark, sf_smoke, "documents")
    path = tx._text_index_path(sf_smoke) + "_sidecar"
    shutil.rmtree(path, ignore_errors=True)
    tx._write_text_index(d, path, "overwrite")
    tx._write_tombstone_set(
        d.where(F.expr(tx.TEXT_DELETE_PRED)).select("doc_id"), path
    )
    assert os.path.exists(os.path.join(path, "tombstones", "_request_id.txt"))

    def boom(*_a, **_k):
        raise AssertionError("read path must not re-derive the request id")

    monkeypatch.setattr(tx, "_tombstone_request_id", boom)
    got = tx._search_text_index(spark, path, merge_tombstones=True)
    assert got.count() > 0  # executes the read without deriving
