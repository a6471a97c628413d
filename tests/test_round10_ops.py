"""Round-10 surface: the retention-windowed index vacuum
(sources/parquet_lake.rollback_orphan_publishes min_age_seconds) — the
r9 verdict's "What's missing #3": the lake's vacuum_unreferenced
learned a retention window in r9, but the index-family vacuums still
required a quiesced index, so a racing vacuum would eat an in-flight
ingest's staged-but-unpublished files. These pins prove the window:
durably-abandoned crash state (old mtimes) is rolled back while a
FRESH in-flight batch — staged tree and publish manifest — survives
the vacuum and then publishes cleanly.
"""

from __future__ import annotations

import json
import os
import time

import pytest

from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
    publish_staged_batch,
    rollback_orphan_publishes,
)


def _backdate_tree(path: str, ts: float) -> None:
    for dirpath, dirs, files in os.walk(path, topdown=False):
        for name in files + dirs:
            os.utime(os.path.join(dirpath, name), (ts, ts))
    os.utime(path, (ts, ts))


def _stage_batch(spark, live, batch_id, lo, hi):
    """Stage one batch's delta for table 't' plus its publish manifest
    (the state publish_staged_batch leaves between the manifest write
    and the file moves — the in-flight shape)."""
    staging = os.path.join(live, ".staging", f"batch-{batch_id}")
    spark.range(lo, hi).selectExpr("id AS doc_id").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(staging, "t"))
    with open(
        os.path.join(live, f".publish-manifest-{batch_id}.json"), "w"
    ) as fh:
        json.dump({"t": ["."]}, fh)
    return staging


def test_retention_window_spares_inflight_batch_which_then_publishes(
    spark, tmp_path
):
    live = str(tmp_path / "idx")
    spark.range(0, 10).selectExpr("id AS doc_id").write.parquet(
        os.path.join(live, "t")
    )
    old_t = time.time() - 7200

    # batch 7: durably-abandoned crashed publish — staged, manifest,
    # exactly one file moved in, everything past the window
    stage7 = _stage_batch(spark, live, 7, 100, 105)
    src = next(
        f
        for f in os.listdir(os.path.join(stage7, "t"))
        if f.endswith(".parquet")
    )
    os.replace(
        os.path.join(stage7, "t", src),
        os.path.join(live, "t", "ingest-7-0.parquet"),
    )
    _backdate_tree(stage7, old_t)
    os.utime(os.path.join(live, ".publish-manifest-7.json"), (old_t, old_t))
    os.utime(os.path.join(live, "t", "ingest-7-0.parquet"), (old_t, old_t))

    # batch 8: FRESH in-flight ingest — staged + manifest, no moves yet
    stage8 = _stage_batch(spark, live, 8, 200, 204)

    report = rollback_orphan_publishes(live, min_age_seconds=3600)
    # the abandoned batch is rolled back in full...
    assert report["rolled_back_batches"] == 1
    assert report["scrubbed_files"] == 1
    assert not os.path.exists(os.path.join(live, ".publish-manifest-7.json"))
    assert not os.path.exists(os.path.join(live, "t", "ingest-7-0.parquet"))
    assert not os.path.exists(stage7)
    # ...while the young batch (manifest + staged tree) is spared
    assert report["young_spared"] >= 2
    assert os.path.exists(os.path.join(live, ".publish-manifest-8.json"))
    assert os.path.isdir(os.path.join(stage8, "t"))

    # the spared in-flight batch completes its publish cleanly
    publish_staged_batch(stage8, live, ("t",), 8)
    got = sorted(
        r.doc_id for r in spark.read.parquet(os.path.join(live, "t")).collect()
    )
    assert got == list(range(10)) + list(range(200, 204))
    # nothing left for a later (quiesce-mode) vacuum beyond empty roots
    report2 = rollback_orphan_publishes(live)
    assert report2["rolled_back_batches"] == 0
    assert report2["scrubbed_files"] == 0


def test_min_age_zero_keeps_the_quiesce_contract(spark, tmp_path):
    # default min_age=0 behaves exactly as the r8/r9 quiesced vacuum:
    # a fresh crashed publish is rolled back immediately
    live = str(tmp_path / "idx0")
    spark.range(0, 5).selectExpr("id AS doc_id").write.parquet(
        os.path.join(live, "t")
    )
    stage = _stage_batch(spark, live, 3, 50, 53)
    report = rollback_orphan_publishes(live)
    assert report["rolled_back_batches"] == 1
    assert report["young_spared"] == 0
    assert not os.path.exists(os.path.join(live, ".publish-manifest-3.json"))
    assert not os.path.exists(stage)


def test_young_spared_state_is_reclaimed_once_aged(spark, tmp_path):
    # the spared batch is not immortal: once its mtimes age past the
    # window, the next vacuum reclaims it (the operator never has to
    # special-case "stuck" in-flight state)
    live = str(tmp_path / "idx_age")
    spark.range(0, 5).selectExpr("id AS doc_id").write.parquet(
        os.path.join(live, "t")
    )
    stage = _stage_batch(spark, live, 9, 60, 63)
    report = rollback_orphan_publishes(live, min_age_seconds=3600)
    assert report["rolled_back_batches"] == 0 and report["young_spared"] >= 2
    assert os.path.isdir(stage)
    old_t = time.time() - 7200
    _backdate_tree(os.path.join(live, ".staging"), old_t)
    os.utime(os.path.join(live, ".publish-manifest-9.json"), (old_t, old_t))
    report = rollback_orphan_publishes(live, min_age_seconds=3600)
    assert report["rolled_back_batches"] == 1
    assert not os.path.exists(stage)
    assert not os.path.exists(os.path.join(live, ".publish-manifest-9.json"))


def test_staging_spared_when_manifest_is_young_even_if_tree_is_old(
    spark, tmp_path
):
    # review r10: a publisher can pick up a LONG-AGO staged batch and
    # write a fresh manifest just before its moves; reclaiming that
    # stage mid-publish would complete the publish with zero files and
    # the ledger recording the batch as published. The batch's age is
    # the newest of its tree AND its manifest.
    live = str(tmp_path / "idx_latepub")
    spark.range(0, 5).selectExpr("id AS doc_id").write.parquet(
        os.path.join(live, "t")
    )
    stage = _stage_batch(spark, live, 11, 70, 73)
    old_t = time.time() - 7200
    _backdate_tree(os.path.join(live, ".staging"), old_t)  # tree: old
    # manifest stays FRESH (the publisher just wrote it)
    report = rollback_orphan_publishes(live, min_age_seconds=3600)
    assert report["rolled_back_batches"] == 0
    assert os.path.isdir(os.path.join(stage, "t"))
    publish_staged_batch(stage, live, ("t",), 11)
    got = sorted(
        r.doc_id for r in spark.read.parquet(os.path.join(live, "t")).collect()
    )
    assert got == list(range(5)) + list(range(70, 73))


def test_stray_file_under_staging_is_reclaimed_not_miscounted(spark, tmp_path):
    # review r10: rmtree(file, ignore_errors=True) silently no-ops on a
    # non-directory — the stray must be os.remove'd, and only actually
    # reclaimed entries may count as scratch_dirs
    live = str(tmp_path / "idx_stray")
    spark.range(0, 3).selectExpr("id AS doc_id").write.parquet(
        os.path.join(live, "t")
    )
    staging = os.path.join(live, ".staging")
    os.makedirs(staging, exist_ok=True)
    stray = os.path.join(staging, "junk.tmp")
    with open(stray, "w") as fh:
        fh.write("partial")
    report = rollback_orphan_publishes(live)
    assert report["scratch_dirs"] == 1
    assert not os.path.exists(stray)
    assert not os.path.exists(staging)  # emptied root removed too
    # idempotent: a second vacuum reports a clean index
    report = rollback_orphan_publishes(live)
    assert report["scratch_dirs"] == 0 and report["rolled_back_batches"] == 0


def test_torn_manifest_recovers_scrub_set_instead_of_abandoning(spark, tmp_path):
    # review r10 wave 3: a torn manifest used to be retired with
    # touched={}, permanently abandoning the batch's partial ingest
    # files. Recovery now derives the scrub set from the staged tree,
    # or — when that is gone too — from a one-time walk for the
    # batch's tag.
    live = str(tmp_path / "idx_torn")
    spark.range(0, 6).selectExpr("id AS doc_id").write.parquet(
        os.path.join(live, "t")
    )
    # (a) torn manifest, staged tree PRESENT: scrub via the stage
    stage = _stage_batch(spark, live, 21, 90, 93)
    src = next(
        f for f in os.listdir(os.path.join(stage, "t")) if f.endswith(".parquet")
    )
    import shutil
    shutil.copy(
        os.path.join(stage, "t", src), os.path.join(live, "t", "ingest-21-0.parquet")
    )
    with open(os.path.join(live, ".publish-manifest-21.json"), "w") as fh:
        fh.write('{"t": ["')  # torn
    report = rollback_orphan_publishes(live)
    assert report["rolled_back_batches"] == 1
    assert report["scrubbed_files"] == 1
    assert not os.path.exists(os.path.join(live, "t", "ingest-21-0.parquet"))
    # (b) torn manifest, staged tree GONE: the one-time walk finds it
    with open(os.path.join(live, "t", "ingest-22-0.parquet"), "w") as fh:
        fh.write("partial")
    with open(os.path.join(live, ".publish-manifest-22.json"), "w") as fh:
        fh.write("{")  # torn
    report = rollback_orphan_publishes(live)
    assert report["rolled_back_batches"] == 1
    assert report["scrubbed_files"] == 1
    assert not os.path.exists(os.path.join(live, "t", "ingest-22-0.parquet"))
    # base rows untouched throughout
    got = sorted(
        r.doc_id for r in spark.read.parquet(os.path.join(live, "t")).collect()
    )
    assert got == list(range(6))


def test_publish_manifest_write_is_atomic_rename(spark, tmp_path):
    # review r10 wave 3: the manifest is the crash-recovery source of
    # truth for partial moves, so it must be written temp+fsync+rename
    # — a reader (or crash) can never observe a half-written manifest
    # under the canonical name
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        write_publish_manifest,
    )

    live = str(tmp_path / "idx_durable")
    staging = os.path.join(live, ".staging", "batch-5")
    spark.range(0, 4).selectExpr("id AS doc_id").coalesce(1).write.parquet(
        os.path.join(staging, "t")
    )
    touched = write_publish_manifest(live, staging, ("t",), 5)
    man = os.path.join(live, ".publish-manifest-5.json")
    assert json.load(open(man)) == {t: sorted(r) for t, r in touched.items()}
    # no tmp residue beside the canonical name
    assert [f for f in os.listdir(live) if ".json.tmp" in f] == []


def test_manifest_tmp_residue_is_swept(spark, tmp_path):
    # review r10 wave 4: a writer that died between its durable-write
    # tmp and the rename leaves .publish-manifest-N.json.tmp-* residue
    # no recovery path reads; the vacuum sweeps it under the age rule
    live = str(tmp_path / "idx_tmp")
    spark.range(0, 3).selectExpr("id AS doc_id").write.parquet(
        os.path.join(live, "t")
    )
    residue = os.path.join(live, ".publish-manifest-4.json.tmp-999-0")
    with open(residue, "w") as fh:
        fh.write('{"t": ["')
    # young residue spared under a window...
    report = rollback_orphan_publishes(live, min_age_seconds=3600)
    assert report["tmp_files_removed"] == 0 and os.path.exists(residue)
    # ...aged residue reclaimed (and immediately under quiesce mode)
    old_t = time.time() - 7200
    os.utime(residue, (old_t, old_t))
    report = rollback_orphan_publishes(live, min_age_seconds=3600)
    assert report["tmp_files_removed"] == 1
    assert not os.path.exists(residue)


def test_torn_manifest_walk_finds_fully_moved_partitions(spark, tmp_path):
    # review r10 wave 4: the staged tree is NOT a sufficient scrub
    # source — a partition whose staged files were ALL moved holds no
    # .parquet in its stage dir. The walk must find the moves anyway,
    # even with the stage dir still present.
    live = str(tmp_path / "idx_allmoved")
    spark.range(0, 4).selectExpr("id AS doc_id").write.parquet(
        os.path.join(live, "t")
    )
    stage = _stage_batch(spark, live, 31, 80, 82)
    # move EVERY staged file in, then tear the manifest
    n = 0
    for f in sorted(os.listdir(os.path.join(stage, "t"))):
        if f.endswith(".parquet"):
            os.replace(
                os.path.join(stage, "t", f),
                os.path.join(live, "t", f"ingest-31-{n}.parquet"),
            )
            n += 1
    assert n >= 1
    with open(os.path.join(live, ".publish-manifest-31.json"), "w") as fh:
        fh.write('{"t"')  # torn
    report = rollback_orphan_publishes(live)
    assert report["rolled_back_batches"] == 1
    assert report["scrubbed_files"] == n
    assert not any(
        f.startswith("ingest-31-") for f in os.listdir(os.path.join(live, "t"))
    )
    got = sorted(
        r.doc_id for r in spark.read.parquet(os.path.join(live, "t")).collect()
    )
    assert got == list(range(4))


# ---------------------------------------------------------------------------
# Incremental (append-only) snapshot reads: snapshot_changes_files /
# read_snapshot_changes (plans/maintenance.py). The contract under
# test: the plan is exactly the range's appended files — deduped
# against idempotent re-adds inside the range AND against files
# already live at v_from — and anything the file grain cannot express
# (a rewrite in range, a legacy full manifest, an expired log) refuses
# loudly instead of returning a row set that double-counts survivors.
# ---------------------------------------------------------------------------

from automated_dow30_earnings_reports_spark.plans.maintenance import (  # noqa: E402
    expire_snapshots,
    occ_commit,
    read_snapshot_changes,
    seal_manifest,
    snapshot_changes_files,
)


def _commit_files(spark, out, lo, hi, extra=None):
    df = spark.range(lo, hi).selectExpr("id AS doc_id")
    if extra is not None:
        df = df.selectExpr("doc_id", f"doc_id * 10 AS {extra}")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    )


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_changes_plan_is_exactly_the_appended_files_deduped(spark, tmp_path):
    t = str(tmp_path / "t")
    f1 = _commit_files(spark, os.path.join(t, "data", "c1"), 0, 10)
    assert occ_commit(t, {"a": f1}, base_version=0) == 1
    f2 = _commit_files(spark, os.path.join(t, "data", "c2"), 10, 20)
    assert occ_commit(t, {"a": f2}, base_version=1) == 2
    f3 = _commit_files(spark, os.path.join(t, "data", "c3"), 20, 30)
    # v3 re-mentions a v2 file (crashed writer's re-commit): counted once
    assert occ_commit(t, {"b": f3, "a": [f2[0]]}, base_version=2) == 3

    rel = snapshot_changes_files(t, 1, 3)
    want = sorted(os.path.relpath(f, t) for f in f2 + f3)
    assert rel == want
    assert _ids(read_snapshot_changes(spark, t, 1, 3)) == list(range(10, 30))
    # since table creation
    assert _ids(read_snapshot_changes(spark, t, 0, 1)) == list(range(10))


def test_changes_excludes_files_live_at_v_from(spark, tmp_path):
    t = str(tmp_path / "t")
    f1 = _commit_files(spark, os.path.join(t, "data", "c1"), 0, 10)
    assert occ_commit(t, {"a": f1}, base_version=0) == 1
    # v2 is ONLY an idempotent re-add of a v1 file: nothing new arrived
    assert occ_commit(t, {"a": [f1[0]]}, base_version=1) == 2
    assert snapshot_changes_files(t, 1, 2) == []
    with pytest.raises(ValueError, match="zero data files"):
        read_snapshot_changes(spark, t, 1, 2)


def test_changes_refuses_rewrites_and_bad_ranges(spark, tmp_path):
    t = str(tmp_path / "t")
    f1 = _commit_files(spark, os.path.join(t, "data", "c1"), 0, 10)
    assert occ_commit(t, {"a": f1}, base_version=0) == 1
    f2 = _commit_files(spark, os.path.join(t, "data", "c2"), 0, 5)
    assert occ_commit(t, {"a": f2}, ("a",), base_version=1) == 2
    with pytest.raises(ValueError, match="append-only"):
        snapshot_changes_files(t, 0, 2)
    with pytest.raises(ValueError, match="append-only"):
        snapshot_changes_files(t, 1, 2)
    # narrowing below the rewrite still works
    assert _ids(read_snapshot_changes(spark, t, 0, 1)) == list(range(10))
    with pytest.raises(ValueError, match="v_from"):
        snapshot_changes_files(t, 2, 2)
    with pytest.raises(ValueError, match="head"):
        snapshot_changes_files(t, 0, 3)


def test_changes_refuses_legacy_manifest_but_reads_above_it(spark, tmp_path):
    t = str(tmp_path / "t")
    f1 = _commit_files(spark, os.path.join(t, "data", "c1"), 0, 10)
    seal_manifest(t, 1, f1)  # legacy bootstrap: a state, not a delta
    f2 = _commit_files(spark, os.path.join(t, "data", "c2"), 10, 20)
    assert occ_commit(t, {"a": f2}, base_version=1) == 2
    with pytest.raises(ValueError, match="full"):
        snapshot_changes_files(t, 0, 1)
    # the delta tail above the bootstrap is incrementally readable
    assert _ids(read_snapshot_changes(spark, t, 1, 2)) == list(range(10, 20))


def test_changes_over_expired_range_raises_descriptively(spark, tmp_path):
    t = str(tmp_path / "t")
    for v, (lo, hi) in enumerate(((0, 10), (10, 20), (20, 30)), start=1):
        fs = _commit_files(spark, os.path.join(t, "data", f"c{v}"), lo, hi)
        assert occ_commit(t, {"a": fs}, base_version=v - 1) == v
    expire_snapshots(t, keep_last=1)
    with pytest.raises(FileNotFoundError, match="expired or torn"):
        snapshot_changes_files(t, 0, 3)


def test_changes_merge_schema_spans_the_evolution(spark, tmp_path):
    t = str(tmp_path / "t")
    f1 = _commit_files(spark, os.path.join(t, "data", "c1"), 0, 10)
    assert occ_commit(t, {"a": f1}, base_version=0, columns=["doc_id"]) == 1
    f2 = _commit_files(
        spark, os.path.join(t, "data", "c2"), 10, 20, extra="score"
    )
    assert (
        occ_commit(t, {"b": f2}, base_version=1, columns=["doc_id", "score"])
        == 2
    )
    df = read_snapshot_changes(spark, t, 0, 2, merge_schema=True)
    assert set(df.columns) == {"doc_id", "score"}
    rows = {r.doc_id: r.score for r in df.collect()}
    assert len(rows) == 20
    assert all(rows[i] is None for i in range(10))
    assert all(rows[i] == i * 10 for i in range(10, 20))


def test_changes_v_from_exclusion_is_partition_grain(spark, tmp_path):
    """An in-range add of a path live at v_from under a DIFFERENT
    partition genuinely joins the snapshot (_apply_delta folds it in)
    and must be reported; the same-partition re-add stays a no-op."""
    t = str(tmp_path / "t")
    f1 = _commit_files(spark, os.path.join(t, "data", "c1"), 0, 10)
    assert occ_commit(t, {"a": f1}, base_version=0) == 1
    # the same-commit spelling (one path under two partitions) is
    # refused outright — always a caller bug
    with pytest.raises(ValueError, match="exactly one partition"):
        occ_commit(t, {"b": [f1[0]], "a": list(f1)}, base_version=1)
    # across commits: same-partition re-add is a fold no-op, while the
    # cross-partition add genuinely joins the snapshot and is reported
    assert occ_commit(t, {"a": list(f1)}, base_version=1) == 2
    assert snapshot_changes_files(t, 1, 2) == []
    assert occ_commit(t, {"b": [f1[0]]}, base_version=2) == 3
    rel = snapshot_changes_files(t, 2, 3)
    assert rel == [os.path.relpath(f1[0], t)]


# ---------------------------------------------------------------------------
# occ_compact_partitions (plans/maintenance.py): the rewrite_data_files
# sweep. Contract under test: content-identical rewrite, per-partition
# commits, conflict -> skip + intact staging cleanup + next-cadence
# retry, unknown-column healing, and the refusal edges.
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from automated_dow30_earnings_reports_spark.plans.maintenance import (  # noqa: E402
    _snapshot_state,
    occ_compact_partitions,
    read_snapshot,
)


def _frag_table(spark, t, parts=("a",), n_files=4):
    adds = {}
    for i, p in enumerate(parts):
        out = os.path.join(t, "data", f"load-{p}")
        spark.range(i * 100, i * 100 + 40).selectExpr(
            "id AS doc_id"
        ).repartition(n_files).write.mode("overwrite").parquet(out)
        adds[p] = sorted(
            os.path.join(out, f)
            for f in os.listdir(out)
            if f.endswith(".parquet")
        )
    assert occ_commit(t, adds, base_version=0, columns=["doc_id"]) == 1
    return adds


def test_compaction_is_content_identical_and_time_travel_safe(spark, tmp_path):
    t = str(tmp_path / "t")
    _frag_table(spark, t, parts=("a", "b"), n_files=4)
    before = _ids(read_snapshot(spark, t, 1))
    report = occ_compact_partitions(spark, t)
    assert report["compacted"] == ["a", "b"]
    assert report["head_after"] == 3  # one commit per partition
    assert report["files_before"] == 8 and report["files_after"] == 2
    assert _ids(read_snapshot(spark, t, 3)) == before
    assert _ids(read_snapshot(spark, t, 1)) == before  # time travel intact
    parts, _stats, cols = _snapshot_state(t, 3)
    assert sorted(len(fs) for fs in parts.values()) == [1, 1]
    assert cols == {"doc_id"}


def test_compaction_conflict_skips_partition_and_retries_clean(spark, tmp_path):
    t = str(tmp_path / "t")
    _frag_table(spark, t, parts=("a",), n_files=4)

    def _race(p):
        out = os.path.join(t, "data", "racer")
        spark.range(500, 510).selectExpr("id AS doc_id").write.mode(
            "overwrite"
        ).parquet(out)
        fs = sorted(
            os.path.join(out, f)
            for f in os.listdir(out)
            if f.endswith(".parquet")
        )
        assert occ_commit(t, {"a": fs}, base_version=1) == 2

    report = occ_compact_partitions(spark, t, _pre_commit=_race)
    assert report["compacted"] == []
    assert report["skipped_conflict"] == ["a"]
    # the racer's rows are intact and the staged sweep files are gone
    assert _ids(read_snapshot(spark, t, 2)) == list(range(40)) + list(
        range(500, 510)
    )
    assert not [
        d
        for d in os.listdir(os.path.join(t, "data"))
        if d.startswith("compact-")
    ]
    # next cadence compacts the merged content cleanly
    report = occ_compact_partitions(spark, t)
    assert report["compacted"] == ["a"] and report["head_after"] == 3
    assert _ids(read_snapshot(spark, t, 3)) == list(range(40)) + list(
        range(500, 510)
    )


def test_compaction_heals_unknown_column_metadata(spark, tmp_path):
    t = str(tmp_path / "t")
    out = os.path.join(t, "data", "load")
    spark.range(0, 40).selectExpr("id AS doc_id").repartition(4).write.mode(
        "overwrite"
    ).parquet(out)
    fs = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    )
    assert occ_commit(t, {"a": fs}, base_version=0) == 1  # undeclared
    assert _snapshot_state(t, 1)[2] is None  # columns unknown
    report = occ_compact_partitions(spark, t)
    assert report["compacted"] == ["a"]
    assert _snapshot_state(t, 2)[2] == {"doc_id"}  # healed from the rewrite


def test_compaction_refusals_and_noop_edges(spark, tmp_path):
    t = str(tmp_path / "t")
    _frag_table(spark, t, parts=("a",), n_files=4)
    with pytest.raises(ValueError, match="not in snapshot"):
        occ_compact_partitions(spark, t, partitions=["ghost"])
    with pytest.raises(ValueError, match="target_files"):
        occ_compact_partitions(spark, t, target_files=0)
    # already at/below target: a no-op sweep commits nothing
    report = occ_compact_partitions(spark, t, max_files=4)
    assert report["compacted"] == [] and report["head_after"] == 1
    report = occ_compact_partitions(spark, t, target_files=2)
    assert report["compacted"] == ["a"] and report["files_after"] <= 2


def test_compaction_refuses_legacy_pseudo_partition(spark, tmp_path):
    t = str(tmp_path / "t")
    out = os.path.join(t, "data", "legacy")
    spark.range(0, 10).selectExpr("id AS doc_id").repartition(2).write.mode(
        "overwrite"
    ).parquet(out)
    fs = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    )
    seal_manifest(t, 1, fs)  # bootstrap: files live under ''
    with pytest.raises(ValueError, match="pseudo-partition"):
        occ_compact_partitions(spark, t, partitions=[""])


def test_compaction_preserves_evolved_column_in_mixed_partition(spark, tmp_path):
    """A partition whose files span schema generations is rewritten
    with the UNION schema (mergeSchema always): the evolved column's
    values survive and the commit declares the true live set."""
    t = str(tmp_path / "t")
    f1 = _commit_files(spark, os.path.join(t, "data", "c1"), 0, 10)
    assert occ_commit(t, {"a": f1}, base_version=0, columns=["doc_id"]) == 1
    f2 = _commit_files(spark, os.path.join(t, "data", "c2"), 10, 20, extra="score")
    assert (
        occ_commit(t, {"a": f2}, base_version=1, columns=["doc_id", "score"])
        == 2
    )
    report = occ_compact_partitions(spark, t)
    assert report["compacted"] == ["a"] and report["files_after"] == 1
    df = read_snapshot(spark, t, 3)
    assert set(df.columns) == {"doc_id", "score"}
    rows = {r.doc_id: r.score for r in df.collect()}
    assert len(rows) == 20
    assert all(rows[i] is None for i in range(10))
    assert all(rows[i] == i * 10 for i in range(10, 20))
    assert _snapshot_state(t, 3)[2] == {"doc_id", "score"}


def test_compaction_carries_existing_bounds_forward(spark, tmp_path):
    """A routine sweep without stats_cols must not destroy the
    partition's file-skipping bounds — the content-identical rewrite
    keeps them valid."""
    t = str(tmp_path / "t")
    f1 = _commit_files(spark, os.path.join(t, "data", "c1"), 0, 20)
    assert (
        occ_commit(
            t,
            {"a": f1},
            base_version=0,
            columns=["doc_id"],
            stats={"a": {"doc_id": [0, 19]}},
        )
        == 1
    )
    f2 = _commit_files(spark, os.path.join(t, "data", "c2"), 20, 40)
    assert (
        occ_commit(
            t,
            {"a": f2},
            base_version=1,
            columns=["doc_id"],
            stats={"a": {"doc_id": [20, 39]}},
        )
        == 2
    )
    report = occ_compact_partitions(spark, t)  # no stats_cols
    assert report["compacted"] == ["a"]
    from automated_dow30_earnings_reports_spark.plans.maintenance import (
        _snapshot_maps,
    )

    _parts, stats, _pcols = _snapshot_maps(t, 3)
    assert stats.get("a", {}).get("doc_id") == [0, 39]
    # and an explicit stats_cols recompute tightens on top of carry
    f3 = _commit_files(spark, os.path.join(t, "data", "c3"), 5, 6)
    assert occ_commit(t, {"a": f3}, base_version=3, columns=["doc_id"]) == 4
    report = occ_compact_partitions(spark, t, stats_cols=["doc_id"])
    _parts, stats, _pcols = _snapshot_maps(t, 5)
    assert stats.get("a", {}).get("doc_id") == [0, 39]


def test_compaction_auto_sweep_skips_legacy_partition(spark, tmp_path):
    """A mixed legacy table still gets its named partitions compacted:
    the auto sweep skips '' instead of refusing everything."""
    t = str(tmp_path / "t")
    out = os.path.join(t, "data", "legacy")
    spark.range(0, 10).selectExpr("id AS doc_id").repartition(3).write.mode(
        "overwrite"
    ).parquet(out)
    legacy = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    )
    seal_manifest(t, 1, legacy)  # '' holds 3 files
    out2 = os.path.join(t, "data", "c2")
    spark.range(100, 140).selectExpr("id AS doc_id").repartition(
        4
    ).write.mode("overwrite").parquet(out2)
    f2 = sorted(
        os.path.join(out2, f)
        for f in os.listdir(out2)
        if f.endswith(".parquet")
    )
    assert occ_commit(t, {"a": f2}, base_version=1) == 2
    report = occ_compact_partitions(spark, t)
    assert report["compacted"] == ["a"]
    assert _ids(read_snapshot(spark, t, 3)) == list(range(10)) + list(
        range(100, 140)
    )


def test_compaction_with_sort_cols_clusters_files_by_range(spark, tmp_path):
    """sort_cols + target_files>1 range-clusters the rewrite: same
    rows, and each output file owns a disjoint doc_id range (tight
    per-file footer stats — the OPTIMIZE ZORDER-lite layout)."""
    t = str(tmp_path / "t")
    out = os.path.join(t, "data", "c1")
    # shuffled load: ids deliberately scattered across input files
    spark.range(0, 400).selectExpr("id AS doc_id").orderBy(
        F.md5(F.col("doc_id").cast("string"))
    ).repartition(8).write.mode("overwrite").parquet(out)
    fs = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    )
    assert occ_commit(t, {"a": fs}, base_version=0, columns=["doc_id"]) == 1

    report = occ_compact_partitions(
        spark, t, target_files=4, sort_cols=["doc_id"]
    )
    assert report["compacted"] == ["a"]
    assert _ids(read_snapshot(spark, t, 2)) == list(range(400))
    from automated_dow30_earnings_reports_spark.plans.maintenance import (
        _snapshot_parts,
    )

    files = _snapshot_parts(t, 2)["a"]
    assert len(files) <= 4
    spans = []
    for f in files:
        rows = spark.read.parquet(os.path.join(t, f)).agg(
            F.min("doc_id"), F.max("doc_id")
        ).collect()[0]
        if rows[0] is not None:
            spans.append((rows[0], rows[1]))
    spans.sort()
    assert len(spans) >= 2  # genuinely split across files
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2  # disjoint ranges: tight, non-overlapping stats
    with pytest.raises(ValueError, match="sort_cols"):
        occ_compact_partitions(spark, t, sort_cols=["ghost"])


# ---------------------------------------------------------------------------
# Per-FILE column bounds in commit metadata (occ_commit file_stats /
# _apply_delta fstats / pruned_snapshot_files file-grain skipping) —
# Iceberg's per-data-file stats. Files are immutable so the fold is
# pop-with-partition + install-on-fresh-add; pruning must stay an
# over-approximation (stat-less files always kept).
# ---------------------------------------------------------------------------

from automated_dow30_earnings_reports_spark.plans.maintenance import (  # noqa: E402
    _snapshot_maps,
    checkpoint_snapshot,
    pruned_snapshot_files,
    read_snapshot_where,
)


def test_file_stats_fold_checkpoint_and_file_grain_pruning(spark, tmp_path):
    t = str(tmp_path / "t")
    f1 = _commit_files(spark, os.path.join(t, "data", "c1"), 0, 10)
    f2 = _commit_files(spark, os.path.join(t, "data", "c2"), 100, 110)
    rel1, rel2 = (os.path.relpath(f[0], t) for f in (f1, f2))
    assert (
        occ_commit(
            t,
            {"a": f1 + f2},
            base_version=0,
            columns=["doc_id"],
            stats={"a": {"doc_id": [0, 109]}},
            file_stats={rel1: {"doc_id": [0, 9]}, rel2: {"doc_id": [100, 109]}},
        )
        == 1
    )
    # file-grain skip inside a KEPT partition: probe [0, 50] drops f2
    kept, pruned = pruned_snapshot_files(t, 1, "doc_id", 0, 50)
    assert kept == [rel1] and pruned == 0
    # over-approximation: a third, stat-less file is always kept
    f3 = _commit_files(spark, os.path.join(t, "data", "c3"), 200, 210)
    rel3 = os.path.relpath(f3[0], t)
    assert occ_commit(t, {"a": f3}, base_version=1, columns=["doc_id"]) == 2
    kept, _ = pruned_snapshot_files(t, 2, "doc_id", 0, 50)
    assert kept == sorted([rel1, rel3])
    # the residual predicate still filters the kept stat-less file
    assert _ids(read_snapshot_where(spark, t, 2, "doc_id", 0, 50)) == list(
        range(10)
    )
    # checkpoint roundtrip preserves the per-file bounds
    checkpoint_snapshot(t, 2)
    fstats: dict = {}
    _snapshot_maps(t, 2, fstats)
    assert fstats == {
        rel1: {"doc_id": [0, 9]},
        rel2: {"doc_id": [100, 109]},
    }
    # a rewrite drops the popped partition's file entries with it
    f4 = _commit_files(spark, os.path.join(t, "data", "c4"), 0, 5)
    assert occ_commit(t, {"a": f4}, ("a",), base_version=2, columns=["doc_id"]) == 3
    fstats = {}
    _snapshot_maps(t, 3, fstats)
    assert fstats == {}


def test_file_stats_for_unadded_file_refused(spark, tmp_path):
    t = str(tmp_path / "t")
    f1 = _commit_files(spark, os.path.join(t, "data", "c1"), 0, 10)
    with pytest.raises(ValueError, match="not among this commit"):
        occ_commit(
            t,
            {"a": f1},
            base_version=0,
            file_stats={"data/ghost.parquet": {"doc_id": [0, 1]}},
        )


def test_clustered_compaction_seals_tight_per_file_bounds(spark, tmp_path):
    t = str(tmp_path / "t")
    out = os.path.join(t, "data", "c1")
    spark.range(0, 400).selectExpr("id AS doc_id").orderBy(
        F.md5(F.col("doc_id").cast("string"))
    ).repartition(8).write.mode("overwrite").parquet(out)
    fs = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    )
    assert occ_commit(t, {"a": fs}, base_version=0, columns=["doc_id"]) == 1
    report = occ_compact_partitions(
        spark, t, target_files=4, sort_cols=["doc_id"], stats_cols=["doc_id"]
    )
    assert report["compacted"] == ["a"]
    fstats: dict = {}
    parts, stats, _pcols = _snapshot_maps(t, 2, fstats)
    files = parts["a"]
    spans = sorted(fstats[f]["doc_id"] for f in files)
    assert len(spans) == len(files) >= 2
    for (a_lo, a_hi), (b_lo, _b_hi) in zip(spans, spans[1:]):
        assert a_hi < b_lo  # disjoint: the clustering made stats tight
    # partition bounds = fold of the file bounds
    assert stats["a"]["doc_id"] == [spans[0][0], spans[-1][1]]
    # a narrow probe plans exactly one file, and reads exactly its rows
    lo, hi = spans[0]
    kept, _ = pruned_snapshot_files(t, 2, "doc_id", lo, hi)
    assert len(kept) == 1
    assert _ids(read_snapshot_where(spark, t, 2, "doc_id", lo, hi)) == list(
        range(lo, hi + 1)
    )


def test_per_partition_column_declarations(spark, tmp_path):
    """A heterogeneous multi-partition commit declares columns as a
    dict — each partition gets exactly ITS set, so a covering union
    cannot poison the narrower partition with a column its files
    never held (the zombie-column merge deadlock), and a later
    rewrite dropping the column genuinely forgets it table-wide."""
    t = str(tmp_path / "t")
    fa = _commit_files(spark, os.path.join(t, "data", "ca"), 0, 10)
    fb = _commit_files(spark, os.path.join(t, "data", "cb"), 10, 20, extra="score")
    assert (
        occ_commit(
            t,
            {"a": fa, "b": fb},
            base_version=0,
            columns={"a": ["doc_id"], "b": ["doc_id", "score"]},
        )
        == 1
    )
    assert _snapshot_state(t, 1)[2] == {"doc_id", "score"}
    fstats_unused: dict = {}
    _parts, _stats, pcols = _snapshot_maps(t, 1, fstats_unused)
    assert pcols == {"a": {"doc_id"}, "b": {"doc_id", "score"}}
    # rewrite b without score: the table-level set must FORGET score
    # (partition a never claimed it — the exact point of the grain)
    fb2 = _commit_files(spark, os.path.join(t, "data", "cb2"), 10, 20)
    assert (
        occ_commit(t, {"b": fb2}, ("b",), base_version=1, columns=["doc_id"])
        == 2
    )
    assert _snapshot_state(t, 2)[2] == {"doc_id"}
    # declaring a partition the commit does not add is refused
    fc = _commit_files(spark, os.path.join(t, "data", "cc"), 20, 30)
    with pytest.raises(ValueError, match="does not add"):
        occ_commit(
            t,
            {"c": fc},
            base_version=2,
            columns={"c": ["doc_id"], "ghost": ["doc_id"]},
        )


def test_in_list_duplicate_add_is_deduped(spark, tmp_path):
    """A path listed twice in ONE partition's add is an unambiguous
    'add once' — deduped at commit time, so the snapshot can never
    double the file's rows (cross-partition duplication stays loudly
    refused; the prior-snapshot re-add stays a fold no-op)."""
    t = str(tmp_path / "t")
    f1 = _commit_files(spark, os.path.join(t, "data", "c1"), 0, 10)
    assert occ_commit(t, {"a": [f1[0], f1[0]]}, base_version=0) == 1
    from automated_dow30_earnings_reports_spark.plans.maintenance import (
        _snapshot_parts,
    )

    assert _snapshot_parts(t, 1)["a"] == [os.path.relpath(f1[0], t)]
    assert _ids(read_snapshot(spark, t, 1)) == list(range(10))
