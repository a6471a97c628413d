"""Round-9 surface: stamped TTL swap protocol (request-change safety),
segmented OCC manifests in the registered lifecycle, and the
ledger-compaction / index-vacuum verbs added this round.

The TTL tests pin the r8 ADVICE fix: a staged boundary rewrite carries
a content hash of the request that built it, the swap is two atomic
renames (never an rmtree of the only live copy), and recovery rolls a
crashed swap FORWARD only for the same request — a stage left by a
superseded cutoff/predicate is rolled BACK, never installed over a
complete partition.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.plans import maintenance as m

SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "r9_ttl",
)


def _build(spark, path):
    shutil.rmtree(path, ignore_errors=True)
    df = spark.createDataFrame(
        [(1997, 1, "expired"), (1998, 2, "old"), (1998, 9, "keep"),
         (1999, 5, "fresh")],
        "y int, month int, tag string",
    )
    df.repartition(F.col("y")).write.partitionBy("y").parquet(path)


def _tags(spark, path):
    return sorted(r.tag for r in spark.read.parquet(path).collect())


def _stage_with_stamp(spark, path, pred, cutoff_year):
    """Write a completed, stamped stage exactly as enforce_ttl would."""
    stage = os.path.join(path, ".ttl-stage-1998")
    spark.read.parquet(os.path.join(path, "y=1998")).where(pred).write.parquet(
        stage
    )
    with open(os.path.join(stage, m._TTL_STAMP), "w") as fh:
        fh.write(m._ttl_request_stamp(cutoff_year, pred))
    return stage


def test_ttl_stale_stage_is_never_installed_over_complete_live(spark):
    # ADVICE r8: a leftover stage from an earlier run with a different
    # predicate (e.g. TTL_CUTOFF bumped between scheduled runs) must
    # not install stale survivors over a complete live partition.
    path = os.path.join(SCRATCH, "stale_live")
    _build(spark, path)
    old_pred = F.col("month") >= 10  # old request would drop 'keep' (month 9)
    stage = _stage_with_stamp(spark, path, old_pred, 1998)
    # new run, new predicate: month >= 4 keeps 'keep'
    m.enforce_ttl(spark, path, "y", 1998, F.col("month") >= 4)
    assert _tags(spark, path) == ["fresh", "keep"]
    assert not os.path.isdir(stage)


def test_ttl_stale_stage_mid_swap_rolls_back_then_applies_new_request(spark):
    # crash state: old run renamed live -> .ttl-old and died before
    # installing its (stale) stage. Recovery must restore the pre-swap
    # live and re-filter it under the CURRENT request.
    path = os.path.join(SCRATCH, "stale_midswap")
    _build(spark, path)
    old_pred = F.col("month") >= 10
    stage = _stage_with_stamp(spark, path, old_pred, 1998)
    os.rename(os.path.join(path, "y=1998"), os.path.join(path, ".ttl-old-1998"))
    m.enforce_ttl(spark, path, "y", 1998, F.col("month") >= 4)
    assert _tags(spark, path) == ["fresh", "keep"]
    assert not os.path.isdir(stage)
    assert not os.path.isdir(os.path.join(path, ".ttl-old-1998"))


def test_ttl_same_request_stage_rolls_forward_from_both_crash_windows(spark):
    pred = F.col("month") >= 4
    # window 1: stage+stamp complete, live intact (crash before rename1)
    path = os.path.join(SCRATCH, "fwd_pre")
    _build(spark, path)
    _stage_with_stamp(spark, path, pred, 1998)
    m.enforce_ttl(spark, path, "y", 1998, pred)
    assert _tags(spark, path) == ["fresh", "keep"]
    # window 2: live renamed away, stage not yet installed
    path = os.path.join(SCRATCH, "fwd_mid")
    _build(spark, path)
    _stage_with_stamp(spark, path, pred, 1998)
    os.rename(os.path.join(path, "y=1998"), os.path.join(path, ".ttl-old-1998"))
    m.enforce_ttl(spark, path, "y", 1998, pred)
    assert _tags(spark, path) == ["fresh", "keep"]
    assert not os.path.isdir(os.path.join(path, ".ttl-old-1998"))


def test_ttl_orphan_old_dir_with_live_is_superseded_debris(spark):
    # crash after rename2 but mid-rmtree(old): live holds the new
    # survivors, the old copy is debris — recovery removes it and the
    # main pass re-runs the (idempotent) boundary rewrite.
    path = os.path.join(SCRATCH, "orphan_old")
    _build(spark, path)
    pred = F.col("month") >= 4
    m.enforce_ttl(spark, path, "y", 1998, pred)
    # fabricate the debris: a stale copy of the partition beside live
    live = os.path.join(path, "y=1998")
    old = os.path.join(path, ".ttl-old-1998")
    shutil.copytree(live, old)
    m.enforce_ttl(spark, path, "y", 1998, pred)
    assert _tags(spark, path) == ["fresh", "keep"]
    assert not os.path.isdir(old)


def test_ttl_request_stamp_distinguishes_requests():
    a = m._ttl_request_stamp(1998, F.col("month") >= 4)
    assert a == m._ttl_request_stamp(1998, F.col("month") >= 4)
    assert a != m._ttl_request_stamp(1999, F.col("month") >= 4)
    assert a != m._ttl_request_stamp(1998, F.col("month") >= 5)


def test_ttl_write_dir_is_always_discarded(spark):
    # finding: a crash between the stage's parquet write and the stamp
    # used to leave a stampless .ttl-stage that recovery mistook for a
    # legacy stage and installed under a CHANGED request. The stage is
    # now built under .ttl-write-<year> and renamed only after the
    # stamp is durable — a leftover write dir (even one with _SUCCESS)
    # is incomplete by construction and must be discarded, with the
    # current request recomputed from the intact live partition.
    path = os.path.join(SCRATCH, "write_dir")
    _build(spark, path)
    wip = os.path.join(path, ".ttl-write-1998")
    # old request's survivors, fully written (with _SUCCESS), no stamp,
    # crash before the rename to .ttl-stage-1998
    spark.read.parquet(os.path.join(path, "y=1998")).where(
        F.col("month") >= 10
    ).write.parquet(wip)
    assert os.path.exists(os.path.join(wip, "_SUCCESS"))
    m.enforce_ttl(spark, path, "y", 1998, F.col("month") >= 4)
    assert _tags(spark, path) == ["fresh", "keep"]  # NOT the old request's cut
    assert not os.path.isdir(wip)
    assert not os.path.isdir(os.path.join(path, ".ttl-stage-1998"))


def test_vacuum_retention_spares_young_sidecars_and_dirs(spark, tmp_path):
    # finding: the retention window must extend to _SUCCESS/.crc
    # sidecars and fresh empty dirs — an in-flight writer's
    # completeness marker vanishing mid-commit is a torn write.
    import time as _time

    t = str(tmp_path / "occ_sidecars")
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    files = m._tt_commit(df.coalesce(1), os.path.join(t, "data"), "c1")
    m.occ_commit(t, {"p0": files}, base_version=0)
    # in-flight writer: fresh parquet + fresh _SUCCESS + fresh empty dir
    inflight = os.path.join(t, "data", "c-inflight")
    os.makedirs(os.path.join(t, "data", "c-empty"))
    m._tt_commit(df.coalesce(1), os.path.join(t, "data"), "c-inflight")
    # abandoned writer: everything backdated
    dead = m._tt_commit(df.coalesce(1), os.path.join(t, "data"), "c-dead")
    old = _time.time() - 7200
    for dp, dirs, fs in os.walk(os.path.join(t, "data", "c-dead")):
        for f in fs:
            os.utime(os.path.join(dp, f), (old, old))
    os.utime(os.path.join(t, "data", "c-dead"), (old, old))

    report = m.vacuum_unreferenced(t, min_age_seconds=3600)
    assert report["data_files_removed"] == len(dead)
    # the in-flight writer's tree is fully intact, marker included
    assert os.path.exists(os.path.join(inflight, "_SUCCESS"))
    assert all(os.path.exists(f) for f in
               (os.path.join(inflight, f) for f in os.listdir(inflight)))
    assert os.path.isdir(os.path.join(t, "data", "c-empty"))
    # a later vacuum past the window reclaims the empty dir
    os.utime(os.path.join(t, "data", "c-empty"), (old, old))
    report2 = m.vacuum_unreferenced(t, min_age_seconds=3600)
    assert not os.path.isdir(os.path.join(t, "data", "c-empty"))
    assert report2["dirs_removed"] >= 1


def test_kvlinks_legacy_offset_relists_on_vanished_file(tmp_path):
    # finding: a file deleted between the listing and the stat must be
    # handled by RE-LISTING (transient race), never by a placeholder
    # mtime that silently mis-partitions the committed prefix; a
    # persistent stat failure still raises.
    from automated_dow30_earnings_reports_spark.sources.kv_datasource import (
        KVLinksStreamReader,
    )

    d = tmp_path / "landing"
    d.mkdir()
    now = 1_700_000_000
    for i, name in enumerate(["b.txt", "c.txt", "d.txt", "e.txt"]):
        p = d / name
        p.write_text("url='https://x/1.pdf'\n")
        os.utime(p, (now + i, now + i))

    reader = KVLinksStreamReader.__new__(KVLinksStreamReader)
    reader.path = str(d)

    # transient vanish: first listing includes a ghost that the stat
    # can't see; the retry's fresh listing is consistent
    calls = {"n": 0}

    def files_with_ghost():
        calls["n"] += 1
        out = KVLinksStreamReader._files(reader)
        if calls["n"] == 1:
            out = out + [str(d / "ghost.txt")]
        return out

    reader._files = files_with_ghost
    seen = reader._seen({"n_files": 3})
    assert seen == {"b.txt", "c.txt", "d.txt"}
    assert calls["n"] == 2

    # persistent failure: both listings contain the unstattable file
    reader._files = lambda: KVLinksStreamReader._files(reader) + [
        str(d / "ghost.txt")
    ]
    with pytest.raises(OSError):
        reader._seen({"n_files": 3})
