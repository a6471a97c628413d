"""Optimistic-concurrency commit protocol over the manifest-pinned
table (plans/maintenance.py: occ_commit / _cas_seal / vacuum_unreferenced).

The single-writer seal_manifest os.replace's its manifest — two racing
writers would be silent last-writer-wins. These tests pin the OCC
replacement: the seal is create-exclusive, losers rebase (disjoint
work) or fail loudly (overlapping rewrites), aborted commits stay
invisible to every snapshot and are reclaimable by vacuum.
"""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.plans import maintenance as m


def _commit_files(spark, table, name, keys):
    """One commit's immutable data files holding the given keys."""
    df = spark.createDataFrame([(k, f"val-{k}") for k in keys], "k int, v string")
    return m._tt_commit(df.coalesce(1), os.path.join(table, "data"), name)


def _snapshot_keys(spark, table, version):
    return sorted(
        r.k for r in m.read_snapshot(spark, str(table), version).select("k").collect()
    )


@pytest.fixture()
def table(spark, tmp_path):
    """v1 = one OCC append of partition p0 (keys 0-4)."""
    t = str(tmp_path / "occ_table")
    files = _commit_files(spark, t, "c-base", range(5))
    assert m.occ_commit(t, {"p0": files}, base_version=0) == 1
    assert m.current_version(t) == 1
    return t


def test_append_append_rebase(spark, table):
    # A and B both prepared on v1; A seals v2 first, B's commit finds
    # the newer head and rebases — no error, both deltas visible.
    fa = _commit_files(spark, table, "c-a", range(10, 13))
    fb = _commit_files(spark, table, "c-b", range(20, 23))
    assert m.occ_commit(table, {"pA": fa}, base_version=1) == 2
    assert m.occ_commit(table, {"pB": fb}, base_version=1) == 3
    assert _snapshot_keys(spark, table, 3) == [0, 1, 2, 3, 4, 10, 11, 12, 20, 21, 22]
    # snapshot isolation: v2 still reads A-only, v1 still base-only
    assert _snapshot_keys(spark, table, 2) == [0, 1, 2, 3, 4, 10, 11, 12]
    assert _snapshot_keys(spark, table, 1) == [0, 1, 2, 3, 4]


def test_rewrite_rewrite_same_partition_conflicts(spark, table):
    fa = _commit_files(spark, table, "c-a", range(100, 103))
    fb = _commit_files(spark, table, "c-b", range(200, 203))
    assert m.occ_commit(table, {"p0": fa}, replaces=["p0"], base_version=1) == 2
    with pytest.raises(m.CommitConflictError, match="p0"):
        m.occ_commit(table, {"p0": fb}, replaces=["p0"], base_version=1)
    # the loser changed nothing: head is still the winner's commit
    assert m.current_version(table) == 2
    assert _snapshot_keys(spark, table, 2) == [100, 101, 102]


def test_rewrite_vs_disjoint_append_rebases(spark, table):
    fa = _commit_files(spark, table, "c-a", range(10, 12))  # appends pA
    fb = _commit_files(spark, table, "c-b", range(300, 302))  # rewrites p0
    assert m.occ_commit(table, {"pA": fa}, base_version=1) == 2
    assert m.occ_commit(table, {"p0": fb}, replaces=["p0"], base_version=1) == 3
    assert _snapshot_keys(spark, table, 3) == [10, 11, 300, 301]


def test_rewrite_of_concurrently_appended_partition_conflicts(spark, table):
    # winner appends INTO p0; loser's rewrite of p0 was based on v1 and
    # would silently drop the winner's rows — must refuse.
    fa = _commit_files(spark, table, "c-a", range(10, 12))
    fb = _commit_files(spark, table, "c-b", range(300, 302))
    assert m.occ_commit(table, {"p0": fa}, base_version=1) == 2
    with pytest.raises(m.CommitConflictError):
        m.occ_commit(table, {"p0": fb}, replaces=["p0"], base_version=1)


def test_threaded_cas_race_serializes_both_appends(spark, table):
    # Two writers race the seal itself: both may list head=1 before
    # either links v2. The loser's os.link fails atomically and its
    # retry loop rebases — both commits land, versions serialize.
    fa = _commit_files(spark, table, "c-a", range(10, 13))
    fb = _commit_files(spark, table, "c-b", range(20, 23))
    results, errors = {}, []
    barrier = threading.Barrier(2)

    def commit(name, files, part):
        try:
            barrier.wait()
            results[name] = m.occ_commit(table, {part: files}, base_version=1)
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    ta = threading.Thread(target=commit, args=("a", fa, "pA"))
    tb = threading.Thread(target=commit, args=("b", fb, "pB"))
    ta.start(), tb.start()
    ta.join(), tb.join()
    assert not errors
    assert sorted(results.values()) == [2, 3]
    assert _snapshot_keys(spark, table, 3) == [0, 1, 2, 3, 4, 10, 11, 12, 20, 21, 22]


def test_adopts_legacy_seal_manifest_table(spark, tmp_path):
    # A table bootstrapped by the single-writer path (manifest has only
    # "files") accepts OCC appends on top without history rewrites;
    # a rewrite cannot prove disjointness against the legacy commit
    # when racing it, but a rewrite based ON it is fine.
    t = str(tmp_path / "legacy")
    f1 = _commit_files(spark, t, "c1", range(3))
    m.seal_manifest(t, 1, f1)
    f2 = _commit_files(spark, t, "c2", range(10, 12))
    assert m.occ_commit(t, {"pA": f2}, base_version=1) == 2
    assert _snapshot_keys(spark, t, 2) == [0, 1, 2, 10, 11]
    # legacy files live under the unnamed partition; replacing it works
    f3 = _commit_files(spark, t, "c3", range(50, 52))
    assert m.occ_commit(t, {"": f3}, replaces=[""], base_version=2) == 3
    assert _snapshot_keys(spark, t, 3) == [10, 11, 50, 51]
    # ...but a rewrite BASED BEFORE the legacy commit conflicts (its
    # touched-set is unknowable, so disjointness can't be proven)
    t2 = str(tmp_path / "legacy2")
    f4 = _commit_files(spark, t2, "c4", range(60, 62))
    fa = _commit_files(spark, t2, "c1", range(3))
    assert m.occ_commit(t2, {"p0": fa}, base_version=0) == 1
    m.seal_manifest(t2, 2, _commit_files(spark, t2, "c2", range(5, 8)))
    with pytest.raises(m.CommitConflictError):
        m.occ_commit(t2, {"p0": f4}, replaces=["p0"], base_version=1)


def test_crash_mid_seal_leaves_no_version_and_vacuum_reclaims(spark, table):
    # a writer that died after its data write but before (or during)
    # the seal: data files exist, maybe a torn CAS tmp exists — no
    # reader sees any of it, and vacuum removes exactly the garbage.
    dead = _commit_files(spark, table, "c-dead", range(900, 905))
    mdir = os.path.join(table, "manifests")
    with open(os.path.join(mdir, "v2.json.tmp-999-0"), "w") as fh:
        fh.write('{"files": ["torn')  # torn tmp from the dead writer
    assert m.current_version(table) == 1
    assert _snapshot_keys(spark, table, 1) == [0, 1, 2, 3, 4]
    live_before = {
        f for fs in m._snapshot_parts(table, 1).values() for f in fs
    }
    report = m.vacuum_unreferenced(table)
    assert report["data_files_removed"] == len(dead)
    assert report["tmp_files_removed"] == 1
    for f in dead:
        assert not os.path.exists(f)
    # every referenced file survived; v1 still reads
    for rel in live_before:
        assert os.path.exists(os.path.join(table, rel))
    assert _snapshot_keys(spark, table, 1) == [0, 1, 2, 3, 4]


def test_conflicted_writer_files_are_invisible_then_vacuumed(spark, table):
    fa = _commit_files(spark, table, "c-a", range(100, 103))
    fb = _commit_files(spark, table, "c-b", range(200, 203))
    assert m.occ_commit(table, {"p0": fa}, replaces=["p0"], base_version=1) == 2
    with pytest.raises(m.CommitConflictError):
        m.occ_commit(table, {"p0": fb}, replaces=["p0"], base_version=1)
    assert _snapshot_keys(spark, table, 2) == [100, 101, 102]
    report = m.vacuum_unreferenced(table)
    # exactly the loser's parquet files reclaimed — the winner's and
    # v1's (time travel!) stay
    assert report["data_files_removed"] == len(fb)
    assert _snapshot_keys(spark, table, 2) == [100, 101, 102]
    assert _snapshot_keys(spark, table, 1) == [0, 1, 2, 3, 4]


def test_lost_race_retries_are_bounded(spark, table, monkeypatch):
    # livelock guard: if the CAS loses forever, occ_commit fails loudly
    monkeypatch.setattr(m, "_cas_seal", lambda *a, **k: False)
    files = _commit_files(spark, table, "c-x", range(10, 12))
    with pytest.raises(RuntimeError, match="gave up"):
        m.occ_commit(table, {"pX": files}, base_version=1, max_attempts=3)


def test_manifest_payload_roundtrips_relative_paths(spark, table):
    # paths in manifests stay table-root-relative so the table can be
    # relocated wholesale (same contract as seal_manifest), and the
    # payload is the SEGMENTED delta only — embedding the snapshot's
    # full file list per version is the r8 O(snapshot)-per-commit
    # design this format replaced
    man = m._read_manifest(table, 1)
    assert man["replaces"] == [] and man["base"] == 0
    assert set(man["adds"]) == {"p0"}
    for fs in man["adds"].values():
        for f in fs:
            assert not os.path.isabs(f)
    assert "files" not in man and "parts" not in man
    assert json.dumps(man)  # fully JSON-serializable


def test_occ_protocol_randomized_model_check(tmp_path):
    """Seeded randomized interleavings of stale-based appends/rewrites
    against a dict model of the protocol: every successful commit must
    leave the manifest's partition map equal to the model's, conflicts
    must fire exactly when the model says the rewrite is unrebasable
    (a winner after the writer's base touched a replaced partition),
    versions must be gapless, and vacuum must reclaim exactly the
    never-referenced files. Pure metadata — occ_commit never opens
    data files — so hundreds of ops run in seconds."""
    import random

    for seed in range(5):
        rng = random.Random(seed)
        t = str(tmp_path / f"model-{seed}")
        os.makedirs(os.path.join(t, "data"), exist_ok=True)
        model: dict[str, list[str]] = {}
        touched_by_version: dict[int, set] = {}
        all_files: set[str] = set()
        referenced_ever: set[str] = set()
        file_seq = 0
        parts_pool = [f"p{i}" for i in range(4)]

        def new_files(n):
            nonlocal file_seq
            out = []
            for _ in range(n):
                rel = f"data/f{file_seq}.parquet"
                file_seq += 1
                with open(os.path.join(t, rel), "w"):
                    pass
                all_files.add(rel)
                out.append(rel)
            return out

        for _ in range(60):
            head = m.current_version(t)
            if head and rng.random() < 0.15:
                # a background maintenance checkpoint at a random point
                # must never change any snapshot's reconstruction
                m.checkpoint_snapshot(t, rng.randint(1, head))
            base = rng.randint(max(0, head - 3), head)  # possibly stale
            is_rewrite = rng.random() < 0.4 and model
            if is_rewrite:
                replaces = rng.sample(parts_pool, rng.randint(1, 2))
            else:
                replaces = []
            adds = {rng.choice(parts_pool): new_files(rng.randint(1, 2))}
            winners_touched = set()
            for w in range(base + 1, head + 1):
                winners_touched |= touched_by_version[w]
            expect_conflict = bool(set(replaces) & winners_touched)
            try:
                v = m.occ_commit(t, adds, replaces, base_version=base)
            except m.CommitConflictError:
                assert expect_conflict, (seed, base, head, replaces)
                continue
            assert not expect_conflict, (seed, base, head, replaces)
            assert v == head + 1  # gapless serialization
            for p in replaces:
                model.pop(p, None)
            for p, fs in adds.items():
                model[p] = model.get(p, []) + fs
            touched_by_version[v] = set(replaces) | set(adds)
            referenced_ever.update(f for fs in adds.values() for f in fs)
            snap = m._snapshot_parts(t, v)
            assert {p: sorted(fs) for p, fs in snap.items()} == {
                p: sorted(fs) for p, fs in model.items() if fs
            }
        # vacuum reclaims exactly the conflicted writers' files: a file
        # named by ANY sealed version stays (time travel), the rest go
        report = m.vacuum_unreferenced(t)
        survivors = {
            os.path.relpath(os.path.join(dp, f), t)
            for dp, _d, fs in os.walk(os.path.join(t, "data"))
            for f in fs
        }
        assert survivors == referenced_ever
        assert report["data_files_removed"] == len(all_files - referenced_ever)


# ---------------------------------------------------------------------------
# r9: segmented log — checkpoints, snapshot expiry, retention vacuum
# ---------------------------------------------------------------------------


def test_checkpoint_bounds_replay_and_changes_no_answer(spark, table):
    fa = _commit_files(spark, table, "c-a", range(10, 13))
    fb = _commit_files(spark, table, "c-b", range(20, 23))
    assert m.occ_commit(table, {"pA": fa}, base_version=1) == 2
    before = {v: _snapshot_keys(spark, table, v) for v in (1, 2)}
    assert m.checkpoint_snapshot(table) == 2
    assert os.path.exists(os.path.join(table, "manifests", "ckpt-v2.json"))
    # idempotent, and every version reads identically through it
    assert m.checkpoint_snapshot(table, 2) == 2
    for v, keys in before.items():
        assert _snapshot_keys(spark, table, v) == keys
    assert m.occ_commit(table, {"pB": fb}, base_version=2) == 3
    assert _snapshot_keys(spark, table, 3) == [0, 1, 2, 3, 4, 10, 11, 12, 20, 21, 22]
    # reconstruction at head replays only the post-checkpoint delta
    assert m._snapshot_parts(table, 3) == {
        **{p: fs for p, fs in m._snapshot_parts(table, 2).items()},
        "pB": [os.path.relpath(f, table) for f in fb],
    }


def test_expire_snapshots_retires_versions_and_frees_storage(spark, table):
    fa = _commit_files(spark, table, "c-a", range(100, 103))
    fb = _commit_files(spark, table, "c-b", range(20, 23))
    # v2 rewrites p0 (v1's files become exclusive to v1), v3 appends
    assert m.occ_commit(table, {"p0": fa}, replaces=["p0"], base_version=1) == 2
    assert m.occ_commit(table, {"pB": fb}, base_version=2) == 3
    v1_files = [
        os.path.join(table, f)
        for fs in m._snapshot_parts(table, 1).values()
        for f in fs
    ]
    before_v2 = _snapshot_keys(spark, table, 2)
    before_v3 = _snapshot_keys(spark, table, 3)
    report = m.expire_snapshots(table, keep_last=2)
    assert report["horizon"] == 2 and report["manifests_expired"] == 1
    # expired version unreadable; surviving versions answer identically
    with pytest.raises(FileNotFoundError):
        m.read_snapshot(spark, table, 1)
    assert _snapshot_keys(spark, table, 2) == before_v2
    assert _snapshot_keys(spark, table, 3) == before_v3
    # vacuum now reclaims exactly v1's exclusively-held files
    report = m.vacuum_unreferenced(table)
    assert report["data_files_removed"] == len(v1_files)
    for f in v1_files:
        assert not os.path.exists(f)
    assert _snapshot_keys(spark, table, 2) == before_v2
    assert _snapshot_keys(spark, table, 3) == before_v3
    # further commits continue the version sequence past the horizon
    fc = _commit_files(spark, table, "c-c", range(30, 32))
    assert m.occ_commit(table, {"pC": fc}, base_version=3) == 4
    assert _snapshot_keys(spark, table, 4) == sorted(before_v3 + [30, 31])


def test_expire_snapshots_crash_mid_expire_is_resumable(spark, table):
    fa = _commit_files(spark, table, "c-a", range(10, 12))
    fb = _commit_files(spark, table, "c-b", range(20, 22))
    assert m.occ_commit(table, {"pA": fa}, base_version=1) == 2
    assert m.occ_commit(table, {"pB": fb}, base_version=2) == 3
    want_v3 = _snapshot_keys(spark, table, 3)
    # crash state A: checkpoint at the horizon written, no manifest
    # deleted yet (crash between step 1 and step 2)
    m.checkpoint_snapshot(table, 2)
    assert _snapshot_keys(spark, table, 3) == want_v3
    # crash state B: one expired manifest deleted, the other still
    # present (crash mid-step-2) — surviving reads resolve via the
    # checkpoint, and a retry completes the expiry
    os.remove(os.path.join(table, "manifests", "v1.json"))
    assert _snapshot_keys(spark, table, 3) == want_v3
    assert _snapshot_keys(spark, table, 2) == sorted([0, 1, 2, 3, 4, 10, 11])
    report = m.expire_snapshots(table, keep_last=2)
    assert report["horizon"] == 2
    assert sorted(os.listdir(os.path.join(table, "manifests"))) == [
        "ckpt-v2.json",
        "v2.json",
        "v3.json",
    ]
    assert _snapshot_keys(spark, table, 3) == want_v3


def test_expire_keep_all_is_a_noop(spark, table):
    fa = _commit_files(spark, table, "c-a", range(10, 12))
    assert m.occ_commit(table, {"pA": fa}, base_version=1) == 2
    report = m.expire_snapshots(table, keep_last=5)
    assert report == {
        "horizon": 1,
        "manifests_expired": 0,
        "checkpoints_expired": 0,
    }
    assert _snapshot_keys(spark, table, 1) == [0, 1, 2, 3, 4]
    with pytest.raises(ValueError):
        m.expire_snapshots(table)  # exactly one selector required
    with pytest.raises(ValueError):
        m.expire_snapshots(table, keep_last=1, older_than=1)


def test_rewrite_based_below_expired_horizon_conflicts(spark, table):
    fa = _commit_files(spark, table, "c-a", range(10, 12))
    fb = _commit_files(spark, table, "c-b", range(20, 22))
    fx = _commit_files(spark, table, "c-x", range(90, 92))
    assert m.occ_commit(table, {"pA": fa}, base_version=1) == 2
    assert m.occ_commit(table, {"pB": fb}, base_version=2) == 3
    m.expire_snapshots(table, keep_last=1)
    # a rewrite whose base predates the horizon cannot prove its
    # conflict rule (the winner manifests are gone) — refused, while a
    # blind append (needs no winner scan) still lands
    with pytest.raises(m.CommitConflictError, match="retention horizon"):
        m.occ_commit(table, {"p0": fx}, replaces=["p0"], base_version=1)
    assert m.occ_commit(table, {"pX": fx}, base_version=1) == 4


def test_vacuum_retention_window_spares_inflight_writers(spark, table):
    # an unreferenced file with a FRESH mtime is possibly a concurrent
    # writer mid-commit: a retention-windowed vacuum spares it, while
    # durably-abandoned garbage (old mtime) is reclaimed
    dead = _commit_files(spark, table, "c-dead", range(900, 903))
    inflight = _commit_files(spark, table, "c-inflight", range(950, 953))
    old = __import__("time").time() - 7200
    for f in dead:
        os.utime(f, (old, old))
    report = m.vacuum_unreferenced(table, min_age_seconds=3600)
    assert report["data_files_removed"] == len(dead)
    assert report["young_files_spared"] >= len(inflight)
    for f in inflight:
        assert os.path.exists(f)
    # the spared writer seals later: its commit reads normally
    assert m.occ_commit(table, {"pI": inflight}, base_version=1) == 2
    assert _snapshot_keys(spark, table, 2) == [0, 1, 2, 3, 4, 950, 951, 952]


def test_rewrite_of_legacy_pseudo_partition_requires_explicit_target(
    spark, tmp_path
):
    # ADVICE r8 (medium): a rewrite naming a partition absent from the
    # snapshot while legacy partition-less commits hold files under ''
    # would pop nothing and keep the "replaced" files referenced
    # alongside the survivors — silent duplication. Must refuse.
    t = str(tmp_path / "legacy_guard")
    f1 = _commit_files(spark, t, "c1", range(3))
    m.seal_manifest(t, 1, f1)
    f2 = _commit_files(spark, t, "c2", range(50, 52))
    with pytest.raises(m.CommitConflictError, match="target ''"):
        m.occ_commit(t, {"hist": f2}, replaces=["hist"], base_version=1)
    # the explicit migration rewrite of '' works and deduplicates
    assert m.occ_commit(t, {"hist": f2}, replaces=[""], base_version=1) == 2
    assert _snapshot_keys(spark, t, 2) == [50, 51]
    # once migrated, named-partition rewrites proceed normally
    f3 = _commit_files(spark, t, "c3", range(60, 62))
    assert m.occ_commit(t, {"hist": f3}, replaces=["hist"], base_version=2) == 3
    assert _snapshot_keys(spark, t, 3) == [60, 61]


def test_occ_lifecycle_randomized_model_check(tmp_path):
    """The r9 lifecycle under seeded random interleavings: commits
    (stale-based appends/rewrites), background checkpoints, snapshot
    EXPIRY, and vacuum, against a dict model that keeps every
    version's frozen snapshot. Invariants at every step: surviving
    versions reconstruct exactly their frozen snapshot; expired
    versions are unreadable; a rewrite based below the horizon is
    refused (its winner manifests are gone); expiry re-runs asking to
    keep more than the surviving history are no-ops; and vacuum
    reclaims exactly the files no surviving version references. Pure
    metadata — runs in seconds."""
    import random

    for seed in range(5):
        rng = random.Random(1000 + seed)
        t = str(tmp_path / f"life-{seed}")
        os.makedirs(os.path.join(t, "data"), exist_ok=True)
        model: dict[str, list[str]] = {}
        history: dict[int, dict[str, list[str]]] = {}
        touched_by_version: dict[int, set] = {}
        all_files: set[str] = set()
        horizon = 1
        file_seq = 0
        parts_pool = [f"p{i}" for i in range(4)]

        def new_files(n):
            nonlocal file_seq
            out = []
            for _ in range(n):
                rel = f"data/f{file_seq}.parquet"
                file_seq += 1
                with open(os.path.join(t, rel), "w"):
                    pass
                all_files.add(rel)
                out.append(rel)
            return out

        def check_snapshots(head):
            for v in range(horizon, head + 1):
                snap = m._snapshot_parts(t, v)
                assert {p: sorted(fs) for p, fs in snap.items() if fs} == {
                    p: sorted(fs) for p, fs in history[v].items() if fs
                }, (seed, v, horizon)
            for v in range(1, horizon):
                assert not os.path.exists(
                    os.path.join(t, "manifests", f"v{v}.json")
                ), (seed, v)

        for step in range(80):
            head = m.current_version(t)
            roll = rng.random()
            if head and roll < 0.12:
                m.checkpoint_snapshot(t, rng.randint(horizon, head))
                check_snapshots(head)
                continue
            if head and roll < 0.24:
                keep = rng.randint(1, head + 2)  # sometimes > history: no-op
                report = m.expire_snapshots(t, keep_last=keep)
                horizon = max(horizon, report["horizon"])
                assert report["horizon"] >= 1
                check_snapshots(head)
                continue
            base = rng.randint(max(0, head - 4), head)  # can fall below horizon
            is_rewrite = rng.random() < 0.4 and model
            replaces = rng.sample(parts_pool, rng.randint(1, 2)) if is_rewrite else []
            adds = {rng.choice(parts_pool): new_files(rng.randint(1, 2))}
            winners_touched = set()
            expired_winner = False
            for w in range(base + 1, head + 1):
                if w < horizon:
                    expired_winner = True
                else:
                    winners_touched |= touched_by_version[w]
            expect_conflict = bool(replaces) and (
                expired_winner or bool(set(replaces) & winners_touched)
            )
            try:
                v = m.occ_commit(t, adds, replaces, base_version=base)
            except m.CommitConflictError:
                assert expect_conflict, (seed, step, base, head, horizon, replaces)
                continue
            assert not expect_conflict, (seed, step, base, head, horizon, replaces)
            assert v == head + 1
            for p in replaces:
                model.pop(p, None)
            for p, fs in adds.items():
                model[p] = model.get(p, []) + fs
            touched_by_version[v] = set(replaces) | set(adds)
            history[v] = {p: list(fs) for p, fs in model.items()}
            check_snapshots(v)

        head = m.current_version(t)
        m.vacuum_unreferenced(t)
        expected = {
            f
            for v in range(horizon, head + 1)
            for fs in history[v].values()
            for f in fs
        }
        survivors = {
            os.path.relpath(os.path.join(dp, f), t)
            for dp, _d, fs in os.walk(os.path.join(t, "data"))
            for f in fs
        }
        assert survivors == expected, (seed, len(survivors), len(expected))
        check_snapshots(head)


def test_expire_resumes_over_gapped_survivors(tmp_path):
    """A crash mid-deletion leaves a NON-CONTIGUOUS subset of manifests
    below the committed horizon (deletion order is lexicographic, not
    numeric). The effective floor must be the oldest RECONSTRUCTIBLE
    version: a keep-more re-run is a no-op at the committed horizon
    (never a failed checkpoint of a version whose history is gone), and
    it deletes the gapped garbage as the resumed expiry."""
    t = str(tmp_path / "gapped")
    os.makedirs(os.path.join(t, "data"), exist_ok=True)
    for i in range(8):
        rel = f"data/g{i}.parquet"
        with open(os.path.join(t, rel), "w"):
            pass
        m.occ_commit(t, {f"p{i}": [rel]}, base_version=m.current_version(t))
    want_v6 = m._snapshot_parts(t, 6)
    want_v8 = m._snapshot_parts(t, 8)
    # crashed expire(keep_last=3): checkpoint at horizon 6 written,
    # deletion died after removing v1, v3, v5 (v2, v4 remain, gapped)
    m.checkpoint_snapshot(t, 6)
    for v in (1, 3, 5):
        os.remove(os.path.join(t, "manifests", f"v{v}.json"))
    assert m._oldest_reconstructible(t) == 6
    # keep-more re-run: horizon clamps to the committed 6, garbage goes
    report = m.expire_snapshots(t, keep_last=8)
    assert report["horizon"] == 6
    assert sorted(os.listdir(os.path.join(t, "manifests"))) == [
        "ckpt-v6.json", "v6.json", "v7.json", "v8.json",
    ]
    assert m._snapshot_parts(t, 6) == want_v6
    assert m._snapshot_parts(t, 8) == want_v8


# ---------------------------------------------------------------------------
# r9: copy-on-write MERGE (upsert) through the OCC commit path
# ---------------------------------------------------------------------------


def _rows(spark, table, version):
    return sorted(
        (r.k, r.v, r.p)
        for r in m.read_snapshot(spark, str(table), version)
        .select("k", "v", "p")
        .collect()
    )


def _updf(spark, rows):
    return spark.createDataFrame(rows, "k int, v string, p int")


@pytest.fixture()
def merge_table(spark, tmp_path):
    """v1 = merge-as-bootstrap: inserts across partitions p=0,1."""
    t = str(tmp_path / "merge_table")
    base = [(k, f"base-{k}", k % 2) for k in range(6)]
    assert m.occ_merge_upsert(spark, t, _updf(spark, base), ["k"], "p") == 1
    return t, base


def test_merge_updates_and_inserts_atomically(spark, merge_table):
    t, base = merge_table
    ups = [(0, "UPD-0", 0), (5, "UPD-5", 1), (10, "NEW-10", 0), (11, "NEW-11", 3)]
    assert m.occ_merge_upsert(spark, t, _updf(spark, ups), ["k"], "p") == 2
    want = {k: (k, v, p) for (k, v, p) in base}
    for k, v, p in ups:
        want[k] = (k, v, p)
    assert _rows(spark, t, 2) == sorted(want.values())
    # time travel: v1 still answers the pre-merge state
    assert _rows(spark, t, 1) == sorted(base)


def test_merge_rewrites_only_affected_partitions(spark, merge_table):
    t, base = merge_table
    before = m._snapshot_parts(t, 1)
    # touch only p=1 (update k=1) — p=0's file set must be untouched
    assert m.occ_merge_upsert(
        spark, t, _updf(spark, [(1, "UPD-1", 1)]), ["k"], "p"
    ) == 2
    after = m._snapshot_parts(t, 2)
    assert after["p=0"] == before["p=0"]
    assert after["p=1"] != before["p=1"]


def test_merge_rejects_duplicate_key_batches(spark, merge_table):
    t, _ = merge_table
    with pytest.raises(ValueError, match="duplicate keys"):
        m.occ_merge_upsert(
            spark, t, _updf(spark, [(1, "a", 1), (1, "b", 1)]), ["k"], "p"
        )


def test_concurrent_disjoint_merges_both_land(spark, merge_table):
    t, base = merge_table
    import threading

    errs, barrier = [], threading.Barrier(2)

    def merge(rows):
        try:
            barrier.wait()
            m.occ_merge_upsert(spark, t, _updf(spark, rows), ["k"], "p")
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    ta = threading.Thread(target=merge, args=([(20, "A", 7)],))
    tb = threading.Thread(target=merge, args=([(30, "B", 8)],))
    ta.start(), tb.start()
    ta.join(), tb.join()
    assert not errs
    assert m.current_version(t) == 3
    got = _rows(spark, t, 3)
    assert (20, "A", 7) in got and (30, "B", 8) in got


def test_stale_overlapping_merge_is_refused_and_vacuumable(spark, merge_table):
    t, base = merge_table
    assert m.occ_merge_upsert(
        spark, t, _updf(spark, [(0, "WIN", 0)]), ["k"], "p"
    ) == 2
    # a second merge into p=0 built on the same base would un-see WIN:
    # simulate by sealing a competing rewrite before the merge commits
    # — easiest deterministic construction: race via monkeypatched
    # occ_commit is overkill; instead replay the merge against a stale
    # head by committing a competing rewrite of p=0 first, then
    # attempting a merge whose occ_commit base is the old head.
    # occ_merge_upsert always reads the CURRENT head, so drive
    # occ_commit directly with the stale base to pin the refusal path:
    files = m._snapshot_parts(t, 2)["p=0"]
    with pytest.raises(m.CommitConflictError):
        m.occ_commit(t, {"p=0": files}, replaces=["p=0"], base_version=1)
    # merge-staged garbage from a refused commit is reclaimable
    report = m.vacuum_unreferenced(t)
    assert report["data_files_removed"] == 0  # nothing was staged here
    assert _rows(spark, t, 2)[0] == (0, "WIN", 0)


def test_merge_partition_moving_key_contract(spark, merge_table):
    # documented restriction: a key that MOVES partitions inserts at
    # its new home; its old row is removed only if the old partition is
    # in the batch footprint. Pin the contract both ways.
    t, base = merge_table
    # k=0 lived in p=0; move it to p=5 WITHOUT touching p=0
    assert m.occ_merge_upsert(
        spark, t, _updf(spark, [(0, "MOVED", 5)]), ["k"], "p"
    ) == 2
    got = _rows(spark, t, 2)
    assert (0, "MOVED", 5) in got and (0, "base-0", 0) in got  # old row stays
    # moving WITH the old partition in the footprint removes the old row
    assert m.occ_merge_upsert(
        spark, t, _updf(spark, [(0, "MOVED2", 6), (2, "UPD-2", 0)]), ["k"], "p"
    ) == 3
    got = _rows(spark, t, 3)
    assert (0, "MOVED2", 6) in got
    assert not any(k == 0 and p == 0 for k, _v, p in got)


# ---------------------------------------------------------------------------
# r9: manifest-carried column bounds + stats-pruned snapshot reads
# ---------------------------------------------------------------------------


def test_merge_stats_prune_skips_partitions_without_opening_files(
    spark, tmp_path
):
    t = str(tmp_path / "stats_table")
    rows = [(k, f"v-{k}", k // 10) for k in range(40)]  # p=0..3, k-ranges disjoint
    assert (
        m.occ_merge_upsert(
            spark, t, _updf(spark, rows), ["k"], "p", stats_cols=["k"]
        )
        == 1
    )
    parts, stats, _cols = m._snapshot_state(t, 1)
    assert set(stats) == {"p=0", "p=1", "p=2", "p=3"}
    assert stats["p=1"]["k"] == [10, 19]
    # a range inside p=2 prunes the other three partitions
    files, pruned = m.pruned_snapshot_files(t, 1, "k", 23, 27)
    assert pruned == 3
    assert set(files) == set(parts["p=2"])
    got = sorted(
        r.k for r in m.read_snapshot_where(spark, t, 1, "k", 23, 27).collect()
    )
    assert got == list(range(23, 28))
    # open bounds: lo-only and hi-only prune correctly
    _files, pruned_lo = m.pruned_snapshot_files(t, 1, "k", 30, None)
    assert pruned_lo == 3
    _files, pruned_hi = m.pruned_snapshot_files(t, 1, "k", None, 5)
    assert pruned_hi == 3
    # a fully-pruned plan fails loudly rather than fabricating a schema
    with pytest.raises(ValueError, match="pruned"):
        m.read_snapshot_where(spark, t, 1, "k", 1000, 2000)


def test_stats_fold_widen_invalidate_and_checkpoint_roundtrip(spark, tmp_path):
    t = str(tmp_path / "stats_fold")
    assert (
        m.occ_merge_upsert(
            spark, t, _updf(spark, [(1, "a", 0), (2, "b", 0)]), ["k"], "p",
            stats_cols=["k"],
        )
        == 1
    )
    # merge widening the same partition's bounds
    assert (
        m.occ_merge_upsert(
            spark, t, _updf(spark, [(9, "c", 0)]), ["k"], "p", stats_cols=["k"]
        )
        == 2
    )
    assert m._snapshot_state(t, 2)[1]["p=0"]["k"] == [1, 9]
    # an UNSTATTED append into the same partition invalidates its bounds
    df = _updf(spark, [(50, "x", 0)])
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(t, "data", "u"))
    files = [
        os.path.join("data", "u", f)
        for f in os.listdir(os.path.join(t, "data", "u"))
        if f.endswith(".parquet")
    ]
    assert m.occ_commit(t, {"p=0": files}, base_version=2) == 3
    assert "p=0" not in m._snapshot_state(t, 3)[1]
    # pruning now conservatively keeps the partition
    _files, pruned = m.pruned_snapshot_files(t, 3, "k", 1000, 2000)
    assert pruned == 0
    # checkpoint persists the folded stats and replay resumes from it
    assert m._snapshot_state(t, 2)[1]["p=0"]["k"] == [1, 9]
    m.checkpoint_snapshot(t, 2)
    assert m._snapshot_state(t, 2)[1]["p=0"]["k"] == [1, 9]
    assert "p=0" not in m._snapshot_state(t, 3)[1]


def test_schema_evolution_read_through_merge_schema(spark, tmp_path):
    t = str(tmp_path / "evo")
    df1 = spark.createDataFrame([(1, "a")], "k int, v string")
    f1 = m._tt_commit(df1.coalesce(1), os.path.join(t, "data"), "c1")
    assert m.occ_commit(t, {"p0": f1}, base_version=0) == 1
    df2 = spark.createDataFrame([(2, "b", 9.5)], "k int, v string, w double")
    f2 = m._tt_commit(df2.coalesce(1), os.path.join(t, "data"), "c2")
    assert m.occ_commit(t, {"p1": f2}, base_version=1) == 2
    got = {
        r.k: (r.v, r.w)
        for r in m.read_snapshot(spark, t, 2, merge_schema=True).collect()
    }
    assert got == {1: ("a", None), 2: ("b", 9.5)}


def test_concurrent_same_new_partition_merges_never_duplicate(spark, merge_table):
    # two merges inserting the SAME key into a partition neither had at
    # its base must serialize: either the slower one re-read the head
    # AFTER the winner landed (a legitimate update — version advances
    # twice), or it raced from the same base and is refused. Both
    # interleavings are legal; two rows for the key never are.
    t, _ = merge_table
    import threading

    conflicts, errs, barrier = [], [], threading.Barrier(2)

    def merge(val):
        try:
            barrier.wait()
            m.occ_merge_upsert(spark, t, _updf(spark, [(20, val, 7)]), ["k"], "p")
        except m.CommitConflictError as e:
            conflicts.append(e)
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    ta = threading.Thread(target=merge, args=("A",))
    tb = threading.Thread(target=merge, args=("B",))
    ta.start(), tb.start()
    ta.join(), tb.join()
    assert not errs
    head = m.current_version(t)
    assert (len(conflicts), head) in {(1, 2), (0, 3)}
    rows = [r for r in _rows(spark, t, head) if r[0] == 20]
    assert len(rows) == 1 and rows[0][1] in ("A", "B")
    # the same-base race pinned DETERMINISTICALLY: a second insert into
    # the partition the winner just created, committed from the stale
    # base, must refuse (this is the exact commit the merge issues)
    files = m._snapshot_parts(t, head)["p=7"]
    with pytest.raises(m.CommitConflictError):
        m.occ_commit(t, {"p=7": files}, replaces=["p=7"], base_version=1)


def test_merge_rejects_empty_and_column_dropping_batches(spark, merge_table):
    t, _ = merge_table
    empty = spark.createDataFrame([], "k int, v string, p int")
    with pytest.raises(ValueError, match="empty"):
        m.occ_merge_upsert(spark, t, empty, ["k"], "p")
    # a batch missing an EXISTING table column would silently null it
    # on every upserted row under allowMissingColumns — refused
    narrow = spark.createDataFrame([(0, 0)], "k int, p int")
    with pytest.raises(ValueError, match="lacks existing table columns"):
        m.occ_merge_upsert(spark, t, narrow, ["k"], "p", merge_schema=True)
    # ...including a batch targeting ONLY NEW partitions: sealing
    # narrow files would let one footer hide the column from
    # whole-snapshot reads
    narrow_new = spark.createDataFrame([(99, 42)], "k int, p int")
    with pytest.raises(ValueError, match="lacks existing table columns"):
        m.occ_merge_upsert(spark, t, narrow_new, ["k"], "p")


def test_merge_refuses_legacy_pseudo_partition_tables(spark, tmp_path):
    # rows under '' are invisible to the per-partition survivor scan:
    # merging over them would silently duplicate keys — refuse loudly
    # until the table is migrated.
    t = str(tmp_path / "merge_legacy")
    df = spark.createDataFrame([(1, "old", 0)], "k int, v string, p int")
    m.seal_manifest(t, 1, m._tt_commit(df.coalesce(1), os.path.join(t, "data"), "c1"))
    with pytest.raises(m.CommitConflictError, match="legacy"):
        m.occ_merge_upsert(spark, t, _updf(spark, [(1, "new", 0)]), ["k"], "p")


def test_merge_rejects_null_keys_and_null_partitions(spark, merge_table):
    t, _ = merge_table
    with pytest.raises(ValueError, match="null-key"):
        m.occ_merge_upsert(spark, t, _updf(spark, [(None, "a", 1)]), ["k"], "p")
    with pytest.raises(ValueError, match="null p rows"):
        m.occ_merge_upsert(spark, t, _updf(spark, [(99, "a", None)]), ["k"], "p")


def test_merge_across_schema_generations(spark, merge_table):
    # updates carrying a NEW column upsert into a pre-evolution
    # partition: survivors get null for the new column, and the
    # snapshot reads whole with merge_schema
    t, base = merge_table
    ups = spark.createDataFrame(
        [(0, "UPD-0", 0, 9.5)], "k int, v string, p int, w double"
    )
    assert (
        m.occ_merge_upsert(spark, t, ups, ["k"], "p", merge_schema=True) == 2
    )
    got = {
        r.k: (r.v, r.w)
        for r in m.read_snapshot(spark, t, 2, merge_schema=True)
        .where(F.col("p") == 0)
        .collect()
    }
    assert got[0] == ("UPD-0", 9.5)
    assert got[2] == ("base-2", None) and got[4] == ("base-4", None)


def test_merge_guard_sees_every_generation_in_affected_partitions(
    spark, merge_table
):
    # files WITHIN one partition can span schema generations (an
    # append evolved column w into p=0): the guard must read every
    # affected file's footer, not a sample — a narrow batch into p=0
    # would otherwise null w on every upserted row.
    t, _ = merge_table
    df = spark.createDataFrame([(50, "x", 0, 7.5)], "k int, v string, p int, w double")
    f = m._tt_commit(df.coalesce(1), os.path.join(t, "data"), "c-evo")
    assert m.occ_commit(t, {"p=0": f}, base_version=1) == 2
    narrow = spark.createDataFrame([(0, "UPD", 0)], "k int, v string, p int")
    with pytest.raises(ValueError, match="lacks existing table columns"):
        m.occ_merge_upsert(spark, t, narrow, ["k"], "p", merge_schema=True)
    # carrying w, the merge lands and survivors keep their values
    wide = spark.createDataFrame(
        [(0, "UPD", 0, None)], "k int, v string, p int, w double"
    )
    assert m.occ_merge_upsert(spark, t, wide, ["k"], "p", merge_schema=True) == 3
    got = {
        r.k: r.w
        for r in m.read_snapshot(spark, t, 3, merge_schema=True)
        .where(F.col("p") == 0)
        .collect()
    }
    assert got[50] == 7.5 and got[0] is None


def test_merge_tolerates_empty_file_list_partitions(spark, merge_table):
    # occ_commit accepts empty add-lists (a metadata-only partition):
    # the schema guard must skip them, not crash reading zero footers
    t, _ = merge_table
    assert m.occ_commit(t, {"p=empty": []}, base_version=1) == 2
    assert m.occ_merge_upsert(
        spark, t, _updf(spark, [(70, "E", 9)]), ["k"], "p"
    ) == 3
    assert (70, "E", 9) in _rows(spark, t, 3)


# ---------------------------------------------------------------------------
# r10: column set in commit metadata, metadata-only merge schema guard,
# rebase-window schema conflicts, close_moved_keys, zero-file reads
# ---------------------------------------------------------------------------


def test_commit_columns_fold_checkpoint_and_unknown_degradation(spark, tmp_path):
    # the column set folds as a UNION over declaring commits, survives
    # a checkpoint, and degrades honestly to unknown (None) the moment
    # an undeclared commit adds real files — never a guess
    t = str(tmp_path / "cols")
    f1 = _commit_files(spark, t, "c1", range(3))
    assert m.occ_commit(t, {"p0": f1}, base_version=0, columns=["k", "v"]) == 1
    assert m._snapshot_state(t, 1)[2] == {"k", "v"}
    f2 = _commit_files(spark, t, "c2", range(10, 12))
    assert m.occ_commit(t, {"p1": f2}, base_version=1, columns=["k", "v", "w"]) == 2
    assert m._snapshot_state(t, 2)[2] == {"k", "v", "w"}
    # checkpoint persists the per-partition sets; replay resumes there
    m.checkpoint_snapshot(t, 2)
    assert json.load(open(os.path.join(t, "manifests", "ckpt-v2.json")))[
        "pcols"
    ] == {"p0": ["k", "v"], "p1": ["k", "v", "w"]}
    assert m._snapshot_state(t, 2)[2] == {"k", "v", "w"}
    # a metadata-only commit (empty adds) without columns keeps knowledge
    assert m.occ_commit(t, {"p2": []}, base_version=2) == 3
    assert m._snapshot_state(t, 3)[2] == {"k", "v", "w"}
    # an undeclared commit adding REAL files makes the set unknown
    f3 = _commit_files(spark, t, "c3", range(20, 22))
    assert m.occ_commit(t, {"p3": f3}, base_version=3) == 4
    assert m._snapshot_state(t, 4)[2] is None
    # ...and unknown never silently recovers from later declarations
    f4 = _commit_files(spark, t, "c4", range(30, 32))
    assert m.occ_commit(t, {"p4": f4}, base_version=4, columns=["k", "v"]) == 5
    assert m._snapshot_state(t, 5)[2] is None
    # earlier versions still resolve their own (known) sets
    assert m._snapshot_state(t, 2)[2] == {"k", "v", "w"}


def test_merge_schema_guard_is_metadata_only_on_declared_tables(
    spark, merge_table
):
    # every commit of merge_table declared its columns (merges always
    # do), so the guard must run on log metadata alone: corrupt a live
    # data file and the narrow-batch refusal STILL fires cleanly —
    # under the old footer guard this read would explode first
    t, _ = merge_table
    assert m._snapshot_state(t, 1)[2] == {"k", "v", "p"}
    victim = os.path.join(t, m._snapshot_parts(t, 1)["p=0"][0])
    with open(victim, "wb") as fh:
        fh.write(b"NOT A PARQUET FILE")
    narrow = spark.createDataFrame([(0, 0)], "k int, p int")
    with pytest.raises(ValueError, match="lacks existing table columns"):
        m.occ_merge_upsert(spark, t, narrow, ["k"], "p", merge_schema=True)


def test_schema_evolving_winner_conflicts_at_rebase(spark, merge_table):
    # the rebase window the footer guard could not close: a winner
    # seals a schema-evolving commit AFTER the merge's guard ran; the
    # merge's own commit must refuse rather than seal content missing
    # the now-live column
    t, _ = merge_table
    head = m.current_version(t)
    parts, _stats, meta_cols = m._snapshot_state(t, head)
    assert meta_cols == {"k", "v", "p"}
    # concurrent winner: declared append evolving column w
    df = spark.createDataFrame([(50, "x", 9, 1.5)], "k int, v string, p int, w double")
    fw = m._tt_commit(df.coalesce(1), os.path.join(t, "data"), "c-evo")
    assert m.occ_commit(
        t, {"p=9": fw}, base_version=head, columns=["k", "v", "p", "w"]
    ) == head + 1
    # the stale merge (guard ran against the pre-evolution state)
    ups = _updf(spark, [(0, "STALE", 0)])
    with pytest.raises(m.CommitConflictError, match="evolved the schema"):
        m._merge_body(
            spark, t, ups, ["k"], "p", None, False, head, parts, meta_cols,
        )
    # a fresh merge (guard re-run against the evolved head) is refused
    # by the CONTENT guard instead — w is now a live column
    with pytest.raises(ValueError, match="lacks existing table columns"):
        m.occ_merge_upsert(spark, t, ups, ["k"], "p")


def test_merge_close_moved_keys_closes_the_old_row(spark, merge_table):
    t, base = merge_table
    # k=0 lived in p=0; move it to p=5 WITHOUT p=0 in the batch
    # footprint — close_moved_keys widens the rewrite to p=0 and the
    # old row dies with the move
    assert m.occ_merge_upsert(
        spark, t, _updf(spark, [(0, "MOVED", 5)]), ["k"], "p",
        close_moved_keys=True,
    ) == 2
    got = _rows(spark, t, 2)
    assert (0, "MOVED", 5) in got
    assert not any(k == 0 and p == 0 for k, _v, p in got)
    # p=0's survivors (2, 4) are intact, p=1 untouched
    assert (2, "base-2", 0) in got and (4, "base-4", 0) in got
    assert (1, "base-1", 1) in got
    # time travel: v1 still answers the pre-move state
    assert (0, "base-0", 0) in _rows(spark, t, 1)


def test_merge_close_moved_keys_drops_emptied_old_home(spark, merge_table):
    # moving EVERY row out of a partition must drop it from the
    # snapshot (dynamic overwrite cannot emit an empty partition, and
    # leaving the old file list referenced would resurrect the rows)
    t, _ = merge_table
    moves = [(1, "M-1", 6), (3, "M-3", 6), (5, "M-5", 6)]  # all of p=1
    assert m.occ_merge_upsert(
        spark, t, _updf(spark, moves), ["k"], "p", close_moved_keys=True
    ) == 2
    parts = m._snapshot_parts(t, 2)
    assert "p=1" not in parts
    got = _rows(spark, t, 2)
    assert {(1, "M-1", 6), (3, "M-3", 6), (5, "M-5", 6)} <= set(got)
    assert not any(p == 1 for _k, _v, p in got)


def test_merge_into_empty_file_list_partition_is_pure_insert(spark, merge_table):
    # ADVICE r9: a partition sealed via an empty add IS in the batch
    # footprint — `existing` must not hand the reader zero paths
    # (UNABLE_TO_INFER_SCHEMA); the merge into it is a pure insert
    t, _ = merge_table
    assert m.occ_commit(t, {"p=9": []}, base_version=1) == 2
    assert m.occ_merge_upsert(
        spark, t, _updf(spark, [(80, "INS", 9)]), ["k"], "p"
    ) == 3
    assert (80, "INS", 9) in _rows(spark, t, 3)


def test_read_snapshot_of_zero_file_version_raises_descriptive(spark, tmp_path):
    # ADVICE r9: a version referencing zero files must fail with a
    # descriptive error, not an opaque reader AnalysisException
    t = str(tmp_path / "zero_files")
    assert m.occ_commit(t, {"p0": []}, base_version=0) == 1
    with pytest.raises(ValueError, match="zero data files"):
        m.read_snapshot(spark, t, 1)


def test_rewrite_drops_columns_from_the_metadata_set(spark, tmp_path):
    # review r10: a commit-level union could never forget a column a
    # full-partition rewrite dropped — the guard would then demand a
    # zombie column no live file holds, deadlocking every default-mode
    # merge. The per-partition fold forgets it with the rewrite.
    t = str(tmp_path / "drop_cols")
    wide = spark.createDataFrame(
        [(0, "a", 0, 1.5), (1, "b", 0, 2.5)], "k int, v string, p int, w double"
    )
    assert m.occ_merge_upsert(spark, t, wide, ["k"], "p") == 1
    assert m._snapshot_state(t, 1)[2] == {"k", "v", "p", "w"}
    # rewrite p=0 with files that no longer carry w, declaring so
    narrow_df = spark.createDataFrame(
        [(0, "a2", 0), (1, "b2", 0)], "k int, v string, p int"
    )
    f = m._tt_commit(narrow_df.coalesce(1), os.path.join(t, "data"), "c-narrow")
    assert m.occ_commit(
        t, {"p=0": f}, replaces=["p=0"], base_version=1,
        columns=["k", "v", "p"],
    ) == 2
    assert m._snapshot_state(t, 2)[2] == {"k", "v", "p"}
    # a default-mode merge WITHOUT w now passes the guard and lands —
    # under the widen-only design it was refused for lacking w, and
    # carrying w crashed the survivor union instead
    ups = _updf(spark, [(0, "UPD", 0), (9, "NEW", 0)])
    assert m.occ_merge_upsert(spark, t, ups, ["k"], "p") == 3
    got = sorted((r.k, r.v) for r in m.read_snapshot(spark, t, 3).collect())
    assert got == [(0, "UPD"), (1, "b2"), (9, "NEW")]


def test_close_moved_keys_conflicts_with_any_file_adding_winner(
    spark, merge_table
):
    # review r10: the holders scan proves row placement against the
    # snapshot it read — a winner that added real files after it may
    # have landed a batch key outside the scanned footprint, so a
    # close-mode commit from the stale base must conflict (partition
    # disjointness is not row disjointness under a full-table scan),
    # while a metadata-only winner still composes.
    t, _ = merge_table
    head = m.current_version(t)
    parts, _stats, meta_cols = m._snapshot_state(t, head)
    # winner: a DISJOINT merge inserting a fresh key into a fresh
    # partition — under partition rules it would rebase cleanly
    assert m.occ_merge_upsert(
        spark, t, _updf(spark, [(30, "WIN", 8)]), ["k"], "p"
    ) == head + 1
    moves = _updf(spark, [(0, "MOVED", 5)])
    with pytest.raises(m.CommitConflictError, match="full-snapshot key scan"):
        m._merge_body(
            spark, t, moves, ["k"], "p", None, False, head, parts,
            meta_cols, True,
        )
    # a metadata-only winner (empty adds) composes: same stale base
    head2 = m.current_version(t)
    parts2, _s2, cols2 = m._snapshot_state(t, head2)
    assert m.occ_commit(t, {"p=meta": []}, base_version=head2) == head2 + 1
    v = m._merge_body(
        spark, t, moves, ["k"], "p", None, False, head2, parts2, cols2, True,
    )
    assert v == head2 + 2
    got = _rows(spark, t, v)
    assert (0, "MOVED", 5) in got
    assert not any(k == 0 and p == 0 for k, _v, p in got)


def test_declared_empty_add_does_not_union_columns(spark, tmp_path):
    # review r10 wave 2: a DECLARED add that lands zero files (schema
    # registration, emptied retry) must not widen the partition's
    # column set — no live file holds the declared column, so the
    # merge guard would demand a zombie
    t = str(tmp_path / "empty_decl")
    base = spark.createDataFrame([(0, "a", 0)], "k int, v string, p int")
    assert m.occ_merge_upsert(spark, t, base, ["k"], "p") == 1
    assert m.occ_commit(
        t, {"p=0": []}, base_version=1, columns=["k", "v", "p", "w"]
    ) == 2
    assert m._snapshot_state(t, 2)[2] == {"k", "v", "p"}
    # a default-mode merge without w still lands
    assert m.occ_merge_upsert(
        spark, t, _updf(spark, [(1, "b", 0)]), ["k"], "p"
    ) == 3
    assert sorted(r.k for r in m.read_snapshot(spark, t, 3).collect()) == [0, 1]


def test_close_moved_keys_maps_holders_by_file_not_by_value(spark, tmp_path):
    # review r10 wave 2: a table adopted via raw occ_commit can hold a
    # partition whose NAME does not follow the value's str() form. The
    # holders scan must locate the old row by the file it was read
    # from: (a) an exotic old home whose every row moved is dropped
    # correctly; (b) an exotic old home with SURVIVORS refuses loudly
    # (the survivors would restage under the str()-form name, which is
    # outside the footprint) instead of leaving a silent duplicate.
    t = str(tmp_path / "exotic")
    df = spark.createDataFrame([(0, "only", 0)], "k int, v string, p int")
    f = m._tt_commit(df.coalesce(1), os.path.join(t, "data"), "c-exotic")
    assert m.occ_commit(t, {"weird0": f}, base_version=0, columns=["k", "v", "p"]) == 1
    # (a) the single row of 'weird0' moves to p=5: total move, old home dropped
    assert m.occ_merge_upsert(
        spark, t, _updf(spark, [(0, "MOVED", 5)]), ["k"], "p",
        close_moved_keys=True,
    ) == 2
    parts = m._snapshot_parts(t, 2)
    assert "weird0" not in parts and "p=5" in parts
    assert _rows(spark, t, 2) == [(0, "MOVED", 5)]
    # (b) an exotic home WITH survivors: loud refusal, nothing sealed
    t2 = str(tmp_path / "exotic2")
    df2 = spark.createDataFrame(
        [(0, "mover", 0), (1, "stayer", 0)], "k int, v string, p int"
    )
    f2 = m._tt_commit(df2.coalesce(1), os.path.join(t2, "data"), "c-exotic")
    assert m.occ_commit(t2, {"weird0": f2}, base_version=0, columns=["k", "v", "p"]) == 1
    with pytest.raises(RuntimeError, match="partition-name mismatch"):
        m.occ_merge_upsert(
            spark, t2, _updf(spark, [(0, "MOVED", 5)]), ["k"], "p",
            close_moved_keys=True,
        )
    assert m.current_version(t2) == 1  # nothing sealed


def test_snapshot_walk_retries_once_under_racing_expiry(spark, table, monkeypatch):
    # review r10 wave 2: a walk that started before a concurrent
    # expiry wrote its horizon checkpoint can step onto a just-deleted
    # manifest; one retry finds the (durably-written-first) checkpoint
    fa = _commit_files(spark, table, "c-a", range(10, 12))
    fb = _commit_files(spark, table, "c-b", range(20, 22))
    assert m.occ_commit(table, {"pA": fa}, base_version=1) == 2
    assert m.occ_commit(table, {"pB": fb}, base_version=2) == 3
    want = m._snapshot_parts(table, 3)
    real_read = m._read_manifest
    state = {"fired": False}

    def racing_read(table_path, version):
        if version == 1 and not state["fired"]:
            # the concurrent expiry: checkpoint at the horizon, then
            # v1's manifest vanishes under the walker
            state["fired"] = True
            m.checkpoint_snapshot(table_path, 2)
            os.remove(os.path.join(table_path, "manifests", "v1.json"))
            raise FileNotFoundError("v1.json")
        return real_read(table_path, version)

    monkeypatch.setattr(m, "_read_manifest", racing_read)
    assert m._snapshot_parts(table, 3) == want
    # a genuinely unreconstructible version reports descriptively
    monkeypatch.undo()
    os.remove(os.path.join(table, "manifests", "ckpt-v2.json"))
    os.remove(os.path.join(table, "manifests", "v2.json"))
    with pytest.raises(FileNotFoundError, match="cannot be reconstructed"):
        m._snapshot_parts(table, 3)


def test_column_fold_randomized_model_check(tmp_path):
    """Seeded randomized interleavings of declared/undeclared adds,
    declared empty adds, rewrites, and background checkpoints against
    a dict model of the PER-PARTITION column fold: at every step the
    engine's table-level column set must equal the model's (union over
    file-holding partitions, None if any is unknown). The same walk
    also models the PER-FILE bounds fold (r10 fstats): bounds install
    only with genuinely fresh adds, leave with a rewritten partition's
    files, and survive checkpoints. Pure metadata — occ_commit never
    opens data files."""
    import random

    cols_pool = ["a", "b", "c", "d", "e"]
    for seed in range(5):
        rng = random.Random(2000 + seed)
        t = str(tmp_path / f"colmodel-{seed}")
        os.makedirs(os.path.join(t, "data"), exist_ok=True)
        parts_model: dict[str, list[str]] = {}
        pcols_model: dict[str, set | None] = {}  # absent/None = unknown
        fstats_model: dict[str, dict] = {}  # rel file -> {col: [lo, hi]}
        file_seq = 0
        parts_pool = [f"p{i}" for i in range(4)]

        def new_files(n):
            nonlocal file_seq
            out = []
            for _ in range(n):
                rel = f"data/f{file_seq}.parquet"
                file_seq += 1
                with open(os.path.join(t, rel), "w"):
                    pass
                out.append(rel)
            return out

        def model_table_cols():
            live = [p for p, fs in parts_model.items() if fs]
            if any(pcols_model.get(p) is None for p in live):
                return None
            out = set()
            for p in live:
                out |= pcols_model[p]
            return out

        for _ in range(60):
            head = m.current_version(t)
            roll = rng.random()
            if head and roll < 0.15:
                m.checkpoint_snapshot(t, rng.randint(1, head))
                assert m._snapshot_state(t, head)[2] == model_table_cols()
                fgot: dict = {}
                m._snapshot_maps(t, head, fgot)
                assert fgot == fstats_model, (seed, head)
                continue
            p = rng.choice(parts_pool)
            declared = rng.random() < 0.7
            empty = rng.random() < 0.15
            # rewrites may also target an ABSENT partition (legal:
            # occ_commit treats it as an append for the apply step)
            is_rewrite = rng.random() < 0.3
            files = [] if empty else new_files(rng.randint(1, 2))
            if (
                not is_rewrite
                and parts_model.get(p)
                and rng.random() < 0.3
            ):
                # idempotent RE-ADD of already-present paths (a rebased
                # retry): the engine must treat these as fresh-empty —
                # a declared re-add must NOT union its declaration in
                files = files + rng.sample(
                    parts_model[p], min(2, len(parts_model[p]))
                )
            cols = (
                sorted(rng.sample(cols_pool, rng.randint(1, 3)))
                if declared
                else None
            )
            # declare per-file bounds for a random subset of the adds —
            # including re-added already-present paths, which the fold
            # must IGNORE (bounds install only with fresh files)
            fdecl = {
                f: {"k": [i * 10, i * 10 + 5]}
                for i, f in enumerate(files)
                if rng.random() < 0.5
            }
            m.occ_commit(
                t, {p: files}, replaces=[p] if is_rewrite else (),
                base_version=head, columns=cols,
                file_stats=fdecl or None,
            )
            if is_rewrite:
                for f in parts_model.get(p, []):
                    fstats_model.pop(f, None)
                parts_model.pop(p, None)
                pcols_model.pop(p, None)
            existed = p in parts_model
            present = set(parts_model.get(p, []))
            fresh = [f for f in files if f not in present]
            parts_model[p] = parts_model.get(p, []) + fresh
            for f in fresh:
                if f in fdecl:
                    fstats_model[f] = {
                        c: list(b) for c, b in fdecl[f].items()
                    }
            if fresh:  # knowledge moves only with genuinely NEW files
                if cols is not None:
                    if not existed:
                        pcols_model[p] = set(cols)
                    elif pcols_model.get(p) is not None:
                        pcols_model[p] = pcols_model[p] | set(cols)
                else:
                    pcols_model[p] = None
            got = m._snapshot_state(t, head + 1)[2]
            assert got == model_table_cols(), (seed, head + 1, got)
            fgot = {}
            m._snapshot_maps(t, head + 1, fgot)
            assert fgot == fstats_model, (seed, head + 1)
