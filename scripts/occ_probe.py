"""Metadata-scale probe for the OCC commit protocol
(plans/maintenance.py: occ_commit / _cas_seal / _snapshot_parts /
checkpoint_snapshot).

r8 embedded the full per-partition file list in every version's
manifest, so commit metadata cost was O(snapshot file count) — measured
160 ms + 5.6 MB per commit at 100k files. r9 segments the log: a commit
seals only its DELTA (adds/replaces/base) and readers replay deltas
from the nearest checkpoint. This probe quantifies the new shape:

  1. append-commit latency + manifest size vs snapshot file count
     (claim: flat — an append never reads snapshot state);
  2. rewrite-commit latency vs winners since base (the conflict scan
     reads each winner's delta; the legacy-'' guard replays the
     partition key set — O(metadata since checkpoint));
  3. read-side snapshot reconstruction vs delta-chain depth, with and
     without a checkpoint (claim: checkpoint bounds replay to the
     deltas after it), plus the checkpoint write itself (the one
     O(snapshot) cost, now on the maintenance cadence instead of every
     commit).

File entries are synthetic — occ_commit never opens data files — so
the probe isolates pure metadata cost.

Run: python scripts/occ_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from automated_dow30_earnings_reports_spark.plans.maintenance import (  # noqa: E402
    _snapshot_parts,
    checkpoint_snapshot,
    current_version,
    occ_commit,
    pruned_snapshot_files,
    snapshot_changes_files,
)

SCRATCH = os.path.join(REPO, ".scratch", "occ_probe")


def _fresh(tag: str) -> str:
    path = os.path.join(SCRATCH, tag)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


def probe_snapshot_size() -> None:
    print("append-commit latency vs snapshot file count (100-file append):")
    for n_files in (1_000, 10_000, 100_000):
        t = _fresh(f"size-{n_files}")
        occ_commit(
            t, {"base": [f"data/base/f{i}.parquet" for i in range(n_files)]}
        )
        delta = {"delta": [f"data/delta/g{i}.parquet" for i in range(100)]}
        best = min(
            _timed(lambda v=v: occ_commit(t, delta, base_version=v))
            for v in (current_version(t), current_version(t))
        )
        man = os.path.join(t, "manifests", f"v{current_version(t)}.json")
        print(
            f"  {n_files:>7}-file snapshot: {best*1e3:7.1f} ms/commit, "
            f"manifest {os.path.getsize(man)/1e3:7.1f} KB"
        )


def probe_winner_chain() -> None:
    print("rewrite-commit latency vs concurrent winners since base "
          "(disjoint rewrite, base=v1):")
    for winners in (10, 100, 500):
        t = _fresh(f"chain-{winners}")
        occ_commit(t, {"base": ["data/base/f0.parquet"]})
        for i in range(winners):
            occ_commit(
                t, {f"w{i}": [f"data/w{i}/f.parquet"]},
                base_version=current_version(t),
            )
        delta = {"base": ["data/late/f.parquet"]}
        dt = _timed(
            lambda: occ_commit(t, delta, replaces=["base"], base_version=1)
        )
        print(
            f"  {winners:>4} winners: {dt*1e3:7.1f} ms "
            "(conflict scan + key-set replay read them all)"
        )


def probe_read_reconstruction() -> None:
    print("snapshot reconstruction vs delta-chain depth (100 files/commit):")
    for depth in (10, 100, 500):
        t = _fresh(f"read-{depth}")
        for i in range(depth):
            occ_commit(
                t,
                {f"p{i % 8}": [f"data/c{i}/f{j}.parquet" for j in range(100)]},
                base_version=current_version(t),
            )
        head = current_version(t)
        cold = _timed(lambda: _snapshot_parts(t, head))
        ck = _timed(lambda: checkpoint_snapshot(t, head - 1))
        warm = _timed(lambda: _snapshot_parts(t, head))
        print(
            f"  {depth:>4}-delta chain: replay {cold*1e3:7.1f} ms cold, "
            f"{warm*1e3:7.1f} ms after checkpoint "
            f"(checkpoint write {ck*1e3:7.1f} ms)"
        )


def probe_incremental_plan() -> None:
    print("incremental-scan planning (100-file append range) vs snapshot "
          "file count (claim: O(range deltas + v_from replay), flat once "
          "a checkpoint covers v_from):")
    for n_files in (1_000, 10_000, 100_000):
        t = _fresh(f"inc-{n_files}")
        occ_commit(
            t, {"base": [f"data/base/f{i}.parquet" for i in range(n_files)]}
        )
        v_from = current_version(t)
        occ_commit(
            t,
            {"delta": [f"data/delta/g{i}.parquet" for i in range(100)]},
            base_version=v_from,
        )
        head = current_version(t)
        cold = _timed(lambda: snapshot_changes_files(t, v_from, head))
        checkpoint_snapshot(t, v_from)
        warm = _timed(lambda: snapshot_changes_files(t, v_from, head))
        if len(snapshot_changes_files(t, v_from, head)) != 100:
            raise RuntimeError("probe planned the wrong appended set")
        print(
            f"  {n_files:>7}-file snapshot: plan {cold*1e3:7.1f} ms cold, "
            f"{warm*1e3:7.1f} ms with checkpoint at v_from"
        )


def probe_file_stats_scale() -> None:
    print("per-file bounds at scale: checkpoint size + file-grain plan "
          "cost vs files WITH declared bounds (1 col each, 1%-selective "
          "range):")
    for n_files in (1_000, 10_000, 100_000):
        t = _fresh(f"fstats-{n_files}")
        batch = 10_000
        v = 0
        for lo in range(0, n_files, batch):
            hi = min(lo + batch, n_files)
            files = [f"data/b{lo}/f{i}.parquet" for i in range(lo, hi)]
            occ_commit(
                t,
                {f"p{lo // batch}": files},
                base_version=v,
                file_stats={
                    f"data/b{lo}/f{i}.parquet": {"k": [i * 10, i * 10 + 9]}
                    for i in range(lo, hi)
                },
            )
            v = current_version(t)
        ck = _timed(lambda: checkpoint_snapshot(t, v))
        ck_path = os.path.join(t, "manifests", f"ckpt-v{v}.json")
        plan = _timed(
            lambda: pruned_snapshot_files(t, v, "k", 0, n_files // 10)
        )
        kept, _ = pruned_snapshot_files(t, v, "k", 0, n_files // 10)
        print(
            f"  {n_files:>7} files: checkpoint {os.path.getsize(ck_path)/1e6:6.2f} MB "
            f"({ck*1e3:7.1f} ms write), file-grain plan {plan*1e3:7.1f} ms "
            f"-> {len(kept)} files kept"
        )


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    probe_snapshot_size()
    probe_winner_chain()
    probe_read_reconstruction()
    probe_incremental_plan()
    probe_file_stats_scale()
    shutil.rmtree(SCRATCH, ignore_errors=True)
