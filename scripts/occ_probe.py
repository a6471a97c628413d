"""Metadata-scale probe for the OCC commit protocol
(plans/maintenance.py: occ_commit / _cas_seal / current_version).

The protocol's claim is that commit cost is O(manifest), independent of
DATA size — but the manifest itself grows with the snapshot's file
count (the full per-partition file list is embedded per version, like
an Iceberg snapshot's manifest before manifest-list segmentation). This
probe measures where that bends: commit latency against snapshots of
1k/10k/100k files, and rebase latency against 10/100/500 concurrent
winners (the conflict scan reads every winner manifest sealed after the
writer's base). File entries are synthetic — occ_commit never opens
data files — so the probe isolates pure metadata cost.

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
    current_version,
    occ_commit,
)

SCRATCH = os.path.join(REPO, ".scratch", "occ_probe")


def _fresh(tag: str) -> str:
    path = os.path.join(SCRATCH, tag)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


def probe_snapshot_size() -> None:
    print("commit latency vs snapshot file count (100-file append):")
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
            f"manifest {os.path.getsize(man)/1e6:5.2f} MB"
        )


def probe_winner_chain() -> None:
    print("rebase latency vs concurrent winners since base (append, base=v1):")
    for winners in (10, 100, 500):
        t = _fresh(f"chain-{winners}")
        occ_commit(t, {"base": ["data/base/f0.parquet"]})
        for i in range(winners):
            occ_commit(
                t, {f"w{i}": [f"data/w{i}/f.parquet"]},
                base_version=current_version(t),
            )
        delta = {"late": ["data/late/f.parquet"]}
        dt = _timed(lambda: occ_commit(t, delta, base_version=1))
        print(f"  {winners:>4} winners: {dt*1e3:7.1f} ms (conflict scan reads them all)")


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    probe_snapshot_size()
    probe_winner_chain()
    shutil.rmtree(SCRATCH, ignore_errors=True)
