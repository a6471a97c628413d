"""Hive-partitioned parquet lake writer/reader (the at-scale sink).

The reference persists every stage as loose text/JSON files per company
(src/orchestrator.py:73-84, src/simple_metadata_collector.py:121-130).
At 100 TB the equivalent is a partitioned parquet dataset: partition
columns become directories, so a reader's predicate on them prunes
entire directories BEFORE any file is opened (PartitionFilters in the
scan node, distinct from row-group PushedFilters), and a writer can
replace one partition atomically without touching the rest.

Scale knobs encoded here:
  - dynamic partition overwrite — an incremental job rewrites only the
    partitions present in its output (the "daily re-run" contract);
    static overwrite would drop the whole table.
  - file-count control — one output file per (partition, task) without
    a repartition produces tasks x partitions small files; repartition
    on the partition columns makes it one file per partition (bound
    further with ``files_per_partition`` salting when a single
    partition's data exceeds one task's comfortable write size).
  - in-file clustering — ``sort_within`` sorts rows inside each file so
    min/max row-group stats make point/range predicates on those
    columns skippable (poor-man's Z-order; see plans/advanced.py
    zorder_cluster for the multi-column interleaving variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    dynamic: bool = True,
    files_per_partition: int = 1,
    sort_within: list[str] | None = None,
) -> None:
    """Write ``df`` as a hive-partitioned parquet dataset.

    The overwrite mode is set per WRITER (``option("partitionOverwriteMode",
    ...)`` — honored by the parquet source and overriding the session conf),
    never by mutating the session-global conf: the old set/restore dance
    raced any concurrent write on the same session (e.g. the dedup index's
    overlapped shd write) and could silently flip a static overwrite to
    dynamic mid-write."""
    out = df
    if files_per_partition == 1:
        # EXPLICIT partition count (r11, guide §2.5/§2.4): a column-only
        # repartition flows through spark.sql.shuffle.partitions and AQE
        # then coalesces the small exchange by BYTES — measured collapsing
        # every index-table write stage to ONE task (dedup_index_stats'
        # bands write: a 965 ms single-task stage computing all band md5s
        # serially while 31 cores idle). An explicit count pins the
        # exchange (AQE never coalesces user-specified repartitions), so
        # the write stage spreads across the partition VALUES — still
        # exactly one file per value (hash partitioning sends all rows of
        # a value to one task regardless of the count). Scale-adaptive:
        # the count is the session's shuffle-partition conf, not a
        # local[32] constant.
        n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        out = out.repartition(n, *[F.col(c) for c in partition_cols])
    else:
        # Salted spread: an explicit partition count is required —
        # AQE coalesces column-only repartitions back together,
        # collapsing the salt groups into one task (= one file).
        n_values = df.select(*partition_cols).distinct().count()
        salt = (F.abs(F.hash(*df.columns)) % files_per_partition).alias("_salt")
        out = out.repartition(
            max(1, n_values * files_per_partition),
            *[F.col(c) for c in partition_cols],
            salt,
        )
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    (
        out.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic" if dynamic else "static")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_lake(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned dataset; partition columns come back typed by
    directory-name inference, and predicates on them become
    PartitionFilters (directory pruning, zero I/O for pruned values)."""
    return spark.read.parquet(path)


# Process-lifetime READ-SCHEMA cache (r11, guide §6 plan-time costs):
# every schema-less spark.read.parquet re-infers the schema from
# parquet footers — measured 60-130 ms PER CALL on this box, and the
# index lifecycle verbs read their tables 4-10 times each. An index
# table's FILE SET mutates (appends, affected-partition rewrites,
# compactions) but its COLUMN SET never does within a process, so the
# first inference is cached per absolute path and later reads pass it
# explicitly. Metadata only — every read still scans the files on disk
# at call time. NOT for schema-evolving reads: the occ/snapshot paths
# read explicit file lists (never a bare table root) and don't come
# through here.
_READ_SCHEMA_CACHE: dict[str, object] = {}


def read_known_schema(spark: SparkSession, path: str) -> DataFrame:
    ap = _os.path.abspath(path)
    sch = _READ_SCHEMA_CACHE.get(ap)
    if sch is None:
        df = spark.read.parquet(path)
        _READ_SCHEMA_CACHE[ap] = df.schema
        return df
    return spark.read.schema(sch).parquet(path)


BATCH_FILE_PREFIX = "ingest-"  # batch-published data files: ingest-<batch>-<n>.parquet


def _publish_manifest_path(live_root: str, batch_id: int) -> str:
    return _os.path.join(live_root, f".publish-manifest-{batch_id}.json")


import itertools as _itertools

_PL_TMP_SEQ = _itertools.count()


def fsync_dir(path: str) -> None:
    """Make a directory's entries durable (rename/link commit points).
    THE shared implementation — maintenance.py's commit points alias
    it, so a durability fix lands once."""
    dfd = _os.open(path, _os.O_RDONLY)
    try:
        _os.fsync(dfd)
    finally:
        _os.close(dfd)


def write_json_durable(path: str, payload: dict) -> None:
    """temp + fsync + atomic rename + dir fsync: the one way any
    crash-recovery JSON artifact is written (publish manifests here;
    seal_manifest / checkpoint_snapshot in plans/maintenance.py
    delegate to this) — a torn artifact under the canonical name must
    be impossible. The tmp name is pid+sequence unique so concurrent
    writers in one process never interleave into the same staging
    file, and the tmp is unlinked on every error path (a crash between
    write and rename leaves only a residue the vacuum sweeps)."""
    import json as _json

    tmp = f"{path}.tmp-{_os.getpid()}-{next(_PL_TMP_SEQ)}"
    try:
        with open(tmp, "w") as fh:
            _json.dump(payload, fh)
            fh.flush()
            _os.fsync(fh.fileno())
        _os.replace(tmp, path)
    except BaseException:
        try:
            _os.remove(tmp)
        except OSError:
            pass
        raise
    fsync_dir(_os.path.dirname(path))


def _staged_touched(
    staging_root: str, tables: list[str] | tuple[str, ...]
) -> dict[str, list[str]]:
    """Per-table list of partition directories (relative to each
    table's stage root) a staged batch will touch — THE single
    implementation of the walk both the publish and its manifest
    writers use, so the scrub footprint and the manifest content can
    never drift."""
    touched: dict[str, list[str]] = {}
    for t in tables:
        stage = _os.path.join(staging_root, t)
        touched[t] = [
            _os.path.relpath(dirpath, stage)
            for dirpath, _dirs, files in sorted(_os.walk(stage))
            if any(f.endswith(".parquet") for f in files)
        ]
    return touched


def write_publish_manifest(
    live_root: str,
    staging_root: str,
    tables: list[str] | tuple[str, ...],
    batch_id: int,
) -> dict[str, list[str]]:
    """Write the pre-move publish manifest for a staged batch and
    return its touched-set — the exact artifact publish_staged_batch
    writes before its file moves. Exists so the crash-construction
    queries (ivf/text index vacuum) build their mid-move states from
    the SAME format the rollback reads instead of hand-rolling it.
    Durable (temp + fsync + rename) before it returns."""
    touched = _staged_touched(staging_root, tables)
    write_json_durable(
        _publish_manifest_path(live_root, batch_id),
        {t: sorted(rels) for t, rels in touched.items()},
    )
    return touched


def publish_staged_batch(
    staging_root: str, live_root: str, tables: list[str] | tuple[str, ...],
    batch_id: int,
) -> None:
    """Idempotently publish one micro-batch's MULTI-TABLE delta from a
    staging directory into the live index — the commit step that makes
    a three-table streaming append replay-safe where three naked
    ``mode("append")`` writes are not (a crash between them leaves the
    batch half-committed, and a replay keyed on any one table either
    drops the missing tables' rows forever or duplicates the written
    ones).

    Contract: the caller (a) stages every table's delta under
    ``staging_root/<table>`` with OVERWRITE semantics (so a replayed
    stage resets any partial previous attempt), (b) calls this, then
    (c) records the batch in its replay ledger LAST. This function is
    idempotent per (live_root, batch_id): it first scrubs any
    ``ingest-<batch_id>-*`` files a crashed previous attempt already
    moved in, then republishes the staged part files under those
    deterministic names (partition subdirectories are mirrored). A
    crash at ANY point therefore replays to exactly-once: before the
    ledger commit the batch replays and the scrub removes partial
    state; after it, the replay anti-join drops the batch.

    The scrub is bounded by the BATCH's partition footprint, never the
    index: the set of live directories a previous attempt could have
    touched is (a) recorded in a per-batch manifest written BEFORE any
    file moves (the crash-proof source of truth, deleted once the
    publish completes) and (b) independently derivable from the staged
    tree itself (a replayed stage is rebuilt from the same batch
    content, so its partition directories recur); the scrub lists only
    the union of those directories. The live table tree is never
    walked — on an object store that walk would be a full recursive
    listing per micro-batch.

    Driver-side file moves (os.replace) — the same per-batch rename
    fan-out a FileOutputCommitter performs; cost is O(batch files),
    never O(index)."""
    import json as _json
    import shutil as _shutil

    tag = f"{BATCH_FILE_PREFIX}{batch_id}-"
    # destination directories this batch touches, from the staged delta
    touched = _staged_touched(staging_root, tables)
    manifest = _publish_manifest_path(live_root, batch_id)
    scrub: dict[str, set[str]] = {t: set(rels) for t, rels in touched.items()}
    if _os.path.exists(manifest):  # a previous attempt crashed mid-move
        try:
            with open(manifest) as fh:
                for t, rels in _json.load(fh).items():
                    scrub.setdefault(t, set()).update(rels)
        except (OSError, ValueError):
            pass  # unreadable manifest: the staged-tree set still covers it
    for t, rels in scrub.items():
        live = _os.path.join(live_root, t)
        for rel in sorted(rels):
            d = live if rel == "." else _os.path.join(live, rel)
            if not _os.path.isdir(d):
                continue
            for f in _os.listdir(d):
                if f.startswith(tag):
                    _os.remove(_os.path.join(d, f))
    # manifest BEFORE the moves, DURABLE before the first move: a
    # crash mid-move leaves the exact touched-set on disk for the
    # replay's scrub — an unsynced manifest could tear while moved
    # files survive, leaving partials no scrub can ever find
    _os.makedirs(live_root, exist_ok=True)
    write_json_durable(
        manifest, {t: sorted(rels) for t, rels in touched.items()}
    )
    for t in tables:
        live = _os.path.join(live_root, t)
        stage = _os.path.join(staging_root, t)
        n = 0
        for dirpath, _dirs, files in sorted(_os.walk(stage)):
            rel = _os.path.relpath(dirpath, stage)
            for f in sorted(files):
                if not f.endswith(".parquet"):
                    continue  # _SUCCESS / .crc sidecars stay behind
                dest_dir = live if rel == "." else _os.path.join(live, rel)
                _os.makedirs(dest_dir, exist_ok=True)
                _os.replace(
                    _os.path.join(dirpath, f),
                    _os.path.join(dest_dir, f"{tag}{n}.parquet"),
                )
                n += 1
    _os.remove(manifest)
    _shutil.rmtree(staging_root, ignore_errors=True)


def rollback_orphan_publishes(
    live_root: str, min_age_seconds: float = 0.0
) -> dict[str, int]:
    """Vacuum an index: roll back every crashed publish and reclaim
    its scratch space. With the default ``min_age_seconds=0`` the
    index must be QUIESCED — no stream running against it and none
    that will replay its checkpoint — because a live stream's replay
    NEEDS the manifest + staged tree this removes (it would re-publish
    the batch correctly anyway, but the vacuum races the publish).

    ``min_age_seconds`` is the retention window that lifts the quiesce
    requirement (the same Delta VACUUM RETAIN shape as the lake's
    `vacuum_unreferenced`): a publish manifest or scratch tree younger
    than the window is possibly an IN-FLIGHT ingest between its stage
    write and its publish completion, so it is spared (counted in
    ``young_spared``) and only durably-abandoned state — every mtime
    in it past the window — is rolled back. The window must exceed
    BOTH the longest stage-to-publish latency AND a live stream's
    maximum replay gap (a batch that can still be replayed is by
    definition in-flight — Delta's VACUUM RETAIN rule verbatim); sized
    that way, a racing ingest's staged
    batch survives the vacuum and publishes cleanly afterwards. The
    manifest's age governs its whole batch: an old manifest's partial
    ``ingest-*`` files are scrubbed regardless of their own mtimes.

    A leftover ``.publish-manifest-<id>.json`` means publish_staged_batch
    crashed mid-move: the manifest (written before any move) names
    exactly the live partition directories the attempt could have
    touched, so the rollback scrubs ``ingest-<id>-*`` files from those
    directories only — the same batch-footprint bound as the publish's
    own scrub, never an O(index) walk — then retires the manifest.
    Because the committed ledger is appended only AFTER a publish
    completes and its manifest is removed, any manifest still on disk
    belongs to a batch the ledger does NOT contain; rolling its partial
    files back restores cross-table consistency (a half-moved batch
    leaves table A with rows table B never got).

    Also reclaimed: the ``.staging`` tree (crashed attempts' deltas,
    rebuilt from batch content on any replay), a ``.committed-seed-tmp``
    (crashed ledger bootstrap, rebuilt at next stream start), and
    ``.forget-stage-*`` dirs (crashed forget-request staging, rebuilt on
    retry). Returns per-category counts for the vacuum report."""
    import json as _json
    import re as _re
    import shutil as _shutil
    import time as _time

    report = {"rolled_back_batches": 0, "scrubbed_files": 0, "scratch_dirs": 0,
              "young_spared": 0, "tmp_files_removed": 0}
    if not _os.path.isdir(live_root):
        return report
    cutoff = _time.time() - min_age_seconds

    def _tree_old(path: str) -> bool:
        """Every mtime under ``path`` (files and dirs) is past the
        window — i.e. nothing in it can belong to an in-flight writer.
        Bounded by the scratch tree being aged, never the live index."""
        if min_age_seconds <= 0:
            return True
        try:
            if _os.path.getmtime(path) > cutoff:
                return False
            for dirpath, dirs, files in _os.walk(path):
                for name in dirs + files:
                    if _os.path.getmtime(_os.path.join(dirpath, name)) > cutoff:
                        return False
        except OSError:
            return False  # vanished mid-walk: a writer is active, spare
        return True

    for entry in sorted(_os.listdir(live_root)):
        if _re.fullmatch(r"\.publish-manifest-\d+\.json\.tmp-.+", entry):
            # write_json_durable staging residue (a writer that died
            # between its tmp write and the rename): never read by any
            # recovery path, reclaim under the same age rule
            full = _os.path.join(live_root, entry)
            if _tree_old(full):
                try:
                    _os.remove(full)
                    report["tmp_files_removed"] += 1
                except OSError:
                    pass  # vanished under us: nothing to reclaim
            else:
                report["young_spared"] += 1
            continue
        m = _re.fullmatch(r"\.publish-manifest-(\d+)\.json", entry)
        if not m:
            continue
        tag = f"{BATCH_FILE_PREFIX}{m.group(1)}-"
        manifest = _os.path.join(live_root, entry)
        if not _tree_old(manifest):
            # young manifest: possibly a publish between its manifest
            # write and its file moves — the in-flight shape the
            # retention window exists to spare
            report["young_spared"] += 1
            continue
        try:
            with open(manifest) as fh:
                touched = _json.load(fh)
        except (OSError, ValueError):
            # torn manifest (pre-durable-write crash state): retiring
            # it with touched={} would abandon the batch's partial
            # ingest files forever. Recover by a ONE-TIME full walk of
            # the live tables for this batch's tag — the only point in
            # the lifecycle allowed to walk the index, and only on the
            # corrupted path the durable manifest write makes
            # near-impossible. (The leftover staged tree is NOT a
            # sufficient source: a partition whose staged files were
            # ALL moved before the crash holds no .parquet in its
            # stage dir and would be missed — the walk finds the moves
            # wherever they landed.)
            touched = {}
            for t in sorted(_os.listdir(live_root)):
                troot = _os.path.join(live_root, t)
                if t.startswith(".") or not _os.path.isdir(troot):
                    continue
                rels = [
                    _os.path.relpath(dp, troot)
                    for dp, _dirs, files in sorted(_os.walk(troot))
                    if any(f.startswith(tag) for f in files)
                ]
                if rels:
                    touched[t] = rels
        if min_age_seconds > 0 and not _tree_old(manifest):
            # re-check at the last instant before destructive work: a
            # replaying publisher may have overwritten the manifest
            # between the loop-top age check and here. This shrinks the
            # check-to-act window to ~0; the remaining sliver is
            # covered by the window CONTRACT (min_age_seconds must
            # exceed the stream's maximum replay gap — a batch that can
            # still be replayed is by definition in-flight, exactly
            # Delta's VACUUM RETAIN rule).
            report["young_spared"] += 1
            continue
        for t, rels in touched.items():
            live = _os.path.join(live_root, t)
            for rel in rels:
                d = live if rel == "." else _os.path.join(live, rel)
                if not _os.path.isdir(d):
                    continue
                for f in _os.listdir(d):
                    if f.startswith(tag):
                        _os.remove(_os.path.join(d, f))
                        report["scrubbed_files"] += 1
        _os.remove(manifest)
        report["rolled_back_batches"] += 1
    for entry in sorted(_os.listdir(live_root)):
        if entry == ".staging":
            # per-batch grain: one young staged batch must not shield
            # its abandoned siblings (nor be eaten alongside them).
            # A batch's AGE is the newest of its staged tree AND its
            # publish manifest: a publisher can pick up an old staged
            # batch and write a fresh manifest just before its moves —
            # reclaiming that stage mid-publish would complete the
            # publish with zero files moved and the ledger recording
            # the batch as published (silent loss).
            staging = _os.path.join(live_root, entry)
            spared = 0
            for child in sorted(_os.listdir(staging)):
                full = _os.path.join(staging, child)
                man_of_child = None
                bm = _re.fullmatch(r"batch-(\d+)", child)
                if bm:
                    cand = _publish_manifest_path(live_root, int(bm.group(1)))
                    if _os.path.exists(cand):
                        man_of_child = cand
                young = not _tree_old(full) or (
                    man_of_child is not None and not _tree_old(man_of_child)
                )
                if young:
                    spared += 1
                elif _os.path.isdir(full):
                    _shutil.rmtree(full, ignore_errors=True)
                    report["scratch_dirs"] += 1
                else:
                    # stray non-directory scratch (a crashed writer's
                    # temp artifact): rmtree would silently no-op
                    try:
                        _os.remove(full)
                        report["scratch_dirs"] += 1
                    except OSError:
                        pass  # vanished under us
            report["young_spared"] += spared
            if not spared:
                try:
                    _os.rmdir(staging)
                except OSError:
                    pass  # a racing ingest re-created a child: leave it
        elif (
            entry in (".committed-seed-tmp", ".committed-compact-tmp")
            or entry.startswith(".forget-stage-")
            or (entry.startswith(".") and entry.endswith("-rewrite-tmp"))
        ):
            full = _os.path.join(live_root, entry)
            if _tree_old(full):
                _shutil.rmtree(full, ignore_errors=True)
                report["scratch_dirs"] += 1
            else:
                report["young_spared"] += 1
        elif entry.startswith(".") and entry.endswith("-rewrite-old"):
            # rewrite_table_atomic's parked old table: a RECOVERY source
            # while the table directory itself is missing (a crash
            # between the swap's two renames) — restore it; scratch only
            # once the swapped-in table exists (same rule as
            # .committed-old below)
            full = _os.path.join(live_root, entry)
            table = _os.path.join(live_root, entry[1 : -len("-rewrite-old")])
            if not _os.path.exists(table):
                _os.rename(full, table)
            elif _tree_old(full):
                _shutil.rmtree(full, ignore_errors=True)
                report["scratch_dirs"] += 1
            else:
                report["young_spared"] += 1
    # the parked pre-compaction ledger is a RECOVERY source while
    # `committed` is missing (see incremental._ensure_committed_ledger);
    # it is scratch only once the swapped-in ledger exists
    old_ledger = _os.path.join(live_root, ".committed-old")
    if _os.path.isdir(old_ledger) and _os.path.isdir(
        _os.path.join(live_root, "committed")
    ):
        if _tree_old(old_ledger):
            _shutil.rmtree(old_ledger, ignore_errors=True)
            report["scratch_dirs"] += 1
        else:
            report["young_spared"] += 1
    return report


def rewrite_affected_partitions(
    spark: SparkSession,
    table_path: str,
    part_col: str,
    victims: DataFrame,
    key: str | list[str],
) -> None:
    """Delete-compaction for one hive-partitioned table: remove every
    row whose ``key`` matches the (small) ``victims`` frame, rewriting
    ONLY the partitions that contain a victim row. THE single
    implementation of the affected-partition rewrite — the IVF
    tombstone fold, the dedup-signature purge, and the text-index
    forget verb all delete through here, so the partition-surgery
    semantics cannot drift between index families.

    Mechanics: (1) the affected-partition set is gathered as a
    driver-side scalar — bounded by the number of partitions the
    forget request touches, the same driver-side shape production
    table formats keep in their metadata store; (2) partitions with
    survivors are dynamic-partition-overwritten (untouched partitions
    are never listed, let alone rewritten); (3) partitions whose every
    row died are dropped at the directory level, because dynamic
    overwrite cannot emit an empty partition.

    Scale shape: cost is proportional to the affected partitions'
    data, not the table size — a K-row forget request against a
    100 TB index rewrites only the directories K rows live in.

    Atomicity boundary, stated honestly: the dynamic overwrite's job
    commit replaces each affected partition by delete-then-move on
    plain parquet directories — not transactional, so a crash INSIDE
    the commit can leave an affected partition half-replaced. Retrying
    the surrounding verb converges for every state the anti-join can
    see (it is idempotent over clean or victim-bearing partitions),
    but not for a torn partition; closing that last window requires a
    manifest-pinned table layout where the rewrite seals a new file
    set and readers never list directories (the time-travel pattern in
    plans/maintenance.py seal_manifest/read_snapshot), which is how
    production table formats do deletes. The registered queries
    rebuild their indexes per run, so they never read a torn state."""
    import shutil as _shutil

    keys = [key] if isinstance(key, str) else list(key)
    tbl = spark.read.parquet(table_path)
    # ONE flag scan decides both driver-side sets (r10: the old shape
    # ran a second aggregate-and-collect over the checkpointed
    # survivors just to learn which affected partitions kept rows —
    # the same information this scan already has): per partition,
    # does any row match a victim (affected), and does any row
    # survive the anti-join (kept)? Only victim-BEARING partitions
    # matter downstream, so the aggregate is filtered to them.
    vmark = victims.select(
        *[F.col(k).alias(f"_vk_{i}") for i, k in enumerate(keys)]
    ).withColumn("_v", F.lit(1))
    cond = [F.col(k) == F.col(f"_vk_{i}") for i, k in enumerate(keys)]
    flags = (
        tbl.join(F.broadcast(vmark), cond, "left")
        .groupBy(part_col)
        .agg(
            F.max(F.coalesce(F.col("_v"), F.lit(0))).alias("has_victim"),
            F.max(F.when(F.col("_v").isNull(), 1).otherwise(0)).alias(
                "has_survivor"
            ),
        )
        .where(F.col("has_victim") == 1)
        .collect()
    )
    affected = {r[part_col] for r in flags}
    if not affected:
        return
    kept = {r[part_col] for r in flags if r["has_survivor"] == 1}
    survivors = (
        tbl.where(F.col(part_col).isin(list(affected)))
        .join(F.broadcast(victims), keys, "left_anti")
        .localCheckpoint(eager=True)
    )
    write_partitioned(survivors, table_path, [part_col], dynamic=True)
    for p in affected - kept:
        _shutil.rmtree(
            _os.path.join(table_path, f"{part_col}={p}"), ignore_errors=True
        )


def rewrite_table_atomic(
    df: DataFrame, table_path: str, partition_cols: list[str] | None = None
) -> None:
    """Rewrite a parquet table with content derived FROM ITSELF in one
    Spark job: write ``df`` to a sibling tmp directory (hive-partitioned
    when ``partition_cols`` is given), then swap directories (park-old →
    rename-in → reclaim, the compact_committed_ledger protocol).
    Replaces the checkpoint-then-overwrite pattern, which cost TWO jobs
    (one to materialize the checkpoint so the overwrite couldn't race
    its own source, one to write) and could strand a truncated table if
    the in-place overwrite crashed mid-write.

    Crash contract, stated honestly: readers see either the old table
    or the new one, never a PARTIAL — but the swap is two renames, not
    one atomic operation, so a crash between them leaves the table
    directory MISSING with the complete old content parked at
    ``.{name}-rewrite-old``. Recovery is the ``.committed-old`` pattern
    (incremental._ensure_committed_ledger): the next entry here — or
    ``rollback_orphan_publishes``, which recognizes both sidecar names —
    restores the parked table before doing anything else. A same-
    filesystem ``os.rename`` is assumed (the local-lake abstraction);
    an object-store port swaps a manifest pointer instead (the
    seal_manifest pattern in plans/maintenance.py)."""
    import shutil as _sh

    parent = _os.path.dirname(table_path.rstrip("/"))
    name = _os.path.basename(table_path.rstrip("/"))
    tmp = _os.path.join(parent, f".{name}-rewrite-tmp")
    old = _os.path.join(parent, f".{name}-rewrite-old")
    # a prior rewrite that crashed between its two renames left the
    # complete old table parked — restore it (it IS the current table)
    if not _os.path.exists(table_path) and _os.path.isdir(old):
        _os.rename(old, table_path)
    _sh.rmtree(tmp, ignore_errors=True)
    _sh.rmtree(old, ignore_errors=True)
    if partition_cols:
        write_partitioned(df, tmp, partition_cols, dynamic=False)
    else:
        df.write.mode("overwrite").parquet(tmp)
    _os.rename(table_path, old)
    _os.rename(tmp, table_path)
    _sh.rmtree(old, ignore_errors=True)


# ---------------------------------------------------------------------------
# ORC lake round trip — the second columnar container Spark ships a
# native vectorized reader/writer for. Same hive-partitioned layout and
# pruning contract as the parquet lake above; registering it as an
# oracled query proves the engine's source surface is not
# parquet-monogamous (a training-data lake frequently ingests ORC from
# Hive-era warehouses).
# ---------------------------------------------------------------------------

import os as _os

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def scratch_path(base: str, sf_dir: str, tag: str = "") -> str:
    """Scratch directory keyed by the RESOLVED dataset path (hashed):
    distinct datasets with equal basenames (two sf0.001 dirs) must not
    share an index directory. THE single implementation of the keying
    contract — every persisted-index query (similarity, dedup,
    streaming ingest) derives its paths here, so a change to the
    scheme cannot silently split or share directories between them."""
    import hashlib

    ap = _os.path.abspath(sf_dir.rstrip("/"))
    key = hashlib.md5(ap.encode()).hexdigest()[:8]
    return _os.path.join(base, f"{_os.path.basename(ap)}_{key}{tag}")

_SCRATCH_ORC = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
    ".scratch",
    "orc_lake",
)


def orc_lake_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → hive-partitioned ORC (partitioned by lang, one file
    per partition) → read back with a partition-key predicate →
    per-source stats. The oracle computes the same aggregate straight
    off the parquet originals, so the round trip is value-checked:
    any column loss, dtype drift, or partition mix-up in the ORC path
    breaks the hash. Partition pruning on lang works exactly as in the
    parquet lake (directory-level, before file open)."""
    from automated_dow30_earnings_reports_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    path = scratch_path(_SCRATCH_ORC, sf_dir)
    (
        d.repartition(F.col("lang"))
        .write.mode("overwrite")
        .partitionBy("lang")
        .orc(path)
    )
    back = spark.read.orc(path).filter(F.col("lang") == "en")
    return (
        back.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
        .orderBy("source")
    )


QUERIES["orc_lake_roundtrip"] = orc_lake_roundtrip
ORACLES["orc_lake_roundtrip"] = """
    SELECT source,
           CAST(COUNT(*) AS BIGINT)    AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT)  AS first_doc
    FROM documents
    WHERE lang = 'en'
    GROUP BY source
    ORDER BY source
"""


_SCRATCH_COMPACT = _os.path.join(
    _os.path.dirname(_SCRATCH_ORC), "compaction"
)

COMPACT_FRAGMENTS = 50  # simulated small-file count
COMPACT_TARGET_FILES = 4


def lake_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (the OPTIMIZE half of Delta/Iceberg table
    maintenance, minus Z-order which `zorder_cluster` covers): write a
    deliberately fragmented lake (COMPACT_FRAGMENTS=50 tiny files —
    the classic streaming-ingest pathology), rewrite it into
    COMPACT_TARGET_FILES=4 right-sized files, and prove the rewrite is
    CONTENT-TRANSPARENT by aggregating the compacted lake against the
    originals' oracle.

    Scale shape: compaction is one read + one round-robin repartition
    + one write — linear, no wide shuffle keyed on data values (round-
    robin needs no key distribution knowledge). In production the
    repartition count comes from bytes/target_file_size and the
    rewrite runs per-partition-directory so only fragmented partitions
    pay; file-count assertions are the job's own completion check
    (pinned in tests/test_parquet_lake.py)."""
    from automated_dow30_earnings_reports_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    path = scratch_path(_SCRATCH_COMPACT, sf_dir)
    frag = _os.path.join(path, "fragmented")
    compacted = _os.path.join(path, "compacted")
    d.repartition(COMPACT_FRAGMENTS).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).repartition(COMPACT_TARGET_FILES).write.mode(
        "overwrite"
    ).parquet(compacted)

    def n_files(p: str) -> int:
        return sum(1 for f in _os.listdir(p) if f.endswith(".parquet"))

    back = spark.read.parquet(compacted)
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.count_distinct("doc_id").cast("bigint").alias("n_distinct_ids"),
        )
        .withColumn("files_before", F.lit(n_files(frag)).cast("int"))
        .withColumn("files_after", F.lit(n_files(compacted)).cast("int"))
        .orderBy("lang")
    )


QUERIES["lake_compaction"] = lake_compaction
ORACLES["lake_compaction"] = f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)           AS n_docs,
           CAST(SUM(n_chars) AS BIGINT)       AS total_chars,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct_ids,
           CAST({COMPACT_FRAGMENTS} AS INT)   AS files_before,
           CAST({COMPACT_TARGET_FILES} AS INT) AS files_after
    FROM documents
    GROUP BY lang
    ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Schema evolution: a lake ingests files written under DIFFERENT
# schema versions (columns added over time). mergeSchema reconciles
# them at read; rows from pre-evolution files surface NULL for the
# added columns — never an error, never silent column loss.
# ---------------------------------------------------------------------------

_SCRATCH_EVO = _os.path.join(_os.path.dirname(_SCRATCH_ORC), "schema_evo")


def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the documents table as two generations — v1 without the
    quality column, v2 (doc_id >= 250) with a computed `quality`
    double — then read the union with mergeSchema and aggregate per
    generation. The oracle recomputes from the base table, so dropped
    columns, misaligned NULLs, or generation mix-ups break the hash.

    Scale shape: schema reconciliation happens at footer-read time on
    the driver (one pass over file footers, not data); the scan itself
    stays a plain pruned columnar read. The alternative — rewriting
    history to the new schema — is a full-corpus rewrite; this is why
    additive evolution + mergeSchema is the production default."""
    from automated_dow30_earnings_reports_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    path = scratch_path(_SCRATCH_EVO, sf_dir)
    v1 = d.where(F.col("doc_id") < 250).select("doc_id", "lang", "n_chars")
    v2 = (
        d.where(F.col("doc_id") >= 250)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(F.col("n_chars") / 100.0, 4).alias("quality"),
        )
    )
    v1.write.mode("overwrite").parquet(_os.path.join(path, "gen=1"))
    v2.write.mode("overwrite").parquet(_os.path.join(path, "gen=2"))
    back = spark.read.option("mergeSchema", True).parquet(
        _os.path.join(path, "gen=1"), _os.path.join(path, "gen=2")
    )
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("quality").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_pre_evolution"),
            F.round(
                F.sum(F.coalesce(F.col("quality"), F.lit(0.0)).cast("decimal(18,4)"))
                .cast("double"),
                4,
            ).alias("total_quality"),
        )
        .orderBy("lang")
    )


QUERIES["schema_evolution_read"] = schema_evolution_read
ORACLES["schema_evolution_read"] = """
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (doc_id < 250) AS BIGINT) AS n_pre_evolution,
           ROUND(CAST(SUM(CASE WHEN doc_id >= 250
                               THEN CAST(ROUND(n_chars / 100.0, 4) AS DECIMAL(18,4))
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE), 4)
             AS total_quality
    FROM documents
    GROUP BY lang
    ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Zone-map file skipping AS DATA: the decision a lakehouse reader
# makes from footer min/max stats, materialized so it can be audited.
# ---------------------------------------------------------------------------

SKIP_N_FILES = 16
SKIP_PRED_LO = 400.0  # value BETWEEN bounds the predicate probes
SKIP_PRED_HI = 500.0


def file_skipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simulate zone-map pruning over a value-clustered lake: orders
    are range-bucketed into SKIP_N_FILES 'files' by equal-width
    totalprice ranges (the effect of a range-partitioned sorted
    write), per-file min/max footer stats are computed, and the
    predicate `totalprice BETWEEN 400 AND 500` is evaluated AGAINST
    THE STATS ONLY. Output: per-file stats, whether the file would be
    skipped, and the row counts proving skip-correctness (a skipped
    file must contain 0 matching rows).

    Scale shape: this is the arithmetic a reader does per row group
    from footer metadata — O(files), zero data I/O. Materializing it
    as a query makes layout quality measurable: the fraction of files
    skippable for a point/range predicate IS the clustering quality
    metric (compare zorder_cluster, which builds such a layout).
    File assignment is a broadcast of the 1-row global (min, max)
    followed by pure-codegen bucket arithmetic — no global sort, no
    single-partition window (the r4 ntile form put the whole fact
    table through `Window.orderBy`, one task at 100×; this form is a
    map-side expression). The identical IEEE-double expression runs
    in the oracle, so bucket edges agree bit-for-bit."""
    from automated_dow30_earnings_reports_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    bounds = o.agg(
        F.min("o_totalprice").alias("price_lo"),
        F.max("o_totalprice").alias("price_hi"),
    )
    # 1-row bound frame: broadcast cross join, then file_id is codegen
    # arithmetic. Guard the degenerate all-equal-price lake (div by 0
    # under ANSI mode); floor() of the same double expression both
    # engines, clamped so price == max lands in the last file.
    span = F.col("price_hi") - F.col("price_lo")
    raw = F.floor((F.col("o_totalprice") - F.col("price_lo")) * SKIP_N_FILES / span)
    binned = o.join(F.broadcast(bounds)).withColumn(
        "file_id",
        F.when(span == 0, F.lit(1))
        .otherwise(F.least(raw + 1, F.lit(SKIP_N_FILES)))
        .cast("int"),
    )
    stats = binned.groupBy("file_id").agg(
        F.min("o_totalprice").alias("stat_min"),
        F.max("o_totalprice").alias("stat_max"),
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(
            F.when(
                (F.col("o_totalprice") >= SKIP_PRED_LO)
                & (F.col("o_totalprice") <= SKIP_PRED_HI),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_matching"),
    )
    skipped = (F.col("stat_max") < SKIP_PRED_LO) | (F.col("stat_min") > SKIP_PRED_HI)
    return stats.select(
        "file_id",
        F.round("stat_min", 2).alias("stat_min"),
        F.round("stat_max", 2).alias("stat_max"),
        "n_rows",
        "n_matching",
        skipped.alias("skipped"),
    ).orderBy("file_id")


QUERIES["file_skipping_stats"] = file_skipping_stats
ORACLES["file_skipping_stats"] = f"""
    WITH bounds AS (
      SELECT MIN(o_totalprice) AS price_lo, MAX(o_totalprice) AS price_hi
      FROM orders
    ),
    binned AS (
      SELECT o_totalprice,
             CAST(CASE WHEN price_hi - price_lo = 0 THEN 1
                  ELSE LEAST(
                    FLOOR((o_totalprice - price_lo) * {SKIP_N_FILES}
                          / (price_hi - price_lo)) + 1,
                    {SKIP_N_FILES})
                  END AS INTEGER) AS file_id
      FROM orders, bounds
    ),
    stats AS (
      SELECT file_id,
             MIN(o_totalprice) AS mn,
             MAX(o_totalprice) AS mx,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) FILTER (o_totalprice BETWEEN {SKIP_PRED_LO} AND {SKIP_PRED_HI})
                  AS BIGINT) AS n_matching
      FROM binned GROUP BY file_id
    )
    SELECT file_id,
           ROUND(mn, 2) AS stat_min,
           ROUND(mx, 2) AS stat_max,
           n_rows,
           n_matching,
           (mx < {SKIP_PRED_LO} OR mn > {SKIP_PRED_HI}) AS skipped
    FROM stats
    ORDER BY file_id
"""


# ---------------------------------------------------------------------------
# Dynamic partition pruning: the fact side is hive-partitioned on
# o_year, the dim side's filter is on a NON-partition attribute — so
# static pruning can't help, and the scan's partition filter must come
# from the dim subquery AT RUNTIME (DPP). The plan carries
# `dynamicpruningexpression` in PartitionFilters (pinned in
# tests/test_parquet_lake.py); the oracle recomputes the join from the
# unpartitioned base table.
# ---------------------------------------------------------------------------

_SCRATCH_DPP = _os.path.join(_os.path.dirname(_SCRATCH_ORC), "dpp_lake")


def dpp_partitioned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per probe-year over a year-partitioned orders lake,
    probe years selected by a dim-side attribute filter. At 100 TB
    this is THE mechanism that keeps star joins off cold partitions:
    the broadcast of the filtered dim doubles as the partition filter,
    so directories for non-probe years are never listed past the
    index, let alone read. Cited shape: every reference query that
    filters by (year, quarter) after joining metadata
    (download_reports.py:302-347) becomes this plan once the lake is
    partitioned on year."""
    from automated_dow30_earnings_reports_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    path = scratch_path(_SCRATCH_DPP, sf_dir)
    (
        o.withColumn("o_year", F.year("o_orderdate").cast("int"))
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(path)
    )
    fact = spark.read.parquet(path)
    dim = (
        o.select(F.year("o_orderdate").cast("int").alias("o_year"))
        .distinct()
        .withColumn(
            "tag", F.when(F.col("o_year") % 3 == 0, "probe").otherwise("other")
        )
    )
    return (
        fact.join(dim.where(F.col("tag") == "probe").drop("tag"), "o_year")
        .groupBy("o_year")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_price"),
        )
        .orderBy("o_year")
    )


QUERIES["dpp_partitioned_join"] = dpp_partitioned_join
ORACLES["dpp_partitioned_join"] = """
    WITH y AS (
      SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS o_year FROM orders
    ),
    probe AS (SELECT o_year FROM y WHERE o_year % 3 = 0)
    SELECT p.o_year AS o_year,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_price
    FROM orders o JOIN probe p ON CAST(year(o.o_orderdate) AS INTEGER) = p.o_year
    GROUP BY p.o_year
    ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Bucketed tables: the pre-shuffled co-located join. Both fact tables
# are written bucketBy(join key) + sortBy into managed tables ONCE;
# every subsequent join on that key reads bucket-aligned scans with NO
# Exchange on either side (tests/test_bucketed_join.py pins the
# no-Exchange plan property under forced sort-merge join). This is the
# standing fix for iterative-join reuse that localCheckpoint cannot
# provide (checkpoints lose outputPartitioning under AQE).
# ---------------------------------------------------------------------------

BJA_BUCKETS = 8


def bucketed_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders through BUCKETED managed tables: write both
    sides bucketBy(8, join key) + sortBy (idempotent overwrite; table
    names carry the dataset hash so distinct sf dirs never collide),
    then join the bucketed reads and aggregate revenue per order
    status.

    Scale shape: the bucketed write pays one shuffle ONCE; after that
    every key-equi-join between the two tables is exchange-free — at
    100 TB with a join-heavy workload this converts the per-query
    O(data) shuffle into a per-ingest cost. The aggregate's own 3-key
    exchange is the only per-query shuffle left. Correctness is
    content-transparency: the answer must equal the plain-scan oracle
    exactly (DECIMAL revenue so summation order can't drift)."""
    from automated_dow30_earnings_reports_spark.tables import load_table

    import re as _re

    # table names must be identifier-safe: dots would parse as a
    # schema separator, dashes are illegal unquoted
    key = _re.sub(r"[^A-Za-z0-9_]", "_", scratch_path("", sf_dir).strip("/"))
    li_tbl, ord_tbl = f"li_bja_{key}", f"ord_bja_{key}"
    # Cross-session idempotency: the default metastore is per-session,
    # so a table directory left by an earlier process is UNKNOWN to
    # this catalog and saveAsTable("overwrite") refuses the non-empty
    # location. Drop what the catalog knows, then clear stale dirs.
    import shutil as _shutil
    from urllib.parse import urlparse as _urlparse

    wh = _urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for tbl in (li_tbl, ord_tbl):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        _shutil.rmtree(_os.path.join(wh, tbl), ignore_errors=True)
    load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    ).write.mode("overwrite").bucketBy(BJA_BUCKETS, "l_orderkey").sortBy(
        "l_orderkey"
    ).saveAsTable(li_tbl)
    load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    ).write.mode("overwrite").bucketBy(BJA_BUCKETS, "o_orderkey").sortBy(
        "o_orderkey"
    ).saveAsTable(ord_tbl)
    li, orders = spark.table(li_tbl), spark.table(ord_tbl)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (1 - F.col("l_discount").cast("decimal(18,2)"))
                ).cast("double"),
                2,
            ).alias("revenue"),
        )
        .orderBy("o_orderstatus")
    )


QUERIES["bucketed_join_agg"] = bucketed_join_agg
ORACLES["bucketed_join_agg"] = """
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2)
             AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
"""
