"""Streaming surface beyond window aggs (SURVEY §2.9): the crawl as an
incremental pipeline.

The reference's BFS frontier loop (enhanced_selenium_scraper.py:717-754)
is batch, but its shape — "new URLs arrive, fetch them, keep only
unseen links" — is exactly an incremental stream:

  - ``dedup_links_stream``: the visited-set (:129, :722) as Spark's
    built-in streaming dedup state — exact reference parity, which
    means state as unbounded as the reference's Python set; the
    bounded-state production forms are ``dedup_links_within_watermark``
    (per-key TTL) and the committed-sink anti-join below;
  - ``start_incremental_crawl``: seeds arrive as files; each
    micro-batch runs the batch fetch/extract stages via
    ``foreachBatch`` and appends only never-seen links to the sink —
    checkpointed, so a restart resumes from the last committed batch;
  - ``new_links_stateful``: the same visited-set as an explicit
    ``applyInPandasWithState`` operator (per-company state), the
    custom-stateful-operator escape hatch for semantics the built-in
    dedup can't express (e.g. per-key budgets, the rate-limiter
    family from extract_reports.py:98-108).

Scale notes: streaming dedup state shuffles on the dedup key exactly
like batch dropDuplicates; keeping 100 TB of history out of the state
store takes an explicit per-key TTL (dropDuplicatesWithinWatermark) or
moving the visited-set into the sink — a watermark alone does not
bound plain dropDuplicates state. foreachBatch sinks must tolerate batch
replay — the anti-join against the already-committed sink makes the
append idempotent.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from automated_dow30_earnings_reports_spark.pipeline.crawl import extract_links
from automated_dow30_earnings_reports_spark.pipeline.fetch import FetcherFactory, fetch_stage


def dedup_links_stream(links: DataFrame) -> DataFrame:
    """Streaming visited-set with the reference's EXACT semantics: the
    first sighting of each href survives, forever
    (enhanced_selenium_scraper.py:129's Python set). State is therefore
    keyed by every distinct href ever seen and is NOT bounded by a
    watermark — Spark evicts dropDuplicates state only when the
    event-time column is part of the dedup subset, and putting ts in
    the subset would change the semantics (same href at two timestamps
    would both survive). A watermark on the input would silently do
    nothing for this operator, so none is taken. For an unbounded
    crawl use the bounded-state forms instead:
    ``dedup_links_within_watermark`` (per-key TTL via
    dropDuplicatesWithinWatermark) or the committed-sink anti-join in
    ``start_incremental_crawl`` (state lives in the sink, not the
    state store)."""
    return links.dropDuplicates(["href"])


def start_incremental_crawl(
    spark: SparkSession,
    seeds_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    fetcher_factory: FetcherFactory,
    available_now: bool = True,
):
    """Incremental crawl: a stream of seed files (lines ``company,url``)
    drives the batch fetch/extract stages per micro-batch; only links
    never committed to ``out_dir`` are appended (replay-safe)."""
    seeds = (
        spark.readStream.format("text")
        .load(seeds_dir)
        .select(
            F.split("value", ",").getItem(0).alias("company"),
            F.split("value", ",").getItem(1).alias("url"),
        )
        .where(F.col("url").isNotNull())
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pages = fetch_stage(batch_df, fetcher_factory).filter(F.col("html").isNotNull())
        links = extract_links(pages).dropDuplicates(["company", "href"])
        sess = batch_df.sparkSession
        if os.path.isdir(out_dir) and any(
            f.endswith(".parquet") for f in os.listdir(out_dir)
        ):
            seen = sess.read.parquet(out_dir).select("company", "href")
            links = links.join(seen, ["company", "href"], "left_anti")
        links.write.mode("append").parquet(out_dir)

    writer = (
        seeds.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Custom stateful operator: per-company visited set.
# ---------------------------------------------------------------------------

_NEW_LINKS_OUTPUT = StructType(
    [
        StructField("company", StringType(), False),
        StructField("href", StringType(), False),
    ]
)
_VISITED_STATE = StructType([StructField("seen", ArrayType(StringType()), True)])


def _emit_new_links(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (company,) = key
    seen: set[str] = set(state.get[0]) if state.exists else set()
    fresh: list[str] = []
    for pdf in pdfs:
        for href in pdf["href"]:
            if href not in seen:
                seen.add(href)
                fresh.append(href)
    state.update((list(seen),))
    yield pd.DataFrame({"company": [company] * len(fresh), "href": fresh})


def new_links_stateful(links: DataFrame) -> DataFrame:
    """U2/P10 as an explicit stateful operator: per-company state holds
    the visited hrefs; each micro-batch emits only unseen ones. State
    here is unbounded like the reference's set — production keys it
    with a timeout (GroupStateTimeout) or a watermark-scoped key."""
    return links.groupBy("company").applyInPandasWithState(
        _emit_new_links,
        outputStructType=_NEW_LINKS_OUTPUT,
        stateStructType=_VISITED_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_links_within_watermark(
    links: DataFrame, ts_col: str = "ts", delay: str = "10 minutes"
) -> DataFrame:
    """Bounded-state streaming dedup (Spark 3.5+
    ``dropDuplicatesWithinWatermark``): a key's state lives only until
    the watermark passes its event time + delay, after which the same
    href is re-admitted. Unlike ``dedup_links_stream`` (plain
    dropDuplicates, whose state for keys that never recur can only be
    dropped wholesale at the watermark), this gives every key an
    explicit TTL — the form you run over an unbounded crawl where
    re-seeing a URL after a day SHOULD re-fetch it."""
    return links.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(["href"])


# ---------------------------------------------------------------------------
# Streaming -> persisted-index composition: the "continuously-ingesting
# vector store". The kvlinks streaming source tails a landing directory
# of ARRIVAL records (vec_id per line — the CDC shape: the stream says
# what landed, the payload stays in the lake); each micro-batch joins
# the ids back to the embeddings table, assigns them against the STORED
# centroid table (ivf_index_append's ingest contract,
# operators/similarity.py), and appends cell-partitioned postings.
# Replay-safe: an anti-join against the already-committed postings
# makes a replayed or duplicate-arrival batch a no-op, exactly
# start_incremental_crawl's sink contract. Checkpointed, so a restart
# resumes from the last committed file-set offset.
# ---------------------------------------------------------------------------

def _rks(spark: SparkSession, path: str) -> DataFrame:
    """Schema-stable table read through the process-wide cached-schema
    helper (r11): the per-batch committed-ledger read and the final
    index reads re-inferred their schemas from footers on every call
    (~60-130 ms each). Metadata cache only — data is re-read per call."""
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        read_known_schema,
    )

    return read_known_schema(spark, path)


QUERIES: dict = {}
ORACLES: dict[str, str] = {}

_SCRATCH_SIVF = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
    "streaming_ivf",
)


def _arrival_stream(spark: SparkSession, landing_dir: str, key: str) -> DataFrame:
    """Tail a kvlinks-format landing directory with Spark's NATIVE file
    stream source + the shared kv_text regex projection (one
    regexp_extract fused into the scan).

    r11 optimization (guide §4 "the Python boundary", measured): the
    Python DataSource stream reader (``format("kvlinks")``) spawns a
    dedicated Python runner process at every stream start — ~2.0 s
    fixed cost per drain on this box (kvlinks empty redrain 1.98 s vs
    0.12 s for the native text source; steady-state drain 2.9 s vs
    1.0 s) — and, being a SimpleDataSourceStreamReader, ships every
    arrival row through that single driver-side process: a latency tax
    per drain here and a driver throughput ceiling at 100 TB arrival
    volume. The native source plans arrival files as executor-side
    splits and keeps its own checkpointed seen-files log, so restart /
    replay semantics and the downstream exactly-once ledger protocol
    are unchanged, and the parse is the same boundary-anchored
    ``key='value'`` capture the kvlinks reader applies
    (sources/kv_text._extract_field — the declarative twin the
    connector module documents). The kvlinks STREAMING reader remains
    a first-class connector surface, pinned directly by
    tests/test_kv_datasource.py; the ingest queries just stop paying
    its per-start runner spawn. Arrival records are written by the
    kvlinks WRITER as before (atomic part publish + _SUCCESS manifest;
    the underscore name is invisible to the native listing too)."""
    from automated_dow30_earnings_reports_spark.sources.kv_text import (
        _extract_field,
    )

    return (
        spark.readStream.format("text")
        .load(landing_dir)
        .select(_extract_field(F.col("value"), key).cast("bigint").alias(key))
    )


def start_ivf_ingest_stream(
    spark: SparkSession,
    landing_dir: str,
    index_path: str,
    checkpoint_dir: str,
    emb: DataFrame,
    available_now: bool = True,
):
    """Tail ``landing_dir`` (kvlinks arrival records, schema
    ``vec_id bigint``) and append each micro-batch into the persisted
    IVF index at ``index_path``. Ingest cost per batch is
    O(batch x K) assignment + an append write — independent of index
    size; replay safety rides the shared exactly-once ``_ingest_batch``
    protocol (committed vec_id ledger + staged publish), the same
    commit path as the dedup and text streams."""
    from automated_dow30_earnings_reports_spark.operators.similarity import (
        _assign_cells,
    )
    from automated_dow30_earnings_reports_spark.sources.kv_datasource import register
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        read_known_schema,
        write_partitioned,
    )

    register(spark)
    ledger = _ensure_committed_ledger(spark, index_path, "postings", key="vec_id")
    arrivals = _arrival_stream(spark, landing_dir, "vec_id")

    def stage_ivf(fresh_vecs: DataFrame, staging: str) -> None:
        idx_cents = read_known_schema(spark, os.path.join(index_path, "centroids"))
        write_partitioned(
            _assign_cells(fresh_vecs, idx_cents),
            os.path.join(staging, "postings"),
            ["cell"],
            dynamic=False,
        )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        _ingest_batch(
            batch_df,
            batch_id,
            key="vec_id",
            source=emb,
            index_path=index_path,
            tables=("postings",),
            ledger=ledger,
            stage=stage_ivf,
        )

    writer = arrivals.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_ivf_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full composition, driver-oracled: (1) BUILD the IVF index on
    the initial corpus slice (vec_id < IVF_APPEND_SPLIT, seed
    centroids); (2) publish the remaining vec_ids as kvlinks arrival
    files in a fresh landing directory; (3) run the checkpointed
    ingest stream to exhaustion (availableNow); (4) SEARCH the
    persisted index. Converges to the same index a batch append (or a
    full rebuild) produces — the oracle is the from-scratch IVF
    (rows-equivalence through a streaming engine, the window_* oracle
    pattern), so the hash proves the streaming path lost/duplicated
    nothing. Restart/replay safety is pinned in
    tests/test_round6_ops.py."""
    import shutil

    from automated_dow30_earnings_reports_spark.operators.similarity import (
        IVF_APPEND_SPLIT,
        IVF_CELLS,
        _assign_cells,
        _emb,
        _query_vectors,
        _search_index,
    )
    from automated_dow30_earnings_reports_spark.sources.kv_datasource import register
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        write_partitioned,
    )

    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        scratch_path,
    )

    register(spark)
    base = scratch_path(_SCRATCH_SIVF, sf_dir)
    shutil.rmtree(base, ignore_errors=True)  # fresh lifecycle per invocation
    landing = os.path.join(base, "landing")
    ckpt = os.path.join(base, "ckpt")
    index_path = os.path.join(base, "index")

    e = _emb(spark, sf_dir)
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

    e.where(F.col("vec_id") >= IVF_APPEND_SPLIT).select("vec_id").write.format(
        "kvlinks"
    ).option("path", landing).mode("append").save()

    q = start_ivf_ingest_stream(spark, landing, index_path, ckpt, e)
    if not q.awaitTermination(300):
        # a timed-out ingest would silently yield a partially-built
        # index (an unexplained hash mismatch downstream) — fail loudly
        q.stop()
        raise RuntimeError("ingest stream did not drain within 300s")

    idx_cents = _rks(spark, os.path.join(index_path, "centroids"))
    postings = _rks(spark, os.path.join(index_path, "postings"))
    return _search_index(postings, idx_cents, _query_vectors(e))


def _sivf_oracle() -> str:
    from automated_dow30_earnings_reports_spark.operators.similarity import (
        _ivf_oracle,
    )

    return _ivf_oracle()


QUERIES["streaming_ivf_ingest"] = streaming_ivf_ingest
ORACLES["streaming_ivf_ingest"] = _sivf_oracle()


LEDGER_COMPACT_MID = 400  # wave 1 ingests [IVF_APPEND_SPLIT, MID); wave 2 the rest


def streaming_ledger_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """compact_committed_ledger in its OPERATING position — mid-stream,
    between two ingest waves — so the crash-atomicity and
    key-preservation claims get a driver oracle (r8 verdict task: the
    verb was pytest-pinned only). Lifecycle: (1) build the base IVF
    index; (2) land wave 1 arrivals and drain the checkpointed ingest
    stream; (3) QUIESCED, compact the replay ledger (O(batches) delta
    files -> one); (4) land wave 2 — the remaining vectors PLUS
    duplicate re-arrivals of wave-1 ids — and drain again; (5) search
    the final index. The oracle is the from-scratch IVF over the full
    corpus: if compaction dropped a committed key, its duplicate
    re-arrival re-ingests and the duplicated posting occupies two
    ranks (hash break); if compaction invented or corrupted keys, a
    genuine wave-2 vector is skipped and its absence breaks the hash.
    Final state is therefore bit-identical with and without the
    mid-stream compaction — streaming_ivf_ingest (no compaction) holds
    the same oracle.

    Scale shape: the ledger grows one small file per committed batch
    (the commit must be a single atomic append), so a long-running
    ingest pays an O(batches) listing per replay anti-join; the
    compaction folds it to one file on the quiesced maintenance
    schedule — same cadence as index compaction. Cost is one distinct
    over key ids, never a posting read."""
    import shutil

    from automated_dow30_earnings_reports_spark.operators.similarity import (
        IVF_APPEND_SPLIT,
        IVF_CELLS,
        _assign_cells,
        _emb,
        _query_vectors,
        _search_index,
    )
    from automated_dow30_earnings_reports_spark.sources.kv_datasource import register
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        scratch_path,
        write_partitioned,
    )

    register(spark)
    base = scratch_path(os.path.join(_SCRATCH_SIVF, "ledger_compact"), sf_dir)
    shutil.rmtree(base, ignore_errors=True)  # fresh lifecycle per invocation
    landing = os.path.join(base, "landing")
    ckpt = os.path.join(base, "ckpt")
    index_path = os.path.join(base, "index")

    e = _emb(spark, sf_dir)
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

    def drain(wave: DataFrame) -> None:
        wave.select("vec_id").write.format("kvlinks").option(
            "path", landing
        ).mode("append").save()
        q = start_ivf_ingest_stream(spark, landing, index_path, ckpt, e)
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("ingest stream did not drain within 300s")

    drain(
        e.where(
            (F.col("vec_id") >= IVF_APPEND_SPLIT)
            & (F.col("vec_id") < LEDGER_COMPACT_MID)
        )
    )

    # --- quiesced mid-stream maintenance: fold the ledger to one file ---
    ledger = os.path.join(index_path, "committed")
    n_before = sum(
        1 for _dp, _d, fs in os.walk(ledger) for f in fs if f.endswith(".parquet")
    )
    reclaimed = compact_committed_ledger(spark, index_path)
    if n_before > 1 and reclaimed != n_before - 1:
        raise RuntimeError(
            f"compaction reclaimed {reclaimed} of {n_before} ledger files"
        )

    # wave 2: the remaining vectors + duplicate re-arrivals of wave-1
    # ids — the compacted ledger must still drop the duplicates
    drain(
        e.where(F.col("vec_id") >= LEDGER_COMPACT_MID).unionByName(
            e.where(
                (F.col("vec_id") >= IVF_APPEND_SPLIT)
                & (F.col("vec_id") < IVF_APPEND_SPLIT + 20)
            )
        )
    )

    idx_cents = _rks(spark, os.path.join(index_path, "centroids"))
    postings = _rks(spark, os.path.join(index_path, "postings"))
    return _search_index(postings, idx_cents, _query_vectors(e))


QUERIES["streaming_ledger_compact"] = streaming_ledger_compact
ORACLES["streaming_ledger_compact"] = _sivf_oracle()


# ---------------------------------------------------------------------------
# The dedup twin: streaming ingest into the persisted SIGNATURE index
# (operators/dedup.py dedup_incremental_index). Arrival records carry
# doc_ids; each micro-batch shingles/signs ONLY its documents (cost
# proportional to the batch), anti-joins the COMMITTED LEDGER (written
# last, after the staged bands/shd/sizes delta publishes atomically)
# for replay safety, and appends bands + shingle digests + sizes.
# ---------------------------------------------------------------------------


def _ensure_committed_ledger(
    spark: SparkSession, index_path: str, base_table: str, key: str = "doc_id"
) -> str:
    """Create the replay ledger (``<index>/committed``, one ``key``
    column) if this index predates it, seeding it from the BASE-BUILD
    files of ``base_table`` only: batch-published files carry the
    ``ingest-<batch>-`` prefix and are excluded, so keys from a
    half-published crashed batch are NOT marked committed (they replay,
    and the publisher's scrub removes their partial files).

    The seed is written to a temp directory and renamed into place, so
    ``committed`` existing IMPLIES the seed completed — a crash mid-seed
    leaves only the temp dir (rebuilt on restart) and can never be
    mistaken for a complete ledger (a partial seed trusted as complete
    would re-admit already-indexed base keys as fresh: duplicates).

    Runs once per index at stream start — a driver-side directory walk
    (O(index files); on an object store this one-time bootstrap is a
    full recursive listing, the price of adopting a pre-ledger index —
    measured against a fragmented 10x index in PERF.md) + one small
    distinct."""
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        BATCH_FILE_PREFIX,
    )

    import shutil

    ledger = os.path.join(index_path, "committed")
    if os.path.isdir(ledger):
        return ledger
    # a ledger compaction (compact_committed_ledger) that crashed
    # between its two renames left the complete pre-compaction ledger
    # parked at .committed-old — restore it rather than re-seeding from
    # base files (a re-seed would forget every streamed batch's keys,
    # and a later duplicate arrival would re-ingest them)
    old = os.path.join(index_path, ".committed-old")
    if os.path.isdir(old):
        os.rename(old, ledger)
        return ledger
    tmp = os.path.join(index_path, ".committed-seed-tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    tdir = os.path.join(index_path, base_table)
    base_files = [
        os.path.join(dp, f)
        for dp, _dirs, fs in os.walk(tdir)
        for f in fs
        if f.endswith(".parquet") and not f.startswith(BATCH_FILE_PREFIX)
    ]
    if base_files:
        (
            spark.read.parquet(*base_files)
            .select(key)
            .distinct()
            .write.mode("overwrite")
            .parquet(tmp)
        )
    else:
        spark.createDataFrame([], f"{key} bigint").write.mode("overwrite").parquet(
            tmp
        )
    os.rename(tmp, ledger)
    return ledger


def compact_committed_ledger(spark: SparkSession, index_path: str) -> int:
    """Fold the replay ledger back to one file. Every committed batch
    appends a one-file delta (the commit must be a single atomic
    append), so a long-running ingest leaves the ledger as O(batches)
    small files and the per-batch anti-join read pays an O(batches)
    listing. This maintenance verb (run on the same quiesced schedule
    as index compaction — NOT concurrently with a live stream, whose
    in-flight batch could commit between the read and the swap)
    rewrites the distinct keys to a single file via the same
    temp-dir + atomic-rename protocol as the bootstrap seed, so a
    crash leaves either the old fragmented ledger or the compacted
    one, never a partial. Returns the number of files reclaimed.
    Key-set equality and crash-atomicity pinned in
    tests/test_round8_ops.py."""
    import shutil

    ledger = os.path.join(index_path, "committed")
    before = sum(
        1
        for dp, _dirs, files in os.walk(ledger)
        for f in files
        if f.endswith(".parquet")
    )
    if before <= 1:
        return 0
    tmp = os.path.join(index_path, ".committed-compact-tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    (
        spark.read.parquet(ledger)
        .distinct()
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    old = os.path.join(index_path, ".committed-old")
    shutil.rmtree(old, ignore_errors=True)
    os.rename(ledger, old)
    os.rename(tmp, ledger)
    shutil.rmtree(old, ignore_errors=True)
    return before - 1


def _ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    key: str,
    source: DataFrame,
    index_path: str,
    tables: tuple[str, ...],
    ledger: str,
    stage: "Callable[[DataFrame, str], None]",
) -> None:
    """THE shared exactly-once micro-batch ingest — one implementation,
    three callers (the ivf / dedup-signature / text index streams), the
    same single-body argument as parquet_lake.rewrite_affected_partitions
    for deletes: the commit protocol cannot drift between index
    families. Steps: (1) the batch's keys are anti-joined against the
    committed ledger, so a replayed or duplicate arrival is a no-op;
    (2) the per-family ``stage`` callback builds ONLY the fresh rows'
    index delta under a batch-keyed staging dir with overwrite
    semantics (a crashed attempt's partial stage is reset); (3) the
    delta publishes atomically-per-batch
    (parquet_lake.publish_staged_batch — scrub-then-rename under
    batch-deterministic file names, scrub bounded by the staged
    delta's partitions); (4) the ledger records the batch LAST, as one
    file, so the replay anti-join can never see a half-committed batch
    as ingested. Per-batch cost is O(batch) staging + the publish's
    batch-footprint-bounded moves — independent of index size."""
    import shutil

    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        publish_staged_batch,
    )

    sess = batch_df.sparkSession
    committed = _rks(sess, ledger).select(key)
    # ONE source pass per batch (r10): the old shape derived the fresh
    # KEY SET (one corpus-scan join), then re-joined the source against
    # it inside the stage callback — a second corpus scan per
    # micro-batch at scale. Checkpointing the fresh ROWS (batch-sized:
    # exactly the arriving documents/vectors) hands the stage callback
    # its input without touching the source again, and the ledger
    # append projects the keys from the same checkpoint.
    fresh_rows = (
        source.join(batch_df.select(key).distinct(), key)
        .join(committed, key, "left_anti")
        .localCheckpoint(eager=True)
    )
    # one emptiness gate, not two (r10): the old shape ran a separate
    # batch_df.isEmpty() job first. For the availableNow drains these
    # queries run, every micro-batch carries data, so the pre-check was
    # one whole job per productive batch. An EMPTY batch (continuous
    # steady-state streams) now pays the checkpoint job above instead of
    # a take(1) — AQE plans the batch side's exchange first and folds
    # the inner join with an empty broadcast build into an empty
    # relation, so the source scan itself is skipped; a deployment
    # where empty batches dominate should reinstate a cheap
    # batch_df.isEmpty() early return before building fresh_rows.
    if fresh_rows.isEmpty():
        return  # empty or fully-replayed batch: nothing to ingest
    staging = os.path.join(index_path, ".staging", f"batch-{batch_id}")
    shutil.rmtree(staging, ignore_errors=True)
    stage(fresh_rows, staging)
    publish_staged_batch(staging, index_path, tables, batch_id)
    # ledger commit LAST, as one file (atomic publish via job commit)
    fresh_rows.select(key).coalesce(1).write.mode("append").parquet(ledger)


def start_dedup_ingest_stream(
    spark: SparkSession,
    landing_dir: str,
    index_path: str,
    checkpoint_dir: str,
    docs: DataFrame,
    available_now: bool = True,
):
    """Tail ``landing_dir`` (kvlinks arrival records, ``doc_id bigint``)
    and append each micro-batch into the persisted dedup-signature
    index at ``index_path``. Per-batch cost is O(batch) shingling +
    an append write. Replay safety is the shared exactly-once
    ``_ingest_batch`` protocol (ledger anti-join → staged bands/shd/
    sizes delta → atomic per-batch publish → ledger LAST — keying on
    any one data table could invert on a mid-append crash: three naked
    appends are not atomic)."""
    from automated_dow30_earnings_reports_spark.operators.dedup import (
        _build_signature_index,
        _shingle_hashes_of,
    )
    from automated_dow30_earnings_reports_spark.sources.kv_datasource import register

    register(spark)
    ledger = _ensure_committed_ledger(spark, index_path, "bands")
    arrivals = _arrival_stream(spark, landing_dir, "doc_id")

    def stage_dedup(fresh_docs: DataFrame, staging: str) -> None:
        shd = _shingle_hashes_of(fresh_docs).localCheckpoint(eager=True)
        _build_signature_index(shd, staging)  # overwrite semantics

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        _ingest_batch(
            batch_df,
            batch_id,
            key="doc_id",
            source=docs,
            index_path=index_path,
            tables=("bands", "shd", "sizes"),
            ledger=ledger,
            stage=stage_dedup,
        )

    writer = arrivals.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming half of the dedup-signature index lifecycle, oracled:
    (1) BUILD the index on the already-ingested corpus (doc_id % 5 !=
    4, the dedup_incremental_batch split); (2) publish the batch's
    doc_ids as kvlinks arrival files; (3) run the checkpointed ingest
    stream to exhaustion; (4) probe new-vs-old from the persisted
    index with exact-jaccard verification (the build/append/probe
    helpers are shared verbatim with the batch
    dedup_incremental_index, so the two paths cannot drift). Equals
    the batch result — the oracle is the full-corpus banded join."""
    import shutil

    from automated_dow30_earnings_reports_spark.operators.dedup import (
        _build_signature_index,
        _probe_signature_index,
        _shingle_hashes_of,
    )
    from automated_dow30_earnings_reports_spark.sources.kv_datasource import register
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        scratch_path,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table, spread

    register(spark)
    base = scratch_path(os.path.join(_SCRATCH_SIVF, "dedup"), sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    landing = os.path.join(base, "landing")
    ckpt = os.path.join(base, "ckpt")
    index_path = os.path.join(base, "index")

    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    is_new = F.col("doc_id") % 5 == 4

    shd_old = _shingle_hashes_of(docs.where(~is_new)).localCheckpoint(eager=True)
    _build_signature_index(shd_old, index_path)

    docs.where(is_new).select("doc_id").write.format("kvlinks").option(
        "path", landing
    ).mode("append").save()
    q = start_dedup_ingest_stream(spark, landing, index_path, ckpt, docs)
    if not q.awaitTermination(300):
        # a timed-out ingest would silently yield a partially-built
        # index (an unexplained hash mismatch downstream) — fail loudly
        q.stop()
        raise RuntimeError("ingest stream did not drain within 300s")

    return _probe_signature_index(spark, index_path, is_new)


def _sdedup_oracle() -> str:
    from automated_dow30_earnings_reports_spark.operators.dedup import (
        _incremental_oracle,
    )

    return _incremental_oracle()


QUERIES["streaming_dedup_ingest"] = streaming_dedup_ingest
ORACLES["streaming_dedup_ingest"] = _sdedup_oracle()


# ---------------------------------------------------------------------------
# Streaming -> persisted TEXT index: the third index family gets the
# same continuously-ingesting composition as the vector store
# (streaming_ivf_ingest) and the dedup signatures
# (streaming_dedup_ingest): kvlinks arrival records name the landed
# doc_ids, each micro-batch tokenizes ONLY those documents and appends
# postings/docstats + a mergeable stats partial via the shared
# _write_text_index, and the standing BM25 query runs from the merged
# index — hash-matched against the scan-side oracle.
# ---------------------------------------------------------------------------

_SCRATCH_STXT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
    "streaming_text",
)


def start_text_ingest_stream(
    spark: SparkSession,
    landing_dir: str,
    index_path: str,
    checkpoint_dir: str,
    docs: DataFrame,
    available_now: bool = True,
):
    """Tail ``landing_dir`` (kvlinks arrivals, schema ``doc_id bigint``)
    and append each micro-batch into the persisted text index. Per-batch
    cost is O(batch tokens) — tokenization touches only the batch, the
    stats merge is an appended integer-partial row. Replay safety is
    the shared exactly-once ``_ingest_batch`` protocol (ledger
    anti-join → staged postings/docstats/stats delta → atomic
    per-batch publish → ledger LAST — an anti-join keyed on any one
    DATA table would invert on a mid-append crash: docstats committing
    first made the replay skip the batch and drop its postings/stats
    forever)."""
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        _write_text_index,
    )
    from automated_dow30_earnings_reports_spark.sources.kv_datasource import register

    register(spark)
    ledger = _ensure_committed_ledger(spark, index_path, "docstats")
    arrivals = _arrival_stream(spark, landing_dir, "doc_id")

    def stage_text(fresh_docs: DataFrame, staging: str) -> None:
        _write_text_index(fresh_docs, staging, "overwrite")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        _ingest_batch(
            batch_df,
            batch_id,
            key="doc_id",
            source=docs,
            index_path=index_path,
            tables=("docstats", "stats", "postings"),
            ledger=ledger,
            stage=stage_text,
        )

    writer = arrivals.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_text_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the text index on the initial corpus slice, publish the
    held-out doc_ids as kvlinks arrivals, drain the checkpointed ingest
    stream, and answer the standing BM25 query from the merged
    persisted index. Converges to the batch-built index, so the oracle
    is the full-corpus scan-side BM25 (rows-equivalence through a
    streaming engine — the window_*/streaming_ivf pattern)."""
    import shutil

    from automated_dow30_earnings_reports_spark.operators.textstats import (
        TEXT_APPEND_MOD,
        _search_text_index,
        _write_text_index,
    )
    from automated_dow30_earnings_reports_spark.sources.kv_datasource import register
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        scratch_path,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table, spread

    register(spark)  # the arrival WRITE below needs the source too
    base = scratch_path(_SCRATCH_STXT, sf_dir)
    shutil.rmtree(base, ignore_errors=True)  # fresh lifecycle per invocation
    landing = os.path.join(base, "landing")
    ckpt = os.path.join(base, "ckpt")
    index_path = os.path.join(base, "index")

    d = spread(load_table(spark, sf_dir, "documents"))
    _write_text_index(
        d.where(F.col("doc_id") % TEXT_APPEND_MOD != 0), index_path, "overwrite"
    )
    d.where(F.col("doc_id") % TEXT_APPEND_MOD == 0).select("doc_id").write.format(
        "kvlinks"
    ).option("path", landing).mode("append").save()

    q = start_text_ingest_stream(spark, landing, index_path, ckpt, d)
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError("ingest stream did not drain within 300s")

    return _search_text_index(spark, index_path)


def _stxt_oracle() -> str:
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        _bm25_oracle,
    )

    return _bm25_oracle()


QUERIES["streaming_text_ingest"] = streaming_text_ingest
ORACLES["streaming_text_ingest"] = _stxt_oracle()
