"""Streaming surface beyond window aggs (SURVEY §2.9): the crawl as an
incremental pipeline.

The reference's BFS frontier loop (enhanced_selenium_scraper.py:717-754)
is batch, but its shape — "new URLs arrive, fetch them, keep only
unseen links" — is exactly an incremental stream:

  - ``dedup_links_stream``: the visited-set (:129, :722) as Spark's
    built-in streaming dedup state (watermark bounds state size —
    the knob the reference's unbounded Python set lacks);
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
like batch dropDuplicates; the watermark is what keeps 100 TB of
history out of the state store. foreachBatch sinks must tolerate batch
replay — the anti-join against the already-committed sink makes the
append idempotent.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from automated_dow30_earnings_reports_spark.pipeline.crawl import extract_links
from automated_dow30_earnings_reports_spark.pipeline.fetch import FetcherFactory, fetch_stage


def dedup_links_stream(links: DataFrame, ts_col: str = "ts", watermark: str = "1 hour") -> DataFrame:
    """Streaming visited-set: first sighting of each href survives;
    state older than the watermark is dropped."""
    return links.withWatermark(ts_col, watermark).dropDuplicates(["href"])


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
