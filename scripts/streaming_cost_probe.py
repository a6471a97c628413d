"""Split the streaming-ingest queries' cost into FIXED (stream start,
micro-batch planning, checkpoint commits) vs MARGINAL (one more batch's
actual ingest work) — the measurement behind the claim that the 3-7 s
registered streaming_*_ingest timings are bootstrap-dominated and
amortize on a continuous ingest.

Method, per index family (text / dedup-signature), at $SPARK_GRAFT_SF_DIR
(default sf0.1):

  1. build the base index (untimed), land arrival batch A, drain the
     checkpointed stream          -> t_first  (stream bootstrap + 1 batch)
  2. land arrival batch B (same size), drain against the SAME
     checkpoint                   -> t_more   (stream restart + 1 batch)
  3. drain once more with NOTHING new landed
                                  -> t_empty  (pure restart fixed cost)

marginal per batch = t_more - t_empty; fixed = t_empty. The claim holds
when fixed dominates t_more and the marginal is small and ~flat in
index size (per-batch work is an anti-join + O(batch) append).

Usage: python scripts/streaming_cost_probe.py
Prints a markdown table (recorded in PERF.md).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "streaming_cost_probe",
)


def _drain(start_fn, spark, landing, index_path, ckpt, docs) -> float:
    t0 = time.time()
    q = start_fn(spark, landing, index_path, ckpt, docs)
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError("stream did not drain in 300s")
    return time.time() - t0


def _probe_text(spark) -> tuple[float, float, float]:
    from pyspark.sql import functions as F

    from automated_dow30_earnings_reports_spark.operators.textstats import (
        _write_text_index,
    )
    from automated_dow30_earnings_reports_spark.streaming.incremental import (
        start_text_ingest_stream,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table, spread

    base = os.path.join(SCRATCH, "text")
    shutil.rmtree(base, ignore_errors=True)
    landing = os.path.join(base, "landing")
    ckpt = os.path.join(base, "ckpt")
    index_path = os.path.join(base, "index")

    d = spread(load_table(spark, SF_DIR, "documents")).localCheckpoint(eager=True)
    m = F.col("doc_id") % 10
    _write_text_index(d.where(m < 8), index_path, "overwrite")

    def land(pred):
        d.where(pred).select("doc_id").write.format("kvlinks").option(
            "path", landing
        ).mode("append").save()

    land(m == 8)
    t_first = _drain(start_text_ingest_stream, spark, landing, index_path, ckpt, d)
    land(m == 9)
    t_more = _drain(start_text_ingest_stream, spark, landing, index_path, ckpt, d)
    t_empty = _drain(start_text_ingest_stream, spark, landing, index_path, ckpt, d)
    return t_first, t_more, t_empty


def _probe_dedup(spark) -> tuple[float, float, float]:
    from pyspark.sql import functions as F

    from automated_dow30_earnings_reports_spark.operators.dedup import (
        _build_signature_index,
        _shingle_hashes_of,
    )
    from automated_dow30_earnings_reports_spark.streaming.incremental import (
        start_dedup_ingest_stream,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table, spread

    base = os.path.join(SCRATCH, "dedup")
    shutil.rmtree(base, ignore_errors=True)
    landing = os.path.join(base, "landing")
    ckpt = os.path.join(base, "ckpt")
    index_path = os.path.join(base, "index")

    docs = (
        spread(load_table(spark, SF_DIR, "documents"))
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    m = F.col("doc_id") % 10
    shd_old = _shingle_hashes_of(docs.where(m < 8)).localCheckpoint(eager=True)
    _build_signature_index(shd_old, index_path)

    def land(pred):
        docs.where(pred).select("doc_id").write.format("kvlinks").option(
            "path", landing
        ).mode("append").save()

    land(m == 8)
    t_first = _drain(
        start_dedup_ingest_stream, spark, landing, index_path, ckpt, docs
    )
    land(m == 9)
    t_more = _drain(start_dedup_ingest_stream, spark, landing, index_path, ckpt, docs)
    t_empty = _drain(
        start_dedup_ingest_stream, spark, landing, index_path, ckpt, docs
    )
    return t_first, t_more, t_empty


def main() -> int:
    from automated_dow30_earnings_reports_spark.session import get_spark
    from automated_dow30_earnings_reports_spark.sources.kv_datasource import register

    spark = get_spark("streaming-cost-probe")
    register(spark)
    print(f"sf_dir: {SF_DIR}")
    print(
        "| stream | t_first (bootstrap+batch) | t_more (restart+batch) "
        "| t_empty (restart, no data) | marginal/batch |"
    )
    print("|---|---|---|---|---|")
    for name, probe in (("text_ingest", _probe_text), ("dedup_ingest", _probe_dedup)):
        t_first, t_more, t_empty = probe(spark)
        print(
            f"| {name} | {t_first:.2f} | {t_more:.2f} | {t_empty:.2f} "
            f"| {t_more - t_empty:.2f} |"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
