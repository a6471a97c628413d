"""Loaders for the driver-generated star schema + LLM-pipeline tables.

All tables live as single parquet files under an sf directory
(TESTDATA.md). At 100 TB these would be partitioned datasets; the
loaders take any path Spark can list, so nothing here changes — the
scan parallelism comes from parquet row groups / file splits.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)
AUX_TABLES = ("events", "documents", "embeddings")
ALL_TABLES = STAR_TABLES + AUX_TABLES

# Dimension tables small enough to broadcast at any realistic SF
# (region=5 rows, nation=25 rows — fixed-cardinality dims).
BROADCAST_DIMS = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Process-lifetime SCHEMA cache (r11, guide §6 file-listing/plan-time
# costs): every spark.read.parquet without an explicit schema re-infers
# the schema from parquet footers — measured ~120-180 ms per load_table
# call, paid by EVERY query invocation (the bench's 109-query fast tail
# spends more on this than on some queries' actual compute; at scale
# it is a per-query driver-side footer read of the table root). The
# cache holds METADATA ONLY (a StructType — the catalog pattern every
# production table format uses); all data is still computed from the
# parquet inputs on every invocation. Keyed by resolved absolute path;
# the test datasets are immutable for a process's lifetime, and a
# StructType is session-independent (plain Python), so no session key
# is needed.
_SCHEMA_CACHE: dict[str, "object"] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in ALL_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {ALL_TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    ap = os.path.abspath(path)
    sch = _SCHEMA_CACHE.get(ap)
    if sch is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[ap] = df.schema
        return df
    return spark.read.schema(sch).parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Load events robustly across testdata generations.

    events.ts has shipped as either a native microsecond timestamp (current
    testdata) or parquet TIMESTAMP(NANOS), which Spark can only read as a
    long nanos count under ``spark.sql.legacy.parquet.nanosAsLong``. Branch
    on the *loaded schema* rather than assuming one encoding: convert
    nanos→micros only when ts actually arrived as a long. Event-time
    queries aggregate at >= second granularity, so the nanos truncation
    (when it applies) is invisible to the DuckDB oracles.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType
    from pyspark.sql.utils import AnalysisException

    nanos_key = "spark.sql.legacy.parquet.nanosAsLong"
    ck = "events::" + os.path.abspath(path)
    cached = _SCHEMA_CACHE.get(ck)
    if cached is not None:
        # repeat read: the RAW schema (and which read mode produced it)
        # is process-cached — skip footer inference and, on the nanos
        # branch, the deliberately-failing first attempt
        kind, sch = cached
        if kind == "plain":
            df = spark.read.schema(sch).parquet(path)
        else:
            prev = spark.conf.get(nanos_key, None)
            spark.conf.set(nanos_key, "true")
            try:
                df = spark.read.schema(sch).parquet(path)
                _ = df.schema
            finally:
                if prev is None:
                    spark.conf.unset(nanos_key)
                else:
                    spark.conf.set(nanos_key, prev)
    else:
        kind = "plain"
        try:
            df = spark.read.parquet(path)
            # Force schema resolution now so a TIMESTAMP(NANOS) file fails
            # here (inside the try) instead of later at first action.
            _ = df.schema
        except AnalysisException:
            # Likely PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS): retry with the
            # legacy nanos-as-long read, then restore the session conf.
            kind = "nanos"
            prev = spark.conf.get(nanos_key, None)
            spark.conf.set(nanos_key, "true")
            try:
                df = spark.read.parquet(path)
                _ = df.schema
            finally:
                if prev is None:
                    spark.conf.unset(nanos_key)
                else:
                    spark.conf.set(nanos_key, prev)
        _SCHEMA_CACHE[ck] = (kind, df.schema)
    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """``readStream`` twin of the events loader.

    Streaming file sources need an explicit schema; derive it from a batch
    read of the same path (schema-aware, see ``_load_events``) so the
    stream sees the identical post-normalization shape: ts is a timestamp
    regardless of whether the parquet encodes it natively or as
    TIMESTAMP(NANOS)/long.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampType

    raw_schema = _raw_schema_or_none(spark, path)
    if raw_schema is not None and not isinstance(raw_schema["ts"].dataType, LongType):
        stream = spark.readStream.schema(raw_schema).parquet(path)
    else:
        # nanos-as-long on disk: stream the long and normalize in-plan
        stream_schema = (
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string"
        )
        raw = spark.readStream.schema(stream_schema).parquet(path)
        stream = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Watermarks/event-time ops require TIMESTAMP (not TIMESTAMP_NTZ):
    # cast preserves the wall-clock reading under the session timezone, so
    # window boundaries match the batch/oracle path.
    if not isinstance(stream.schema["ts"].dataType, TimestampType):
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _raw_schema_or_none(spark: SparkSession, path: str):
    """One schema probe, reused as the value: probing twice (a clean
    check, then a re-read for the schema) ran two driver-side
    schema-inference jobs per stream start — and on the nanos path the
    first deliberately failed a task just to be thrown away."""
    from pyspark.sql.utils import AnalysisException

    try:
        return spark.read.parquet(path).schema
    except AnalysisException:
        return None


def _conf_bytes(spark: SparkSession, key: str, default: int) -> int:
    """Byte-valued session conf, honoring Spark's size suffixes
    ('64m', '1g', '512k', '128mb', ...). Parsing only the digit run
    read '64m' as 64 BYTES, which made maxSplitBytes tiny, the split
    estimate enormous, and spread() a silent no-op — one core doing
    every compute-bound map stage whenever the user passed a suffixed
    conf value."""
    import re

    raw = str(spark.conf.get(key, str(default))).strip().lower()
    m = re.fullmatch(r"(\d+)\s*([kmgtp]?)b?", raw)
    if not m:
        return default
    scale = {"": 0, "k": 10, "m": 20, "g": 30, "t": 40, "p": 50}[m.group(2)]
    return int(m.group(1)) << scale


def spread(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Raise a scan's partition count for COMPUTE-BOUND downstream stages.

    Local testdata is one tiny parquet file per table, so the scan yields
    1 split and every map-side-heavy operator downstream (shingle
    explode, all-pairs scoring, per-row hashing) runs on one core of 32.
    At 100 TB the scan already yields >= cores splits, so this must NOT
    add a shuffle there: it is an explicit no-op whenever the scan's
    estimated split count already reaches ``parts``. Only apply it where
    downstream CPU per input byte is high — for plain scans/filters/
    aggregations the extra exchange costs more than it buys.

    The split estimate comes from driver-side file metadata
    (``df.inputFiles`` + local file sizes against maxPartitionBytes /
    openCostInBytes — the same quantities Spark's own split planner
    packs on), NOT ``df.rdd`` — converting the plan to an RDD just to
    count partitions forces a full physical planning pass per call.
    Non-local storage schemes (s3/hdfs/...) mean a production-scale
    deployment whose scans are already parallel: no-op there.
    """
    import os
    from urllib.parse import unquote, urlparse

    spark = df.sparkSession
    if parts is None:
        parts = spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if not files:
        # Derived plan (post-shuffle): partition count is already governed
        # by spark.sql.shuffle.partitions / AQE, not split planning.
        return df
    total = 0
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("", "file"):
            return df
        try:
            # inputFiles() returns Hadoop URIs, percent-encoded — a path
            # with a space arrives as %20 and must be unquoted before
            # the stat call, or every spread() on it would no-op.
            total += os.path.getsize(unquote(u.path) or f)
        except OSError:
            return df
    max_part = _conf_bytes(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _conf_bytes(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    # Mirror FilePartition's actual split sizing, not just
    # maxPartitionBytes: maxSplitBytes = min(maxPartitionBytes,
    # max(openCostInBytes, paddedBytes / minPartitionNum)). Without the
    # bytesPerCore clamp the estimate undercounts splits for mid-sized
    # scans and inserts a redundant exchange the planner would not need.
    padded = total + open_cost * len(files)
    try:
        # conf.get validates any supplied default against the entry's
        # type/bounds, so probe with no default and fall back on error
        # (unset optional entry raises / returns None).
        min_parts = int(spark.conf.get("spark.sql.files.minPartitionNum"))
    except Exception:  # noqa: BLE001 — unset conf, any Spark minor's error shape
        min_parts = spark.sparkContext.defaultParallelism
    bytes_per_core = padded // max(1, min_parts)
    max_split = min(max_part, max(open_cost, bytes_per_core))
    est_splits = max(1, padded // max(1, max_split))
    return df.repartition(parts) if est_splits < parts else df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in ALL_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql(...) works."""
    for name in ALL_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
