"""Event-time windowing (SURVEY.md §2.9 — streaming surface).

The reference is pure batch (weekly cron, README.md:171-177); the
engine adds the Structured Streaming operators a crawl/events pipeline
needs. Each transformation here is written against a plain DataFrame so
the SAME function body runs in batch mode (for the DuckDB oracle gate)
and on a ``readStream`` DataFrame (exercised with availableNow triggers
in tests/test_streaming.py). Watermarking is applied only when the
input is actually streaming — ``withWatermark`` is a no-op-but-allowed
on batch frames, so we always attach it for plan parity.

Scale notes: event-time windows shuffle on (window, key) with map-side
partial aggregation; session windows additionally require a sort within
the key partition. State-store size at 100 TB is bounded by the
watermark horizon — 10 minutes here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.tables import load_table

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling event-time window: count + value sum per (window, type)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Sliding window (each event lands in width/slide windows)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "event_type",
            "n",
        )
    )


def session_stats(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Session windows per user (gap-based). Emits one row per session."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            "user_id",
            F.date_format("w.start", _TS_FMT).alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@_register(
    "window_tumbling",
    f"""
    SELECT strftime(date_trunc('hour', ts), '{_TS_FMT_DUCK}') AS window_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return tumbling_counts(ev).orderBy("window_start", "event_type")


@_register(
    "window_sliding",
    f"""
    WITH expanded AS (
      -- make_timestamp keeps the arithmetic in NAIVE timestamps:
      -- to_timestamp returns TIMESTAMPTZ, whose strftime renders in the
      -- HOST timezone while Spark renders UTC — the oracle would shift
      -- by the UTC offset on any non-UTC machine (the tumbling oracle's
      -- date_trunc-on-naive convention, kept here)
      SELECT make_timestamp((CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800
                             - k * 1800) * 1000000) AS window_start,
             event_type
      FROM events, unnest([0, 1]) AS t(k)
    )
    SELECT strftime(window_start, '{_TS_FMT_DUCK}') AS window_start, event_type, COUNT(*) AS n
    FROM expanded
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return sliding_counts(ev).orderBy("window_start", "event_type")


@_register(
    "window_session",
    f"""
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 300
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id,
           strftime(MIN(ts), '{_TS_FMT_DUCK}') AS session_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS session_value
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return session_stats(ev).orderBy("user_id", "session_start")


def interval_join_attribution(
    views: DataFrame, clicks: DataFrame, horizon_sec: int = 900
) -> DataFrame:
    """Stream-stream interval join: each click attributed to every view
    by the same user in the preceding ``horizon_sec`` seconds. The
    time-range condition bounds BOTH event-time columns, which is what
    lets Structured Streaming expire join state at the watermark —
    state per key never exceeds the horizon. The same body runs in
    batch (the oracle path) and on two readStream inputs
    (tests/test_streaming.py)."""
    v = views.withWatermark("ts", "30 minutes").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    c = clicks.withWatermark("ts", "30 minutes").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    return v.join(
        c,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {horizon_sec} SECONDS")),
        "inner",
    )


@_register(
    "click_attribution_15m",
    """
    WITH s AS (
      SELECT user_id, event_id, event_type, date_trunc('second', ts) AS ts
      FROM events
    )
    SELECT v.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_attributed
    FROM s v
    JOIN s c ON c.user_id = v.user_id
            AND v.event_type = 'view' AND c.event_type = 'click'
            AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 900 SECOND
    GROUP BY 1 ORDER BY 1
    """,
)
def click_attribution_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the interval join: per-user count of (view, click)
    pairs within 15 minutes. Timestamps are truncated to whole seconds
    on both engines so boundary pairs can't flip on sub-second
    precision differences (events.parquet is nanos; Spark loads micros).
    The join shuffles once on user_id; the range predicate is a
    post-probe residual, exactly like range_join_ship_window."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.date_trunc("second", F.col("ts"))
    )
    views = e.where(F.col("event_type") == "view")
    clicks = e.where(F.col("event_type") == "click")
    return (
        interval_join_attribution(views, clicks)
        .groupBy(F.col("v_user").alias("user_id"))
        .agg(F.count("*").cast("bigint").alias("n_attributed"))
        .orderBy("user_id")
    )
