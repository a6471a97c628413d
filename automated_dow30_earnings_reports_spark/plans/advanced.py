"""Relational breadth beyond the reference's literal surface: the
standard analytics shapes a 100 TB warehouse query mix hits daily —
rollup hierarchies, exact percentiles, range-predicate joins, ordered
window analytics (lag/delta/running sums), conditional pivots. All
pure JVM plans with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


@_register(
    "rollup_flag_status",
    """
    SELECT l_returnflag,
           l_linestatus,
           CAST(COUNT(*) AS BIGINT)   AS n,
           ROUND(SUM(l_quantity), 2)  AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals in one pass (flag, flag+status, grand total)
    — Spark expands the grouping sets before the shuffle, so it stays
    a single exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


@_register(
    "value_percentiles",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6)  AS p50,
           ROUND(quantile_cont(value, 0.9), 6)  AS p90,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group. At 100 TB the same
    query swaps percentile() for approx_percentile() — the sketch
    variant's tolerance is pinned in tests/test_scale_features.py."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


@_register(
    "range_join_ship_window",
    """
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_shipped_in_window
    FROM lineitem l
    JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <  o.o_orderdate + INTERVAL 60 DAY
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def range_join_ship_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join + range predicate (ship within 60 days of order):
    Catalyst keeps the equi-key as the shuffle key and evaluates the
    range residual post-probe — the scalable shape for bounded-window
    temporal joins (the as-of-join family's building block)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    joined = li.join(
        o,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.date_add(F.col("o_orderdate"), 60)),
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("n_shipped_in_window"))
        .orderBy("o_orderpriority")
    )


@_register(
    "user_event_deltas",
    """
    WITH s AS (
      -- floor to whole seconds: Spark's unix_timestamp truncates,
      -- DuckDB's epoch() keeps the fractional part
      SELECT user_id, event_id, value, ts,
             CAST(floor(epoch(ts)) AS BIGINT) AS es
      FROM events
    ),
    w AS (
      SELECT user_id, event_id, value,
             es - lag(es) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s,
             SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS running_value
      FROM s
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT)            AS n_events,
           ROUND(AVG(gap_s), 4)                AS avg_gap_s,
           ROUND(MAX(running_value), 2)        AS total_value
    FROM w GROUP BY user_id
    HAVING COUNT(*) >= 3
    ORDER BY user_id
    """,
)
def user_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered analytics per user: lag-based inter-event gaps and a
    running sum — one shuffle on user_id serves both window frames and
    the final aggregate."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    enriched = e.select(
        "user_id",
        "event_id",
        "value",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s"),
        F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("running_value"),
    )
    return (
        enriched.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.avg("gap_s"), 4).alias("avg_gap_s"),
            F.round(F.max("running_value"), 2).alias("total_value"),
        )
        .where(F.col("n_events") >= 3)
        .orderBy("user_id")
    )


@_register(
    "lang_source_pivot",
    """
    SELECT lang,
           CAST(COUNT(*) FILTER (source = 'web')    AS BIGINT) AS web,
           CAST(COUNT(*) FILTER (source = 'pdf')    AS BIGINT) AS pdf,
           CAST(COUNT(*) FILTER (source NOT IN ('web','pdf')) AS BIGINT) AS other
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def lang_source_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregation pivot (stable column set, unlike
    df.pivot's data-driven columns): one shuffle, map-side partials."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.sum(F.when(F.col("source") == "web", 1).otherwise(0)).cast("bigint").alias("web"),
            F.sum(F.when(F.col("source") == "pdf", 1).otherwise(0)).cast("bigint").alias("pdf"),
            F.sum(F.when(~F.col("source").isin("web", "pdf"), 1).otherwise(0))
            .cast("bigint")
            .alias("other"),
        )
        .orderBy("lang")
    )


@_register(
    "event_value_stats",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)                            AS n,
           ROUND(AVG(value), 4)                                AS avg_value,
           ROUND(stddev_samp(value), 4)                        AS sd_value,
           ROUND(corr(value, floor(epoch(ts))), 4)             AS corr_value_time
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def event_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregates per group: sample stddev and the
    value-vs-time correlation (drift detector). All three are
    single-pass partial-aggregatable — Spark computes (n, Σx, Σx²,
    Σxy) map-side and merges, so the shuffle carries one tiny struct
    per (partition, group)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.stddev("value"), 4).alias("sd_value"),
            F.round(
                F.corr("value", F.unix_timestamp("ts").cast("double")), 4
            ).alias("corr_value_time"),
        )
        .orderBy("event_type")
    )


@_register(
    "gapfill_daily_locf",
    """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             COUNT(*) AS n, SUM(value) AS tot
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ),
    grid AS (
      SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ),
    filled AS (
      SELECT g.user_id, g.day,
             COALESCE(d.n, 0) AS n_events,
             last_value(d.tot IGNORE NULLS)
               OVER (PARTITION BY g.user_id ORDER BY g.day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
      FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
    )
    SELECT user_id,
           strftime(day, '%Y-%m-%d')   AS day,
           CAST(n_events AS BIGINT)    AS n_events,
           ROUND(carried, 2)           AS carried_total
    FROM filled ORDER BY user_id, day
    """,
)
def gapfill_daily_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: per-user daily grid (sequence +
    explode — no driver loop), zero-filled counts, and
    last-observation-carried-forward totals via last(ignorenulls) over
    an ordered window. The grid explode is linear in users × days and
    partitions by user_id, the same key the window needs — one
    shuffle end to end."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"), F.sum("value").alias("tot"))
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = bounds.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
            F.round(F.last("tot", ignorenulls=True).over(w), 2).alias(
                "carried_total"
            ),
        )
        .orderBy("user_id", "day")
    )


@_register(
    "full_outer_reconcile",
    """
    WITH li AS (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
             ROUND(SUM(l_extendedprice), 2) AS lines_total
      FROM lineitem GROUP BY 1
    )
    SELECT CASE WHEN o.o_orderkey IS NULL THEN 'lines_only'
                WHEN li.l_orderkey IS NULL THEN 'order_only'
                ELSE 'matched' END       AS status,
           CAST(COUNT(*) AS BIGINT)      AS n,
           CAST(COALESCE(SUM(li.n_lines), 0) AS BIGINT) AS total_lines
    FROM orders o FULL OUTER JOIN li ON li.l_orderkey = o.o_orderkey
    GROUP BY 1 ORDER BY 1
    """,
)
def full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit via FULL OUTER join: orders with no
    lineitems, lineitems with no order, and matched pairs, counted per
    status. The warehouse reconciliation pattern — at 100 TB both
    sides shuffle on the key once (full outer can't broadcast), and the
    pre-aggregation of lineitem to one row per order shrinks the
    probe side ~4× before the join."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("lines_total"),
        )
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey, "full_outer")
    status = (
        F.when(F.col("o_orderkey").isNull(), "lines_only")
        .when(F.col("l_orderkey").isNull(), "order_only")
        .otherwise("matched")
    )
    return (
        j.select(status.alias("status"), "n_lines")
        .groupBy("status")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.coalesce(F.sum("n_lines"), F.lit(0)).cast("bigint").alias("total_lines"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# SCD2 versioning, rolling range-frame windows, profiling, Z-order layout
# ---------------------------------------------------------------------------


@_register(
    "scd2_event_type",
    """
    WITH s AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS es
      FROM events
    ),
    c AS (
      SELECT user_id, event_id, event_type, es,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR event_type <> lag(event_type) OVER w
                  THEN 1 ELSE 0 END AS chg
      FROM s WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
    ),
    v AS (
      SELECT user_id, event_type, es,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY es, event_id) AS version
      FROM c
    ),
    g AS (
      SELECT user_id, version, event_type,
             MIN(es) AS valid_from, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM v GROUP BY user_id, version, event_type
    )
    SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
           valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
             AS valid_to,
           n_events
    FROM g ORDER BY user_id, version
    """,
)
def scd2_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from an event log: collapse
    consecutive runs of the tracked attribute into versioned rows with
    [valid_from, valid_to) intervals (lag → change flag → running sum →
    per-version min/lead). The CDC-to-dimension pattern: one shuffle on
    user_id serves every window frame and the final rollup.

    Ordering uses whole-second timestamps plus event_id on BOTH engines
    so ns-vs-us precision can't flip ties."""
    e = load_table(spark, sf_dir, "events")
    es = F.floor(F.unix_timestamp("ts")).cast("bigint")
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    prev = F.lag("event_type").over(w)
    versions = (
        e.select("user_id", "event_id", "event_type", es.alias("es"))
        .withColumn(
            "chg",
            (prev.isNull() | (F.col("event_type") != prev)).cast("int"),
        )
        .withColumn("version", F.sum("chg").over(w).cast("bigint"))
    )
    g = versions.groupBy("user_id", "version", "event_type").agg(
        F.min("es").alias("valid_from"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    return g.select(
        "user_id",
        "version",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "n_events",
    ).orderBy("user_id", "version")


@_register(
    "rolling_30d_spend",
    """
    SELECT o_orderkey, o_custkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           ROUND(SUM(o_totalprice) OVER w, 2) AS spend_30d,
           CAST(COUNT(*) OVER w AS BIGINT)    AS n_orders_30d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 29 DAY PRECEDING AND CURRENT ROW)
    ORDER BY o_orderkey
    """,
)
def rolling_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer 30-day rolling spend via a RANGE frame ordered by
    day number — the time-decayed-feature shape. RANGE (not ROWS)
    makes same-day orders frame-identical, so the result is
    deterministic under any intra-day order; one shuffle on o_custkey
    serves both windows."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "d", F.datediff("o_orderdate", F.lit("1970-01-01"))
    )
    w = Window.partitionBy("o_custkey").orderBy("d").rangeBetween(-29, 0)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
        F.count("*").over(w).cast("bigint").alias("n_orders_30d"),
    ).orderBy("o_orderkey")


_PROFILE_COLS = [
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderdate", False),
    ("o_orderpriority", False),
]


def _profile_oracle() -> str:
    parts = []
    for c, numeric in _PROFILE_COLS:
        if numeric:
            mn = f"ROUND(MIN(CAST({c} AS DOUBLE)), 6)"
            mx = f"ROUND(MAX(CAST({c} AS DOUBLE)), 6)"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
        parts.append(
            f"""SELECT '{c}' AS column_name,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               {mn} AS min_val, {mx} AS max_val
            FROM orders"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY column_name"


@_register("data_profile", _profile_oracle())
def data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiling (null count, exact distinct count,
    numeric min/max) unpivoted to one row per column — the data-quality
    sweep every ingest runs before training. All measures share a
    single aggregate job; the multi-distinct is Catalyst's Expand
    (at 100 TB swap count_distinct for approx_count_distinct and the
    Expand disappears — tolerance pinned in test_scale_features)."""
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c, numeric in _PROFILE_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__nd"))
        if numeric:
            aggs.append(F.round(F.min(F.col(c).cast("double")), 6).alias(f"{c}__min"))
            aggs.append(F.round(F.max(F.col(c).cast("double")), 6).alias(f"{c}__max"))
    row = o.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', {c}__nulls, {c}__nd, "
        + (f"{c}__min, {c}__max" if numeric else "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)")
        for c, numeric in _PROFILE_COLS
    )
    return row.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stacked}) AS "
        "(column_name, n_nulls, n_distinct, min_val, max_val)"
    ).orderBy("column_name")


def _zkey_sql(xcol: str, ycol: str, duck: bool) -> str:
    """16-bit Morton (Z-order) key: interleave 8 bits of x and y.
    Same arithmetic on both engines; only integer-division syntax
    differs (Spark DIV vs DuckDB //)."""
    div = "//" if duck else "DIV"
    terms = []
    for i in range(8):
        terms.append(f"(({xcol} {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({ycol} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def _zorder_oracle() -> str:
    zkey = _zkey_sql("x", "y", duck=True)
    return f"""
    WITH q AS (
      SELECT user_id % 256 AS x,
             CAST(floor(value) AS BIGINT) % 256 AS y,
             value
      FROM events WHERE value IS NOT NULL AND value >= 0
    ),
    z AS (SELECT ({zkey}) AS zkey, value FROM q)
    SELECT CAST(zkey // 256 AS BIGINT)      AS zbucket,
           CAST(COUNT(*) AS BIGINT)         AS n,
           ROUND(SUM(value), 2)             AS sum_value
    FROM z GROUP BY zbucket ORDER BY zbucket
    """


@_register("zorder_cluster", _zorder_oracle())
def zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over two quantized dimensions,
    rolled up per 256-key bucket. Writing sorted by zkey co-locates
    rows close in BOTH dimensions into the same files, so 2-D range
    predicates prune most of a 100 TB table's files on min/max stats —
    the Delta/Iceberg OPTIMIZE ZORDER layout, computed here as pure
    JVM integer arithmetic inside codegen."""
    e = load_table(spark, sf_dir, "events")
    q = e.where(F.col("value").isNotNull() & (F.col("value") >= 0)).select(
        (F.col("user_id") % 256).alias("x"),
        (F.floor("value").cast("bigint") % 256).alias("y"),
        "value",
    )
    z = q.selectExpr(f"({_zkey_sql('x', 'y', duck=False)}) AS zkey", "value")
    return (
        z.groupBy((F.col("zkey") / 256).cast("bigint").alias("zbucket"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("zbucket")
    )


# ---------------------------------------------------------------------------
# product-analytics shapes: funnel, cohort retention, anomalies, binning
# ---------------------------------------------------------------------------


@_register(
    "funnel_conversion",
    """
    WITH ev AS (
      SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es
      FROM events
    ),
    u1 AS (SELECT user_id, MIN(es) AS t1 FROM ev
           WHERE event_type = 'view' GROUP BY user_id),
    u2 AS (SELECT ev.user_id, MIN(es) AS t2 FROM ev JOIN u1 USING (user_id)
           WHERE event_type = 'click' AND es >= t1 GROUP BY ev.user_id),
    u3 AS (SELECT ev.user_id, MIN(es) AS t3 FROM ev JOIN u2 USING (user_id)
           WHERE event_type = 'purchase' AND es >= t2 GROUP BY ev.user_id)
    SELECT 'view' AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM u1
    UNION ALL
    SELECT 'view>click', CAST(COUNT(*) AS BIGINT) FROM u2
    UNION ALL
    SELECT 'view>click>purchase', CAST(COUNT(*) AS BIGINT) FROM u3
    ORDER BY step
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step funnel (view → click → purchase): each stage
    is the earliest qualifying event AFTER the previous stage's
    timestamp, so out-of-order conversions don't count. Stage frontiers
    are one row per user; they join back on user_id with NO hard
    broadcast hint (a frontier is user-cardinality — auto-broadcast
    below the size threshold, shuffle-hash above it). Each frontier
    is localCheckpoint'ed: u1 feeds its own count AND the u2 join (u2
    likewise), so without the materialization every downstream stage
    re-derived the whole chain from the fact table — six events scans
    for a three-stage funnel. Checkpointed, each stage scans events
    exactly once with its event_type pushed into the scan, and the
    materialized state is the user-grain frontier (2 narrow ints per
    converting user), never the fact table."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("es"),
    )
    u1 = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("es").alias("t1"))
        .localCheckpoint(eager=True)
    )
    u2 = (
        e.where(F.col("event_type") == "click")
        .join(u1, "user_id")
        .where(F.col("es") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("es").alias("t2"))
        .localCheckpoint(eager=True)
    )
    u3 = (
        e.where(F.col("event_type") == "purchase")
        .join(u2, "user_id")
        .where(F.col("es") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("es").alias("t3"))
    )
    count = lambda df, step: df.agg(  # noqa: E731
        F.lit(step).alias("step"), F.count("*").cast("bigint").alias("n_users")
    ).select("step", "n_users")
    return (
        count(u1, "view")
        .unionByName(count(u2, "view>click"))
        .unionByName(count(u3, "view>click>purchase"))
        .orderBy("step")
    )


@_register(
    "retention_cohorts",
    """
    WITH ev AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
      FROM events
    ),
    cohort AS (SELECT user_id, MIN(wk) AS cohort_week FROM ev GROUP BY user_id)
    SELECT cohort_week,
           wk - cohort_week            AS week_offset,
           CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS n_users
    FROM ev JOIN cohort USING (user_id)
    GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: cohort = epoch-week of the
    user's first event; cells count distinct users active k weeks
    later. Epoch-week integer math (not date_trunc) so both engines
    bucket identically. The cohort map is one row per user and joins
    back on user_id with no hard hint (user-cardinality: broadcast
    only while it fits the size threshold); the join and the
    distinct-count aggregate both key on user-derived columns so the
    partitioning carries through."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        (F.floor(F.unix_timestamp("ts")).cast("bigint") / 604800)
        .cast("bigint")
        .alias("wk"),
    )
    cohort = e.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    return (
        e.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("wk") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@_register(
    "event_anomaly_zscore",
    """
    WITH stats AS (
      SELECT event_type, AVG(value) AS mu, stddev_samp(value) AS sd
      FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type, value,
           ROUND((value - mu) / sd, 3) AS z
    FROM events e JOIN stats USING (event_type)
    WHERE sd IS NOT NULL AND sd > 0
      AND abs((value - mu) / sd) > 2.5
    ORDER BY event_id
    """,
)
def event_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier flagging: two-pass (tiny stats
    aggregate, broadcast back over the stream) rather than a window —
    at 100 TB a window over event_type would shuffle the whole fact
    table into a handful of giant partitions; the broadcast join keeps
    the scan pipelined with no shuffle at all. A degenerate group
    (every value identical, sd = 0, or a single event, sd NULL) has no
    outliers BY DEFINITION and is filtered before the division — under
    the session's ANSI default an unguarded (value-mu)/sd would throw
    DIVIDE_BY_ZERO for it, the seasonal_hour_anomaly guard applied
    here too (both engines' WHERE mirrors it)."""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        e.join(F.broadcast(stats), "event_type")
        .where(F.col("sd").isNotNull() & (F.col("sd") > 0))
        .where(F.abs(z) > 2.5)
        .select("event_id", "event_type", "value", F.round(z, 3).alias("z"))
        .orderBy("event_id")
    )


@_register(
    "ntile_value_buckets",
    """
    WITH b AS (
      SELECT event_type, value,
             ntile(10) OVER (PARTITION BY event_type
                             ORDER BY value, event_id) AS bucket
      FROM events
    )
    SELECT event_type, bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(value), 2)     AS lo,
           ROUND(MAX(value), 2)     AS hi
    FROM b GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
)
def ntile_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth decile binning per group (feature bucketizer):
    ntile over a deterministic total order (value, event_id) so bucket
    boundaries are identical across engines. At 100 TB the exact
    total-order sort gives way to approx_percentile boundaries; the
    sketch variant's tolerance is pinned in test_scale_features."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        e.select("event_type", "value", F.ntile(10).over(w).alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
        .orderBy("event_type", "bucket")
    )


DEBOUNCE_GAP_S = 5


@_register(
    "event_debounce",
    f"""
    WITH s AS (
      SELECT user_id, event_type, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS es
      FROM events
    ),
    l AS (
      SELECT event_type, es,
             lag(es) OVER (PARTITION BY user_id, event_type
                           ORDER BY es, event_id) AS prev
      FROM s
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN prev IS NULL OR es - prev > {DEBOUNCE_GAP_S}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN prev IS NOT NULL AND es - prev <= {DEBOUNCE_GAP_S}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
    FROM l GROUP BY event_type ORDER BY event_type
    """,
)
def event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry debounce: an event is a bounce if the same
    (user, type) fired within the previous 5 seconds — lag-based, so
    each event is judged against its immediate predecessor (the
    streaming dedup window's batch analog). One shuffle on
    (user_id, event_type) serves the window and feeds the tiny
    per-type rollup."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("es"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("es", "event_id")
    l = e.withColumn("prev", F.lag("es").over(w))
    bounce = F.col("prev").isNotNull() & (
        (F.col("es") - F.col("prev")) <= DEBOUNCE_GAP_S
    )
    return (
        l.groupBy("event_type")
        .agg(
            F.sum((~bounce).cast("bigint")).alias("n_kept"),
            F.sum(bounce.cast("bigint")).alias("n_dropped"),
        )
        .orderBy("event_type")
    )


@_register(
    "cube_priority_status",
    """
    SELECT o_orderpriority,
           o_orderstatus,
           CAST(COUNT(*) AS BIGINT)      AS n,
           ROUND(SUM(o_totalprice), 2)   AS total
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
)
def cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions: all four grouping sets (both, each,
    grand total) from a single Expand + one shuffle — the OLAP
    cross-tab companion to rollup_flag_status."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy(
            F.asc_nulls_first("o_orderpriority"), F.asc_nulls_first("o_orderstatus")
        )
    )


@_register(
    "rank_functions",
    """
    SELECT o_orderkey,
           o_orderpriority,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           ROUND(percent_rank() OVER w, 6)     AS prnk,
           ROUND(cume_dist()    OVER w, 6)     AS cdist
    FROM orders
    WHERE o_custkey < 20
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
)
def rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function surface (rank / dense_rank /
    percent_rank / cume_dist) over one deterministic window — tie
    semantics value-checked in one pass. One shuffle serves all four
    frames."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 20)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
            F.round(F.percent_rank().over(w), 6).alias("prnk"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
        )
        .orderBy("o_orderkey")
    )


@_register(
    "skew_report",
    """
    WITH k AS (
      SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id
    ),
    t AS (SELECT SUM(c) AS total, COUNT(*) AS n_keys FROM k)
    SELECT user_id,
           CAST(c AS BIGINT)                   AS n_rows,
           ROUND(1.0 * c / total, 6)           AS share,
           ROUND(1.0 * c * n_keys / total, 3)  AS skew_factor
    FROM k CROSS JOIN t
    QUALIFY row_number() OVER (ORDER BY c DESC, user_id) <= 10
    ORDER BY n_rows DESC, user_id
    """,
)
def skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic: the top hot keys with their share
    of all rows and skew factor (key rows / mean rows-per-key) — the
    report that decides whether a join needs salting or AQE skew
    handling. One aggregate over the key + a broadcast scalar."""
    e = load_table(spark, sf_dir, "events")
    k = e.groupBy("user_id").agg(F.count("*").alias("c"))
    t = k.agg(
        F.sum("c").alias("total"), F.count("*").alias("n_keys")
    )
    return (
        k.crossJoin(F.broadcast(t))
        .select(
            "user_id",
            F.col("c").cast("bigint").alias("n_rows"),
            F.round(F.col("c") / F.col("total"), 6).alias("share"),
            F.round(F.col("c") * F.col("n_keys") / F.col("total"), 3).alias(
                "skew_factor"
            ),
        )
        .orderBy(F.desc("n_rows"), "user_id")
        .limit(10)
    )


MERGE_CUTOFF = "1997-01-01"


@_register(
    "snapshot_merge_upsert",
    f"""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate < TIMESTAMP '{MERGE_CUTOFF}'
    ),
    changes AS (
      SELECT o_orderkey,
             arg_max(o_orderstatus, o_orderdate) AS o_orderstatus,
             arg_max(o_totalprice, o_orderdate)  AS o_totalprice
      FROM orders WHERE o_orderdate >= TIMESTAMP '{MERGE_CUTOFF}'
      GROUP BY o_orderkey
    )
    SELECT CASE WHEN b.o_orderkey IS NULL THEN 'insert'
                WHEN c.o_orderkey IS NULL THEN 'unchanged'
                ELSE 'update' END          AS action,
           CAST(COUNT(*) AS BIGINT)        AS n,
           ROUND(SUM(COALESCE(c.o_totalprice, b.o_totalprice)), 2) AS merged_total
    FROM base b FULL OUTER JOIN changes c USING (o_orderkey)
    GROUP BY action ORDER BY action
    """,
)
def snapshot_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics over plain parquet: a change batch (latest
    row per key via max_by) full-outer-joined onto the base snapshot,
    classifying every key insert / update / unchanged and computing the
    merged value — the lakehouse upsert loop without a table format.
    At 100 TB both sides shuffle once on the key (a full outer can't
    broadcast); the change batch is pre-collapsed to one row per key
    before the join, which is what bounds the shuffle."""
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(MERGE_CUTOFF).cast("timestamp")
    base = o.where(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    changes = (
        o.where(F.col("o_orderdate") >= cutoff)
        .groupBy("o_orderkey")
        .agg(
            F.max_by("o_orderstatus", "o_orderdate").alias("c_status"),
            F.max_by("o_totalprice", "o_orderdate").alias("c_price"),
        )
    )
    j = base.alias("b").join(
        changes.alias("c"),
        F.col("b.o_orderkey") == F.col("c.o_orderkey"),
        "full_outer",
    )
    action = (
        F.when(F.col("b.o_orderkey").isNull(), "insert")
        .when(F.col("c.o_orderkey").isNull(), "unchanged")
        .otherwise("update")
    )
    return (
        j.select(
            action.alias("action"),
            F.coalesce(F.col("c_price"), F.col("b.o_totalprice")).alias("p"),
        )
        .groupBy("action")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("p"), 2).alias("merged_total"),
        )
        .orderBy("action")
    )


@_register("funnel_conversion_onepass", ORACLES["funnel_conversion"])
def funnel_conversion_onepass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same funnel, one scan: per-user event structs collect into a
    sorted array (ONE shuffle on user_id), then higher-order functions
    (filter/transform/array_min) walk the chain t1 -> t2 -> t3 inside
    whole-stage codegen — no joins at all, versus the chained
    broadcast-join form's three scans. The trade: per-user state must
    fit a row (collect_list), so this is the bounded-cardinality
    variant; funnel_conversion stays the unbounded-safe plan. Oracle
    shared verbatim with funnel_conversion."""
    e = load_table(spark, sf_dir, "events")
    evs = e.where(
        F.col("event_type").isin("view", "click", "purchase")
    ).select(
        "user_id",
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("es"),
    )
    per_user = evs.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("es"))).alias("t1"),
        F.array_sort(F.collect_list(F.struct("es", "event_type"))).alias("seq"),
    )

    def stage_after(prev, typ):
        return F.array_min(
            F.transform(
                F.filter(
                    F.col("seq"),
                    lambda s: (s["event_type"] == typ) & (s["es"] >= prev),
                ),
                lambda s: s["es"],
            )
        )

    staged = per_user.withColumn("t2", stage_after(F.col("t1"), "click")).withColumn(
        "t3", stage_after(F.col("t2"), "purchase")
    )
    counts = staged.agg(
        F.count("t1").alias("c1"), F.count("t2").alias("c2"), F.count("t3").alias("c3")
    )
    return counts.selectExpr(
        "stack(3, 'view', c1, 'view>click', c2, 'view>click>purchase', c3)"
        " AS (step, n_users)"
    ).orderBy("step")


@_register(
    "event_transition_matrix",
    """
    WITH s AS (
      SELECT user_id, event_type, ts, event_id FROM events
    ),
    bi AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS to_type
      FROM s
    ),
    c AS (
      SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM bi WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           ROUND(n / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE), 4)
             AS p
    FROM c ORDER BY from_type, to_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (the session-flow model behind next-event prediction).

    Scale shape: ONE shuffle on user_id feeds the lead() window; the
    (from, to) count then partial-aggregates map-side down to at most
    |event_types|^2 rows, so the row-normalizing second window runs on
    a ~25-row frontier — per-user sequences never leave their executor.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    bi = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = bi.groupBy("from_type", "to_type").agg(
        F.count("*").cast("bigint").alias("n")
    )
    wn = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wn).cast("double"), 4).alias("p"),
    ).orderBy("from_type", "to_type")


@_register(
    "concurrency_minute_peak",
    """
    WITH iv AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS es
      FROM events
    ),
    ticks AS (
      SELECT event_type,
             unnest(generate_series(
               CAST(ceil(es / 60.0) AS BIGINT) * 60, es + 299, 60)) AS tick
      FROM iv
    ),
    per_tick AS (
      SELECT event_type, tick, CAST(COUNT(*) AS BIGINT) AS c
      FROM ticks GROUP BY event_type, tick
    )
    SELECT event_type,
           CAST(tick // 86400 AS BIGINT) AS epoch_day,
           CAST(MAX(c) AS BIGINT)        AS peak_concurrency
    FROM per_tick
    GROUP BY event_type, epoch_day
    ORDER BY event_type, epoch_day
    """,
)
def concurrency_minute_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type per day, sampled at minute ticks
    — each event holds a 5-minute lease [es, es+300).

    Scale shape: the classic +1/-1 sweep needs a running sum over ONE
    totally-ordered partition per event_type — a giant-partition
    non-starter at 100 TB. Sampling at minute granularity instead turns
    concurrency into a pure count: explode each lease onto its <=6
    covering ticks map-side (sequence+explode, no UDF), then count per
    (event_type, tick) with map-side partial agg and roll up to the
    daily peak. Shuffle keys are (event_type, tick) — cardinality grows
    with time span, not row count, so partitions stay bounded.
    """
    e = load_table(spark, sf_dir, "events")
    iv = e.select(
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("es"),
    )
    ticks = iv.select(
        "event_type",
        F.explode(
            F.sequence(
                (F.ceil(F.col("es") / F.lit(60.0)) * 60).cast("bigint"),
                (F.col("es") + 299).cast("bigint"),
                F.lit(60).cast("bigint"),
            )
        ).alias("tick"),
    )
    per_tick = ticks.groupBy("event_type", "tick").agg(
        F.count("*").cast("bigint").alias("c")
    )
    return (
        per_tick.withColumn(
            "epoch_day", (F.col("tick") / F.lit(86400)).cast("bigint")
        )
        .groupBy("event_type", "epoch_day")
        .agg(F.max("c").cast("bigint").alias("peak_concurrency"))
        .orderBy("event_type", "epoch_day")
    )


@_register(
    "time_weighted_avg",
    """
    WITH s AS (
      SELECT user_id, value, ts, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS es
      FROM events
    ),
    w AS (
      SELECT user_id, value,
             lead(es) OVER (PARTITION BY user_id ORDER BY ts, event_id) - es
               AS dt
      FROM s
    )
    SELECT user_id,
           ROUND(SUM(value * dt) / SUM(dt), 4) AS twap
    FROM w
    WHERE dt IS NOT NULL
    GROUP BY user_id
    HAVING SUM(dt) > 0
    ORDER BY user_id
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each reading holds
    until the next one, so it's weighted by its holding duration —
    the irregular-time-series average a naive AVG() gets wrong.

    Scale shape: one shuffle on user_id serves both the lead() window
    and the final aggregate (same partitioning, no second exchange).
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    es = F.floor(F.unix_timestamp("ts")).cast("bigint")
    deltas = e.select(
        "user_id",
        "value",
        (F.floor(F.unix_timestamp(F.lead("ts").over(w))).cast("bigint") - es).alias("dt"),
    ).where(F.col("dt").isNotNull())
    # division guarded INSIDE the agg: the _sum_dt > 0 filter runs after
    # the aggregate, so an all-zero-gap user (2+ events in the same
    # floor-second) would already have thrown DIVIDE_BY_ZERO under the
    # session's ANSI default before the filter could drop the group —
    # the same hazard value_trend_by_type guards against
    sum_dt = F.sum("dt")
    return (
        deltas.groupBy("user_id")
        .agg(
            F.round(
                F.when(sum_dt > 0, F.sum(F.col("value") * F.col("dt")) / sum_dt), 4
            ).alias("twap"),
            sum_dt.alias("_sum_dt"),
        )
        .where(F.col("_sum_dt") > 0)
        .drop("_sum_dt")
        .orderBy("user_id")
    )


EWMA_ALPHA = 0.3


@_register(
    "ewma_user_value",
    f"""
    WITH ordered AS (
      SELECT user_id,
             list(value ORDER BY ts, event_id) AS vals
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           ROUND(list_reduce(vals,
                 (acc, x) -> acc * {1 - EWMA_ALPHA} + x * {EWMA_ALPHA}), 6) AS ewma
    FROM ordered
    ORDER BY user_id
    """,
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of event values
    (alpha=EWMA_ALPHA=0.3, init = first value) — the classic streaming
    feature a window frame CANNOT express (each output depends on the
    whole prefix, not a bounded frame). Computed as an ordered
    in-array left fold: collect the user's values in (ts, event_id)
    order, fold acc*(1-a)+x*a. Both engines fold the identical
    sequence with the identical expression left-to-right, so the
    doubles match bit-for-bit (output rounded at 6 to be safe).

    Scale shape: one shuffle (the groupBy); the fold is map-side
    array arithmetic. Per-key arrays are bounded by per-user activity
    — the same bounded-per-key assumption every sequence operator here
    makes (sequence_packing, funnel_onepass); for unbounded keys the
    streaming form is applyInPandasWithState carrying (ewma, last_ts)
    as 16 bytes of state."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.struct(
            F.col("ts").alias("ts"), F.col("event_id").alias("eid"), F.col("value").alias("v")
        ).alias("s"),
    )
    a = EWMA_ALPHA
    vals = F.transform(F.array_sort(F.collect_list("s")), lambda x: x["v"])
    fold = F.aggregate(
        F.slice(vals, 2, F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(1 - a) + x * F.lit(a),
    )
    return (
        e.groupBy("user_id")
        .agg(
            F.size(vals).cast("bigint").alias("n_events"),
            F.round(fold, 6).alias("ewma"),
        )
        .orderBy("user_id")
    )


@_register(
    "dq_constraint_report",
    """
    SELECT 'orders.o_orderkey unique' AS check_name,
           CAST((SELECT COUNT(*) FROM (
              SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
           )) AS BIGINT) AS violations
    UNION ALL
    SELECT 'lineitem.l_orderkey fk orders',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
    UNION ALL
    SELECT 'orders.o_custkey fk customer',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_quantity in (0,50]',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_quantity <= 0 OR l_quantity > 50) AS BIGINT)
    UNION ALL
    SELECT 'orders.o_totalprice positive',
           CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0) AS BIGINT)
    UNION ALL
    SELECT 'orders.o_orderdate not null',
           CAST((SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL) AS BIGINT)
    ORDER BY check_name
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint sweep (the Deequ/dbt-test shape): six
    declarative constraints — key uniqueness, two foreign keys, a
    range, a sign, a not-null — each evaluated as a violation COUNT so
    the report is one small frame a scheduler can alert on.

    Scale shape: every orders-side check rides ONE orders pass — the
    customer FK is a LEFT broadcast join marking missing keys, and the
    key-uniqueness groupBy doubles as the partial-combine stage for
    the sign / not-null / FK conditional sums (a two-level aggregate:
    per-key map-side, then one global fold), where the
    one-aggregate-per-check form scanned orders five times. The
    lineitem FK likewise marks instead of anti-joining so the quantity
    range check is a conditional sum of the SAME pass (its right side
    is a one-column orders key scan — column pruning makes that read a
    fraction of the full-width pass). Each check stays linear in its
    table; stack() explodes the two count frames into the 6-row
    report."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")

    per_key = (
        o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .join(
            # no hard hint: the full customer key set broadcasts only
            # while it fits (at 100 TB the FK mark degrades to a hash
            # join on o_custkey, same as the anti-join it replaced).
            # distinct() because a mark join must probe a key SET: a
            # duplicated c_custkey — exactly the dirty data this report
            # exists to catch — would otherwise fan out the orders rows
            # and inflate every per-key count (false uniqueness
            # violations included); the EXISTS-form oracle is immune
            c.select("c_custkey").distinct(),
            o.o_custkey == c.c_custkey,
            "left",
        )
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("sg"),
            F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)).alias("nn"),
            F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).alias("fk"),
        )
    )
    o_checks = per_key.agg(
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).cast("bigint").alias("dup"),
        F.sum("sg").cast("bigint").alias("sg"),
        F.sum("nn").cast("bigint").alias("nn"),
        F.sum("fk").cast("bigint").alias("fk"),
    )
    li_checks = (
        li.select("l_orderkey", "l_quantity")
        # same distinct-key-set rule: a duplicated o_orderkey would
        # replicate lineitem rows and inflate the quantity-range count
        .join(o.select("o_orderkey").distinct(), li.l_orderkey == o.o_orderkey, "left")
        .agg(
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("fk"),
            F.sum(
                F.when((F.col("l_quantity") <= 0) | (F.col("l_quantity") > 50), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("rng"),
        )
    )
    report = o_checks.selectExpr(
        "stack(4, 'orders.o_orderkey unique', dup,"
        " 'orders.o_custkey fk customer', fk,"
        " 'orders.o_totalprice positive', sg,"
        " 'orders.o_orderdate not null', nn) AS (check_name, violations)"
    ).unionByName(
        li_checks.selectExpr(
            "stack(2, 'lineitem.l_orderkey fk orders', fk,"
            " 'lineitem.l_quantity in (0,50]', rng) AS (check_name, violations)"
        )
    )
    return report.orderBy("check_name")


@_register(
    "gdpr_purge_report",
    """
    WITH purge AS (
      SELECT DISTINCT user_id FROM events WHERE user_id % 37 = 0
    )
    SELECT 'events' AS "table",
           CAST((SELECT COUNT(*) FROM events e JOIN purge p USING (user_id)) AS BIGINT)
             AS rows_purged,
           CAST((SELECT COUNT(*) FROM events e
                 WHERE NOT EXISTS (SELECT 1 FROM purge p
                                   WHERE p.user_id = e.user_id)) AS BIGINT)
             AS rows_kept,
           CAST((SELECT COUNT(*) FROM purge) AS BIGINT) AS n_subjects
    """,
)
def gdpr_purge_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten audit: given a deletion-request set (here
    a deterministic synthetic cohort — every 37th user), report rows
    to purge vs keep plus the subject count; the keep side IS the
    rewrite input for the actual delete job.

    Scale shape: the request set is subject-sized, so it checkpoints
    once (at 100 TB it arrives as its own small table and the distinct
    is free) and broadcasts onto ONE fact-table pass as a LEFT join —
    purge and keep counts are conditional sums of the same aggregate
    (the semi/anti pair scanned events twice more for the same report,
    re-deriving the request set inside each). The keep side of the
    actual delete job is the identical join with a filter instead of a
    sum: on a partitioned lake it rewrites only partitions containing
    subjects (dynamic partition overwrite, sources/parquet_lake
    pattern); nothing here is quadratic in the corpus."""
    e = load_table(spark, sf_dir, "events")
    purge = (
        e.where(F.col("user_id") % 37 == 0)
        .select(F.col("user_id").alias("p_uid"))
        .distinct()
        # subject-sized; feeds the mark join AND the subject count
        .localCheckpoint(eager=True)
    )
    marked = e.join(
        F.broadcast(purge), e.user_id == F.col("p_uid"), "left"
    )
    hit = F.col("p_uid").isNotNull()
    counts = marked.agg(
        F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias("rows_purged"),
        F.sum(F.when(hit, 0).otherwise(1)).cast("bigint").alias("rows_kept"),
    )
    subjects = purge.agg(F.count("*").cast("bigint").alias("n_subjects"))
    return counts.crossJoin(subjects).select(
        F.lit("events").alias("table"),
        "rows_purged",
        "rows_kept",
        "n_subjects",
    )


# ---------------------------------------------------------------------------
# Snapshot CDC diff — the read side of the lakehouse loop whose write
# side is snapshot_merge_upsert: given two table versions, emit the
# change feed (insert / update / delete with pre- and post-image
# aggregates). Table formats derive this from manifests; over plain
# parquet it is one key-partitioned full outer join.
# ---------------------------------------------------------------------------

CDC_V1_CUTOFF = "1999-01-01"
CDC_V2_CUTOFF = "2000-01-01"
CDC_DELETE_MOD = 97  # keys deleted in v2
CDC_UPDATE_MOD = 13  # keys whose payload changed in v2


def _cdc_oracle() -> str:
    from automated_dow30_earnings_reports_spark.operators.sketches import _DIGEST_SQL

    digest = _DIGEST_SQL.format(t="CAST(o_orderkey AS VARCHAR)")
    return f"""
    WITH v1 AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate < TIMESTAMP '{CDC_V1_CUTOFF}'
    ),
    v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % {CDC_UPDATE_MOD} = 0
                  THEN o_orderstatus || '*' ELSE o_orderstatus END AS o_orderstatus,
             o_totalprice
      FROM orders
      WHERE o_orderdate < TIMESTAMP '{CDC_V2_CUTOFF}'
        AND o_orderkey % {CDC_DELETE_MOD} <> 0
    ),
    d AS (
      SELECT CASE WHEN a.o_orderkey IS NULL THEN 'insert'
                  WHEN b.o_orderkey IS NULL THEN 'delete'
                  WHEN a.o_orderstatus <> b.o_orderstatus THEN 'update'
                  ELSE 'unchanged' END AS change_type,
             COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
             a.o_totalprice AS pre_price,
             b.o_totalprice AS post_price
      FROM v1 a FULL OUTER JOIN v2 b USING (o_orderkey)
    )
    SELECT change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM({digest}) AS BIGINT) AS key_hash,
           ROUND(CAST(SUM(CAST(pre_price  AS DECIMAL(18,2))) AS DOUBLE), 2) AS pre_total,
           ROUND(CAST(SUM(CAST(post_price AS DECIMAL(18,2))) AS DOUBLE), 2) AS post_total
    FROM d WHERE change_type <> 'unchanged'
    GROUP BY change_type
    ORDER BY change_type
    """


@_register("snapshot_diff_cdc", _cdc_oracle())
def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed between two snapshot versions of the orders
    table (v2 adds 1999's orders, deletes every 97th key, rewrites the
    status of every 13th): classify every key insert / update / delete
    and aggregate the pre/post images, with an order-independent
    28-bit-digest key checksum per change class so the feed content —
    not just its counts — is value-checked.

    Scale shape: one full outer join, both sides shuffled once on the
    primary key (a full outer cannot broadcast); classification and
    image comparison are per-row expressions on the joined stream; the
    rollup is a bounded 3-group aggregate. Table formats shortcut the
    join with manifest-level file diffs — this is the format-agnostic
    fallback that works on plain parquet at the same shuffle cost as
    one co-partitioned join."""
    from automated_dow30_earnings_reports_spark.operators.sketches import _digest_col

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    v1 = o.where(F.col("o_orderdate") < F.lit(CDC_V1_CUTOFF)).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v2 = (
        o.where(
            (F.col("o_orderdate") < F.lit(CDC_V2_CUTOFF))
            & (F.col("o_orderkey") % CDC_DELETE_MOD != 0)
        )
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % CDC_UPDATE_MOD == 0,
                F.concat(F.col("o_orderstatus"), F.lit("*")),
            )
            .otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
            "o_totalprice",
        )
    )
    j = v1.alias("a").join(
        v2.alias("b"), F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    )
    change = (
        F.when(F.col("a.o_orderkey").isNull(), "insert")
        .when(F.col("b.o_orderkey").isNull(), "delete")
        .when(F.col("a.o_orderstatus") != F.col("b.o_orderstatus"), "update")
        .otherwise("unchanged")
    )
    key = F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey"))
    return (
        j.select(
            change.alias("change_type"),
            _digest_col(key.cast("string")).alias("kh"),
            F.col("a.o_totalprice").alias("pre_price"),
            F.col("b.o_totalprice").alias("post_price"),
        )
        .where(F.col("change_type") != "unchanged")
        .groupBy("change_type")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("kh").cast("bigint").alias("key_hash"),
            F.round(
                F.sum(F.col("pre_price").cast("decimal(18,2)")).cast("double"), 2
            ).alias("pre_total"),
            F.round(
                F.sum(F.col("post_price").cast("decimal(18,2)")).cast("double"), 2
            ).alias("post_total"),
        )
        .orderBy("change_type")
    )


# ---------------------------------------------------------------------------
# Market-basket pair mining: co-ordered part pairs with support counts
# (the frequent-itemset k=2 pass every recommender/affinity pipeline
# starts with).
# ---------------------------------------------------------------------------

COOC_TOPK = 20


@_register(
    "co_occurrence_part_pairs",
    f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM b x JOIN b y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2
    ),
    top AS (
      SELECT * FROM pairs ORDER BY support DESC, part_a, part_b LIMIT {COOC_TOPK}
    )
    SELECT t.part_a, pa.p_name AS name_a, t.part_b, pb.p_name AS name_b, t.support
    FROM top t
    JOIN part pa ON t.part_a = pa.p_partkey
    JOIN part pb ON t.part_b = pb.p_partkey
    ORDER BY t.support DESC, t.part_a, t.part_b
    """,
)
def co_occurrence_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent part pairs: distinct parts per order, within-order
    self-join ordered (part_a < part_b), support counts, top-20 with
    part names resolved AFTER the cut.

    Scale shape: the pair explosion is bounded by basket size (max 13
    distinct parts per order here → ≤ 78 pairs; production baskets get
    a per-basket cap exactly like the dedup DF cap); r10 shape: the
    per-order sorted part set is built in ONE map-side-combined
    collect_set exchange and the ordered pairs expand IN-ROW
    (graph._pair_explode) — the old distinct + self-join paid the
    dedup exchange plus a reused-but-sorted join exchange and a
    sort-merge join for the same pair multiset; pair support is one
    map-side-combined groupBy; the name join touches only the 20
    winners (tiny side, AQE broadcasts it — no hint on fact-derived
    part). Deterministic cut via (support, part_a, part_b)."""
    from automated_dow30_earnings_reports_spark.operators.graph import (
        _pair_explode,
    )

    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("pp"))
    )
    pairs = (
        _pair_explode(baskets, "pp", "part_a", "part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("bigint").alias("support"))
    )
    top = pairs.orderBy(F.col("support").desc(), "part_a", "part_b").limit(COOC_TOPK)
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        top.join(part.alias("pa"), F.col("part_a") == F.col("pa.p_partkey"))
        .join(part.alias("pb"), F.col("part_b") == F.col("pb.p_partkey"))
        .select(
            "part_a",
            F.col("pa.p_name").alias("name_a"),
            "part_b",
            F.col("pb.p_name").alias("name_b"),
            "support",
        )
        .orderBy(F.col("support").desc(), "part_a", "part_b")
    )


# ---------------------------------------------------------------------------
# Pivot / cube / sliding-distinct / per-group regression — the
# remaining relational API surfaces (df.pivot, df.rollup with
# grouping_id, distinct-over-sliding-window, closed-form OLS via
# moment aggregates).
# ---------------------------------------------------------------------------


@_register(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f,
           CAST(COUNT(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_o,
           CAST(COUNT(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_p
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tab via df.pivot with an EXPLICIT value list (statuses F/
    O/P). The explicit list matters at scale: without it Spark runs an
    extra distinct-collect job over the pivot column and the output
    schema becomes data-dependent — with it, the pivot compiles to the
    same one-shuffle conditional aggregation the oracle states."""
    o = load_table(spark, sf_dir, "orders").select("o_orderpriority", "o_orderstatus")
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0)
        .select(
            "priority",
            F.col("F").cast("bigint").alias("n_f"),
            F.col("O").cast("bigint").alias("n_o"),
            F.col("P").cast("bigint").alias("n_p"),
        )
        .orderBy("priority")
    )


@_register(
    "rolling_7d_distinct_users",
    """
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    days AS (SELECT DISTINCT d FROM du)
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS n_users_7d,
           CAST(COUNT(*) AS BIGINT) AS n_user_days
    FROM days JOIN du ON du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
    GROUP BY days.d
    ORDER BY day
    """,
)
def rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users over a sliding 7-day window — the aggregate
    window functions cannot express (COUNT(DISTINCT) OVER a RANGE
    frame is unsupported in both engines): pre-collapse events to
    distinct (day, user) pairs, then range-join the day dimension
    onto them and count distinct per window.

    Scale shape: the heavy input collapses FIRST (events -> at most
    days x users rows, one map-side-combined distinct); the range join
    replicates each (day, user) row at most 7x against a broadcast
    day dimension (bounded: days are calendar-scale, never
    data-scale); the final distinct count shuffles once on day. The
    sketch upgrade at 100 TB: per-day KMV k-min sets unioned across
    each window (operators/sketches.py kmv_union_returnflags is that
    merge) — swaps exactness for a 7x-smaller shuffle."""
    e = load_table(spark, sf_dir, "events")
    du = e.select(F.to_date("ts").alias("d"), "user_id").distinct()
    days = F.broadcast(du.select("d").distinct().withColumnRenamed("d", "day"))
    return (
        days.join(
            du,
            (F.col("d") >= F.date_sub(F.col("day"), 6)) & (F.col("d") <= F.col("day")),
        )
        .groupBy("day")
        .agg(
            F.count_distinct("user_id").cast("bigint").alias("n_users_7d"),
            F.count("*").cast("bigint").alias("n_user_days"),
        )
        # string day matches the engine-wide date-output convention
        # (DuckDB's pandas bridge widens DATE to datetime64)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_users_7d",
            "n_user_days",
        )
        .orderBy("day")
    )


@_register(
    "value_trend_by_type",
    """
    WITH pts AS (
      SELECT event_type,
             CAST(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
             CAST(value AS DECIMAL(18,6)) AS y
      FROM events WHERE value IS NOT NULL
    ),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT)   AS sx,
             SUM(y)                    AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             SUM(CAST(x AS DECIMAL(18,0)) * y) AS sxy
      FROM pts GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND(CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                      ELSE (n * CAST(sxy AS DOUBLE) - sx * CAST(sy AS DOUBLE))
                           / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) END, 6)
             AS slope_per_day,
           ROUND(CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                      ELSE (CAST(sy AS DOUBLE)
                            - ((n * CAST(sxy AS DOUBLE) - sx * CAST(sy AS DOUBLE))
                               / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)) * sx)
                           / n END, 6)
             AS intercept
    FROM m
    ORDER BY event_type
    """,
)
def value_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend (slope/intercept of value over epoch-day)
    from closed-form moment sums — regression as ONE map-side-combined
    aggregate, no per-group iteration. The moments accumulate as
    BIGINT/DECIMAL (exact, order-independent); only the final
    slope/intercept arithmetic runs in double, so both engines compute
    identical results and the 6-decimal round is safe.

    Scale shape: one shuffle with at most |event_type| groups; this is
    how distributed regression actually ships (sufficient statistics,
    not gradient loops) when the model is linear in the parameters."""
    e = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    pts = e.select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("bigint").alias("x"),
        F.col("value").cast("decimal(18,6)").alias("y"),
    )
    m = pts.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x").cast("decimal(18,0)") * F.col("y")).alias("sxy"),
    )
    n, sx = F.col("n"), F.col("sx")
    sy, sxx, sxy = (
        F.col("sy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("sxy").cast("double"),
    )
    # Degenerate group (single point, or all points on one day): the
    # denominator is exactly 0 in the integer moments and the slope is
    # undefined — NULL, not a DIVIDE_BY_ZERO task failure (the session
    # runs ANSI mode, where even double/0.0 throws). Mirrored CASE in
    # the oracle.
    denom_exact = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        denom_exact != 0,
        (n * sxy - sx * sy) / (n * sxx - sx.cast("double") * sx),
    )
    return m.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope_per_day"),
        F.round(F.when(denom_exact != 0, (sy - slope * sx) / n), 6).alias("intercept"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Gaps-and-islands WITHOUT a global sort. The textbook islands trick
# (key - ROW_NUMBER() OVER (ORDER BY key)) needs a total order — a
# single-partition window that dies at data scale. The distributed
# form: island boundaries are set arithmetic (k is an island start iff
# k-1 is absent — one self-anti-join on a shifted key), and only the
# BOUNDARY set (|deletions|-sized, orders of magnitude smaller than
# the key space) is ranked to pair starts with ends.
# ---------------------------------------------------------------------------

ISLAND_DELETE_MOD = 97  # same simulated deletions as snapshot_diff_cdc
ISLAND_TOPK = 10


def _range_row_number(df: DataFrame, key: str, out: str = "rn") -> DataFrame:
    """Global 1-based row_number over `key` WITHOUT a single-partition
    window: repartitionByRange on the key (so partition i holds keys
    strictly below partition i+1), stamp spark_partition_id, rank
    within each partition in parallel, and add per-partition count
    offsets. The only unpartitioned window runs over the per-partition
    count table — ≤ numShufflePartitions rows, cluster-constant, not
    data-sized — and the offsets broadcast back. localCheckpoint pins
    the range boundaries + pids so the count branch and the rank
    branch see identical partitioning."""
    part = (
        df.repartitionByRange(key)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = part.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    # Cumulative offsets via a triangular self-join over the count
    # table (≤ numShufflePartitions rows) — same result as a running
    # sum, but no unpartitioned WindowExec anywhere in the plan.
    lower = counts.select(F.col("_pid").alias("_lp"), F.col("_cnt").alias("_lc"))
    offsets = (
        counts.join(F.broadcast(lower), F.col("_lp") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.coalesce(F.sum("_lc"), F.lit(0)).alias("_offset"))
    )
    w_in = Window.partitionBy("_pid").orderBy(key)
    return (
        part.join(F.broadcast(offsets), "_pid")
        .withColumn(out, F.row_number().over(w_in) + F.col("_offset"))
        .drop("_pid", "_offset")
    )


@_register(
    "orderkey_islands",
    f"""
    WITH keys AS (
      SELECT o_orderkey AS k FROM orders WHERE o_orderkey % {ISLAND_DELETE_MOD} <> 0
    ),
    starts AS (
      SELECT k, ROW_NUMBER() OVER (ORDER BY k) AS rn FROM keys
      WHERE k - 1 NOT IN (SELECT k FROM keys)
    ),
    ends AS (
      SELECT k, ROW_NUMBER() OVER (ORDER BY k) AS rn FROM keys
      WHERE k + 1 NOT IN (SELECT k FROM keys)
    ),
    islands AS (
      SELECT s.k AS island_start, e.k AS island_end,
             CAST(e.k - s.k + 1 AS BIGINT) AS island_len
      FROM starts s JOIN ends e USING (rn)
    )
    SELECT island_start, island_end, island_len
    FROM islands
    ORDER BY island_len DESC, island_start
    LIMIT {ISLAND_TOPK}
    """,
)
def orderkey_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 longest contiguous runs of surviving order keys after
    simulated deletions (every {ISLAND_DELETE_MOD}th key) — the
    gaps-and-islands problem, distributed: boundaries via two
    left-anti self-joins on k±1 (keys shuffle once on their value, the
    join Spark plans for both probes), then starts and ends — equal
    cardinality by construction, one boundary pair per island — are
    rank-paired via `_range_row_number`, so the ranking itself is
    range-partitioned: the only unpartitioned window in the plan runs
    over the per-partition count table (≤ shuffle-partition-count
    rows). Boundary-set size = number of deletions — already far
    below the corpus — and its ranking now parallelizes too, so
    nothing in the plan is single-task at 100×.

    scd2_event_type solves the value-change variant of run collapse
    with per-entity windows; this is the key-contiguity variant where
    no partition key exists — which is exactly when the set-based
    boundary derivation matters."""
    keys = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % ISLAND_DELETE_MOD != 0)
        .select(F.col("o_orderkey").alias("k"))
    )
    prev = keys.select((F.col("k") + 1).alias("k"))
    nxt = keys.select((F.col("k") - 1).alias("k"))
    starts = _range_row_number(keys.join(prev, "k", "left_anti"), "k").withColumnRenamed(
        "k", "island_start"
    )
    ends = _range_row_number(keys.join(nxt, "k", "left_anti"), "k").withColumnRenamed(
        "k", "island_end"
    )
    return (
        starts.join(ends, "rn")
        .select(
            "island_start",
            "island_end",
            (F.col("island_end") - F.col("island_start") + 1)
            .cast("bigint")
            .alias("island_len"),
        )
        .orderBy(F.col("island_len").desc(), "island_start")
        .limit(ISLAND_TOPK)
    )


# ---------------------------------------------------------------------------
# Batch sessionization: the gap-rule session assembly (streaming's
# session_window, computed retrospectively over the full log).
# ---------------------------------------------------------------------------

SESSION_GAP_S = 1800  # 30 min idle closes a session


@_register(
    "session_stats_batch",
    f"""
    WITH o AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL {SESSION_GAP_S} SECOND
                       OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM o
    ),
    per_sess AS (
      SELECT user_id, sess_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS dur_s
      FROM s GROUP BY user_id, sess_id
    )
    SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           ROUND(AVG(n_events), 4) AS avg_events,
           ROUND(AVG(dur_s), 4)    AS avg_duration_s,
           CAST(MAX(n_events) AS BIGINT) AS max_events
    FROM per_sess
    GROUP BY user_id % 10
    ORDER BY user_bucket
    """,
)
def session_stats_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrospective sessionization by the 30-minute-idle rule: flag
    session starts with lag, number sessions with a running sum, roll
    up per-session event counts and wall-clock durations, then report
    per-user-bucket session statistics.

    Scale shape: both windows partition by user_id — ONE shuffle total
    (the second window and the per-session groupBy reuse the same
    hash partitioning); no cross-user state, so skew is bounded by the
    per-user event count (salt hot users if a device-farm key
    appears). This is the batch twin of streaming session_window
    (Q: window_session) — same gap rule, checked against the same
    kind of oracle, usable for backfills where the streaming job only
    sees new data. Tie-break on (ts, event_id) makes session numbering
    deterministic under same-timestamp events."""
    # Work in TIMESTAMP_NTZ throughout: the oracle's arithmetic is
    # naive, so a tz-aware session must not leak session-timezone/DST
    # offsets into gaps or durations (advice r4). Cast is a no-op when
    # parquet already reads as NTZ (the vanilla driver session).
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp_ntz").alias("ts")
    )
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond-exact gap via interval arithmetic: unix_timestamp()
    # floors to seconds, which would merge a 1800.5 s gap the oracle's
    # interval comparison splits (code-review r4 finding, reproduced) —
    # every testdata ts carries sub-second micros. Timestamp
    # subtraction works for both TIMESTAMP and TIMESTAMP_NTZ (the
    # vanilla driver session reads parquet as NTZ, where unix_micros
    # would not resolve).
    gap = F.col("ts") - F.lag("ts").over(w_ord)
    new_sess = F.when(
        gap.isNull() | (gap > F.expr(f"INTERVAL {SESSION_GAP_S} SECONDS")), 1
    ).otherwise(0)
    s = e.withColumn("new_sess", new_sess).withColumn(
        "sess_id",
        F.sum("new_sess").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_sess = s.groupBy("user_id", "sess_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        # DuckDB date_diff('second', …) counts second-boundary
        # crossings; truncating both endpoints to the second and
        # subtracting reproduces that exactly, timezone-free (the
        # interval is whole seconds, so the bigint cast is lossless) —
        # unlike unix_timestamp, which re-interprets NTZ in session tz.
        (F.date_trunc("second", F.max("ts")) - F.date_trunc("second", F.min("ts")))
        .cast("bigint")
        .alias("dur_s"),
    )
    return (
        per_sess.groupBy((F.col("user_id") % 10).cast("bigint").alias("user_bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_sessions"),
            F.round(F.avg("n_events"), 4).alias("avg_events"),
            F.round(F.avg("dur_s"), 4).alias("avg_duration_s"),
            F.max("n_events").cast("bigint").alias("max_events"),
        )
        .orderBy("user_bucket")
    )


# ---------------------------------------------------------------------------
# Keyless interval-overlap join via time-bucket banding: when no equi
# key exists, band both interval sets by coarse time buckets so the
# join is equi on the band, then apply the exact overlap predicate as
# a residual. The bands bound the join fan-out by interval density per
# bucket — the production alternative to a cartesian product.
# ---------------------------------------------------------------------------

OVERLAP_TOP_A = 50  # probe set: top urgent orders by value
OVERLAP_A_DAYS = 30  # urgent fulfillment window [start, start+30d)
OVERLAP_B_DAYS = 15  # high-priority window [start, start+15d)


@_register(
    "interval_overlap_join",
    f"""
    WITH a AS (
      SELECT o_orderkey AS a_key, o_totalprice AS a_price,
             o_orderdate AS a_start,
             o_orderdate + INTERVAL {OVERLAP_A_DAYS} DAY AS a_end
      FROM orders WHERE o_orderpriority = '1-URGENT'
      ORDER BY o_totalprice DESC, o_orderkey LIMIT {OVERLAP_TOP_A}
    ),
    b AS (
      SELECT o_orderkey AS b_key, o_orderdate AS b_start,
             o_orderdate + INTERVAL {OVERLAP_B_DAYS} DAY AS b_end
      FROM orders WHERE o_orderpriority = '2-HIGH'
    ),
    hits AS (
      SELECT a_key, COUNT(*) AS n
      FROM a JOIN b ON a_start < b_end AND b_start < a_end
      GROUP BY a_key
    )
    SELECT a.a_key AS a_orderkey,
           ROUND(a.a_price, 2) AS a_price,
           CAST(COALESCE(h.n, 0) AS BIGINT) AS n_overlaps
    FROM a LEFT JOIN hits h ON h.a_key = a.a_key
    ORDER BY a_orderkey
    """,
)
def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many high-priority order windows overlap each top-urgent
    order's fulfillment window — interval×interval overlap with NO
    shared key. Both sides explode their interval into the calendar
    months it touches (a superset band is fine — the exact predicate
    runs as a residual), join equi on the month, dedup pairs, then
    count. The month band bounds join fan-out by per-month interval
    density; the oracle joins on the raw predicate directly, so any
    band that under-covers (a lost pair) breaks the value hash.

    Scale shape: the probe side is top-k (driver-bounded, broadcast);
    the big side shuffles once on the band key. Compare
    range_join_ship_window (equi key + range residual) and the
    streaming interval join (equi user key) — this is the third
    variant, where banding MANUFACTURES the equi key."""
    o = load_table(spark, sf_dir, "orders")
    a = (
        o.where(F.col("o_orderpriority") == "1-URGENT")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(OVERLAP_TOP_A)
        .select(
            F.col("o_orderkey").alias("a_key"),
            F.col("o_totalprice").alias("a_price"),
            F.col("o_orderdate").alias("a_start"),
            (F.col("o_orderdate") + F.expr(f"INTERVAL {OVERLAP_A_DAYS} DAYS")).alias("a_end"),
        )
        .localCheckpoint(eager=True)  # referenced by the band join AND the final left join
    )
    b = o.where(F.col("o_orderpriority") == "2-HIGH").select(
        F.col("o_orderkey").alias("b_key"),
        F.col("o_orderdate").alias("b_start"),
        (F.col("o_orderdate") + F.expr(f"INTERVAL {OVERLAP_B_DAYS} DAYS")).alias("b_end"),
    )

    def banded(df: DataFrame, start: str, end: str) -> DataFrame:
        months = F.sequence(
            F.date_trunc("month", F.col(start)),
            F.date_trunc("month", F.col(end)),
            F.expr("INTERVAL 1 MONTH"),
        )
        return df.withColumn("band", F.explode(months))

    pairs = (
        # no hard hint on the A side: it is an orders-fraction frame
        # (auto-broadcast while small; the month-band equi-join hashes
        # fine when it isn't) — forcing broadcast of a fact subset
        # would OOM the driver at scale
        banded(a, "a_start", "a_end")
        .join(banded(b, "b_start", "b_end"), "band")
        .where((F.col("a_start") < F.col("b_end")) & (F.col("b_start") < F.col("a_end")))
        .select("a_key", "b_key")
        .distinct()
    )
    hits = pairs.groupBy("a_key").agg(F.count("*").cast("bigint").alias("n"))
    return (
        a.join(hits, "a_key", "left")
        .select(
            F.col("a_key").alias("a_orderkey"),
            F.round("a_price", 2).alias("a_price"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_overlaps"),
        )
        .orderBy("a_orderkey")
    )


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto frontier) without a global sort: equal-width
# value buckets give a cross-bucket dominance prefix (bucket-count
# rows, broadcast); within-bucket dominance uses a partitioned window
# over distinct values. The oracle is the NOT EXISTS definition.
# ---------------------------------------------------------------------------

SKY_BUCKETS = 32


@_register(
    "skyline_price_date",
    """
    SELECT o1.o_orderkey,
           ROUND(o1.o_totalprice, 2) AS price,
           strftime(o1.o_orderdate, '%Y-%m-%d') AS order_date
    FROM orders o1
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o2
      WHERE (o2.o_totalprice > o1.o_totalprice AND o2.o_orderdate >= o1.o_orderdate)
         OR (o2.o_totalprice >= o1.o_totalprice AND o2.o_orderdate > o1.o_orderdate)
    )
    ORDER BY o1.o_totalprice DESC, o1.o_orderkey
    """,
)
def skyline_price_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of orders maximizing (totalprice, orderdate):
    a row survives iff nothing strictly dominates it. The classic
    single-node algorithm sorts globally by price and keeps a running
    max of date — a one-task window at scale. Distributed form: (1)
    equal-width price buckets from a broadcast (min,max) — bucket id
    is monotone in price, so everything in a higher bucket has
    strictly higher price; (2) per-bucket max date → triangular
    self-join over the SKY_BUCKETS-row table gives each bucket the
    max date among all higher buckets (the cross-bucket dominance
    prefix, broadcast back); (3) within a bucket, a PARTITIONED
    window over distinct prices (rows preceding in price-desc order =
    strictly higher price) gives the in-bucket prefix. A row is
    dominated iff either prefix-max date ≥ its date, or an equal-price
    row has a strictly later date (the per-price group max). Same
    split as _range_row_number: the only non-partitioned work is over
    bucket-count rows, cluster-constant.

    Oracle is the textbook NOT EXISTS dominance test — any row the
    bucketed plan wrongly keeps or drops breaks the hash."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    bounds = o.agg(
        F.min("o_totalprice").alias("p_lo"), F.max("o_totalprice").alias("p_hi")
    )
    span = F.col("p_hi") - F.col("p_lo")
    raw = F.floor((F.col("o_totalprice") - F.col("p_lo")) * SKY_BUCKETS / span)
    ob = (
        o.join(F.broadcast(bounds))
        .withColumn(
            "bucket",
            F.when(span == 0, F.lit(1))
            .otherwise(F.least(raw + 1, F.lit(SKY_BUCKETS)))
            .cast("int"),
        )
        .drop("p_lo", "p_hi")
    )
    # Per distinct (bucket, price): latest date (covers the equal-price
    # dominance case) … Checkpointed: three consumers (the in-bucket
    # window, the cross-bucket max, the survivor filter) each re-derived
    # the orders scan + bucket aggregate otherwise (8 scans -> 3). The
    # frame is the aggregated (bucket, price) grain — never larger than
    # the input and materialized once instead of shuffled per consumer.
    pg = (
        ob.groupBy("bucket", "o_totalprice")
        .agg(F.max("o_orderdate").alias("e_max"))
        .localCheckpoint(eager=True)
    )
    # … and the in-bucket strictly-higher-price prefix (distinct prices,
    # so "rows preceding" == "strictly higher").
    w_in = (
        Window.partitionBy("bucket")
        .orderBy(F.col("o_totalprice").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pg = pg.withColumn("h_in", F.max("e_max").over(w_in))
    # Cross-bucket prefix: bucket-count rows, triangular self-join.
    bmax = pg.groupBy("bucket").agg(F.max("e_max").alias("bm"))
    upper = bmax.select(F.col("bucket").alias("u_bucket"), F.col("bm").alias("u_bm"))
    h_hi = (
        bmax.join(F.broadcast(upper), F.col("u_bucket") > F.col("bucket"), "left")
        .groupBy("bucket")
        .agg(F.max("u_bm").alias("h_hi"))
    )
    # Survivor groups resolve ENTIRELY at the (bucket, price) grain:
    # within a price group only date == e_max rows can survive (an
    # earlier date is dominated by the group max itself), and the
    # group survives iff no strictly-higher price reaches e_max. So
    # filter pg BEFORE joining back — the join-back side shrinks from
    # the full aggregate to the candidate skyline (AQE broadcasts it
    # when small; no hint, since adversarial data can make a skyline
    # corpus-sized).
    h = F.greatest("h_in", "h_hi")  # greatest skips NULLs
    survivors = (
        pg.join(F.broadcast(h_hi), "bucket", "left")
        .where(F.coalesce(h < F.col("e_max"), F.lit(True)))
        .select("bucket", "o_totalprice", "e_max")
    )
    return (
        ob.join(survivors, ["bucket", "o_totalprice"])
        .where(F.col("o_orderdate") == F.col("e_max"))
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .orderBy(F.col("price").desc(), "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Seasonal anomaly gate: a (day-of-week × hour) baseline instead of
# event_anomaly_zscore's global per-type stats — the monitor that
# doesn't page you every Monday morning because Mondays are busy.
# ---------------------------------------------------------------------------


@_register(
    "seasonal_hour_anomaly",
    """
    WITH base AS (
      SELECT value,
             ((CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 3) % 7) AS dow,
             ((CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 24) AS hod
      FROM events
    ),
    stats AS (
      SELECT dow, hod, AVG(value) AS mu, STDDEV_SAMP(value) AS sd
      FROM base GROUP BY dow, hod
    )
    SELECT b.dow, b.hod,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (s.sd IS NOT NULL AND s.sd > 0
                 AND abs((b.value - s.mu) / s.sd) > 3.0) AS BIGINT) AS n_anomalies
    FROM base b JOIN stats s ON s.dow = b.dow AND s.hod = b.hod
    GROUP BY b.dow, b.hod
    ORDER BY b.dow, b.hod
    """,
)
def seasonal_hour_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(day-of-week, hour-of-day) z-score anomaly counts: the
    seasonal-baseline upgrade of event_anomaly_zscore. Cell keys are
    EXACT integer epoch arithmetic (the repo's standing
    unix_timestamp/floor(epoch) identity; +3 aligns the epoch to
    Monday=0), so no calendar/timezone function can split a cell
    differently across engines.

    Scale shape: two passes over the narrow (value, cell) projection —
    a 168-key stats aggregate broadcast back over the scan (the
    event_anomaly_zscore no-window pattern), then the same 168-key
    count aggregate. No window, no fact-table shuffle beyond the
    bounded-key groupBys."""
    e = load_table(spark, sf_dir, "events")
    es = F.floor(F.unix_timestamp("ts")).cast("bigint")
    base = e.select(
        "value",
        (((es / F.lit(86400)).cast("bigint") + 3) % 7).alias("dow"),
        ((es / F.lit(3600)).cast("bigint") % 24).alias("hod"),
    )
    stats = base.groupBy("dow", "hod").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    is_anom = (
        F.col("sd").isNotNull()
        & (F.col("sd") > 0)
        & (F.abs((F.col("value") - F.col("mu")) / F.col("sd")) > 3.0)
    )
    return (
        base.join(F.broadcast(stats), ["dow", "hod"])
        .groupBy("dow", "hod")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.when(is_anom, 1).otherwise(0)).cast("bigint").alias("n_anomalies"),
        )
        .orderBy("dow", "hod")
    )


# ---------------------------------------------------------------------------
# applyInPandas grouped-map — the same OLS contract as
# value_trend_by_type, computed per group in pandas with EXACT moment
# arithmetic (int sums + decimal.Decimal), hash-matched to the same
# oracle: the pattern for shipping numpy/pandas science code into the
# engine WITHOUT giving up the value-checked contract.
# ---------------------------------------------------------------------------


def _trend_grouped_pandas(pdf):
    import decimal

    import pandas as pd

    xs = [int(v) for v in pdf["x"]]
    ys = [
        v if isinstance(v, decimal.Decimal) else decimal.Decimal(str(v))
        for v in pdf["y"]
    ]
    n = len(xs)
    sx = sum(xs)
    sxx = sum(v * v for v in xs)
    sy = sum(ys, decimal.Decimal(0))
    sxy = sum((decimal.Decimal(x) * y for x, y in zip(xs, ys)), decimal.Decimal(0))
    denom_exact = n * sxx - sx * sx
    if denom_exact == 0:
        slope = intercept = None
    else:
        # identical double expression order to value_trend_by_type /
        # its oracle: BIGINT·DOUBLE promotions on exact moments
        slope = (n * float(sxy) - sx * float(sy)) / (n * float(sxx) - float(sx) * sx)
        intercept = (float(sy) - slope * sx) / n
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n": [n],
            "slope_raw": [slope],
            "intercept_raw": [intercept],
        }
    )


@_register("value_trend_grouped_pandas", ORACLES["value_trend_by_type"])
def value_trend_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """value_trend_by_type re-expressed as an applyInPandas grouped map
    — two constructions of one contract (the bpe_train_merges pattern):
    the registered aggregate form is the 100 TB path (sufficient
    statistics, map-side combine); this is the escape hatch for science
    code that genuinely needs pandas per group, shown here computing
    the IDENTICAL answer. Exactness survives the Python boundary
    because Arrow delivers y as decimal.Decimal (sums stay exact, like
    the DECIMAL aggregates) and x as int64 (Python ints don't
    overflow); the closed-form double arithmetic replicates the SQL
    expression order; the 6-dp round happens ENGINE-side after the
    grouped map so both engines' half-up rounding applies.

    Scale caveat (why the aggregate form is primary): applyInPandas
    materializes each group in one task's memory — fine for bounded
    group counts with bounded rows, wrong for a group that doesn't fit;
    the moments aggregate never holds more than a combiner row."""
    e = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    pts = e.select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("bigint").alias("x"),
        F.col("value").cast("decimal(18,6)").alias("y"),
    )
    out = pts.groupBy("event_type").applyInPandas(
        _trend_grouped_pandas,
        "event_type string, n bigint, slope_raw double, intercept_raw double",
    )
    return out.select(
        "event_type",
        "n",
        F.round("slope_raw", 6).alias("slope_per_day"),
        F.round("intercept_raw", 6).alias("intercept"),
    ).orderBy("event_type")
