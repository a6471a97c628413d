"""As-of (temporal point-in-time) join.

The reference has no temporal joins, but its latest-file lookup
(`src/orchestrator.py:193-196`, max-by-mtime) is the degenerate form:
"most recent right-side row not after the left-side row". The general
operator is a staple of event analytics, so the engine provides it as a
first-class composition.

Spark has no ASOF JOIN builtin. The scalable formulation is the
union + ordered-window trick: tag both sides, union them, and for every
left row take the last right-side payload seen so far within the key
partition — ``last(..., ignorenulls=True)`` over
``partitionBy(key).orderBy(ts, side)``. That is ONE shuffle on the join
key (same cost as the equi-join Spark would do anyway) and never builds
the quadratic (left x right) candidate set a naive range join creates.
DuckDB's native ``ASOF LEFT JOIN`` is the oracle.

Tie semantics: a right row at exactly the left row's timestamp matches
(``>=``, like DuckDB ASOF); the side tag orders right rows before left
rows at equal timestamps to implement that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    payload: list[str],
) -> DataFrame:
    """Enrich ``left`` with the most recent ``right`` row whose ``ts``
    is <= the left row's ``ts``, per ``on`` key.

    ``payload`` columns from ``right`` come back as ``asof_<name>``
    (null when no right row precedes). All left columns pass through.
    """
    lcols = left.columns
    tagged_l = left.select(*lcols, F.lit(1).alias("_side")).withColumns(
        {f"asof_{p}": F.lit(None).cast(right.schema[p].dataType) for p in payload}
    )
    # NULL-ts right rows can never match (DuckDB ASOF's p.ts >= c.ts is
    # NULL for them, while Spark's ascending sort is NULLS FIRST — left
    # unfiltered they would sort before every left row and be attributed
    # as a "prior" row that temporally never existed), and neither can
    # NULL-KEY right rows (the ON equality is NULL, but partitionBy
    # groups NULL keys into one live partition); left rows with a NULL
    # key keep their row with a NULL payload on both engines.
    tagged_r = right.where(
        F.col(ts).isNotNull() & F.col(on).isNotNull()
    ).select(
        on,
        ts,
        F.lit(0).alias("_side"),
        *[F.col(p).alias(f"asof_{p}") for p in payload],
    )
    # unionByName with missing left columns nulled on the right side
    unioned = tagged_l.unionByName(tagged_r, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # ONE last() over a struct of the payloads, not one per column:
    # the struct is non-NULL for every right row even when a payload
    # FIELD is NULL, so a matched row's NULL value comes through as
    # NULL (per-column ignorenulls skipped it and resurrected an older
    # row's value — not ASOF semantics). Also one window eval instead
    # of len(payload).
    marker = F.when(
        F.col("_side") == 0,
        F.struct(*[F.col(f"asof_{p}").alias(p) for p in payload]),
    )
    filled = unioned.withColumn(
        "_asof_row", F.last(marker, ignorenulls=True).over(w)
    ).withColumns({f"asof_{p}": F.col(f"_asof_row.{p}") for p in payload})
    return filled.where(F.col("_side") == 1).drop("_side", "_asof_row")


def _floor_epoch(c: Column) -> Column:
    # whole seconds; matches DuckDB floor(epoch(ts)) (see user_event_deltas)
    return F.unix_timestamp(c)


@_register(
    "asof_join_prior_click",
    """
    WITH e AS (SELECT * FROM events),
    p AS (SELECT event_id, user_id, ts, value FROM e WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts FROM e WHERE event_type = 'click')
    SELECT p.event_id,
           p.user_id,
           ROUND(p.value, 4) AS purchase_value,
           CAST(CASE WHEN c.ts IS NULL THEN NULL
                ELSE floor(epoch(p.ts)) - floor(epoch(c.ts)) END AS BIGINT)
             AS since_click_s
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
)
def asof_join_prior_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution query: each purchase matched to the user's most
    recent click at-or-before it (time-to-convert). One shuffle on
    user_id via the union+window as-of formulation."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.where(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(purchases, clicks, on="user_id", ts="ts", payload=["ts"])
    return joined.select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("purchase_value"),
        (_floor_epoch(F.col("ts")) - _floor_epoch(F.col("asof_ts")))
        .cast("bigint")
        .alias("since_click_s"),
    ).orderBy("event_id")


ASOF_TOLERANCE_S = 3600


@_register(
    "asof_join_tolerance",
    f"""
    WITH e AS (SELECT * FROM events),
    p AS (SELECT event_id, user_id, ts, value FROM e WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts FROM e WHERE event_type = 'click')
    SELECT p.event_id,
           p.user_id,
           ROUND(p.value, 4) AS purchase_value,
           CAST(CASE WHEN c.ts IS NULL THEN NULL
                WHEN floor(epoch(p.ts)) - floor(epoch(c.ts)) > {ASOF_TOLERANCE_S}
                  THEN NULL
                ELSE floor(epoch(p.ts)) - floor(epoch(c.ts)) END AS BIGINT)
             AS since_click_s
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match window: a prior click only attributes a
    purchase if it happened within the last hour — older matches
    become null, exactly like pandas merge_asof(tolerance=...). Same
    single-shuffle union+window plan as the unbounded variant; the
    tolerance is a post-window predicate, not a second join."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.where(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(purchases, clicks, on="user_id", ts="ts", payload=["ts"])
    gap = (_floor_epoch(F.col("ts")) - _floor_epoch(F.col("asof_ts"))).cast("bigint")
    return joined.select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("purchase_value"),
        F.when(gap <= ASOF_TOLERANCE_S, gap).alias("since_click_s"),
    ).orderBy("event_id")
