"""Skew-mitigation operators: salting for hot keys (SURVEY §4).

The reference's skew is real — links per company range 1-409 (median
82, `urls_found` in metadata/*.json) — and at 100 TB a hot groupBy or
join key stalls a stage on one straggler task. Two standard remedies,
each oracle-checked to produce *identical results* to the naive plan:

  - two-phase (salted) aggregation: groupBy(key, salt) partials, then
    groupBy(key) merge. Decomposable aggs only (count/sum/min/max —
    avg carried as sum+count).
  - salted replicated join: the small side is exploded ×S, the big
    side picks a deterministic salt in [0,S); the join key becomes
    (key, salt) so one hot key spreads over S tasks. This is what you
    do when the small side is too big to broadcast and AQE's skew
    split isn't available (e.g. bucketed/pre-shuffled inputs).

AQE's skewJoin handles moderate skew automatically (on in session.py);
explicit salting is the belt-and-braces for degenerate keys.
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


SALT_BUCKETS = 16


def salted_agg(
    df: DataFrame, key: str, salt_src: str, buckets: int = SALT_BUCKETS
) -> DataFrame:
    """Two-phase count/sum over a skewed key. ``salt_src`` is any
    roughly-uniform column (an id) — hash it, not rand(), so retries
    are deterministic."""
    salt = F.pmod(F.hash(F.col(salt_src)), F.lit(buckets)).alias("salt")
    partial = (
        df.select(F.col(key), salt, F.col("value"))
        .groupBy(key, "salt")
        .agg(F.count("*").alias("pc"), F.sum("value").alias("ps"))
    )
    return partial.groupBy(key).agg(
        F.sum("pc").cast("bigint").alias("n"),
        F.round(F.sum("ps"), 2).alias("sum_value"),
    )


def salted_join(
    big: DataFrame, small: DataFrame, key: str, salt_src: str, buckets: int = SALT_BUCKETS
) -> DataFrame:
    """Replicate the small side ×buckets; the big side joins on
    (key, salt). Result rows identical to the plain equi-join."""
    replicated = small.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    salted_big = big.withColumn("salt", F.pmod(F.hash(F.col(salt_src)), F.lit(buckets)))
    return salted_big.join(replicated, [key, "salt"]).drop("salt")


@_register(
    "salted_skew_agg",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2)     AS sum_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.event_type is low-cardinality (every key is hot): the
    salted two-phase agg must equal the naive GROUP BY."""
    e = load_table(spark, sf_dir, "events")
    return salted_agg(e, "event_type", "event_id").orderBy("event_type")


@_register(
    "salted_replicated_join",
    """
    WITH dim AS (
      SELECT DISTINCT event_type, upper(event_type) AS label FROM events
    )
    SELECT d.label,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(e.value), 2)   AS sum_value
    FROM events e JOIN dim d USING (event_type)
    GROUP BY d.label ORDER BY d.label
    """,
)
def salted_replicated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join without broadcast: the dim is replicated ×16 and
    the fact side salts on event_id, spreading each event_type over 16
    tasks. Same rows as the plain join."""
    e = load_table(spark, sf_dir, "events")
    dim = e.select("event_type").distinct().withColumn(
        "label", F.upper("event_type")
    )
    joined = salted_join(e, dim, "event_type", "event_id")
    return (
        joined.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("label")
    )
