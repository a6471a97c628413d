"""Relational operator queries over the star schema.

One query per operator family from SURVEY.md §2 (projections/filters
§2.2, joins §2.3, aggregations §2.4, sort/limit §2.5, set ops §2.6,
windows §2.8), each paired with a DuckDB oracle. Reference citations in
each docstring tie the query to the behavior it re-expresses.

Conventions (driver hash-compare contract):
  - every computed column is aliased identically in Spark and SQL;
  - double aggregates are ROUND()ed to fixed decimals so the two
    engines' summation orders cannot flip the hash;
  - integer-typed outputs are cast explicitly on both sides (DuckDB
    SUM(BIGINT) yields HUGEINT, Spark yields BIGINT — always CAST).
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


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------


@_register(
    "pricing_summary",
    """
    SELECT l_returnflag,
           l_linestatus,
           ROUND(SUM(l_quantity), 2)                          AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                     AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
           ROUND(AVG(l_quantity), 4)                          AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                     AS avg_price,
           ROUND(AVG(l_discount), 4)                          AS avg_disc,
           COUNT(*)                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped multi-aggregate scan (A6/A9/A10-class sums+counts).

    Map-side partial aggregation on 6 (flag,status) groups means the
    shuffle moves ~6 rows per input partition regardless of SF.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@_register(
    "histogram_event_type",
    """
    SELECT event_type, COUNT(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def histogram_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 histogram: count per document_type (ref enhanced_selenium_scraper.py:901-909),
    re-expressed over events.event_type."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count("*").alias("n")).orderBy("event_type")


@_register(
    "distinct_users",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 distinct count: pages-visited set cardinality
    (ref enhanced_selenium_scraper.py:129,:726). Exact countDistinct;
    at 100 TB swap to approx_count_distinct (separate query below)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


@_register(
    "conditional_counts",
    """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
           CAST(SUM(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_success
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 success-vs-failed conditional counts (ref orchestrator.py:181-210,
    download_reports.py:643-655): sum(when(cond,1))."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("n_failed"),
            F.sum(F.when(F.col("event_type") != "error", 1).otherwise(0))
            .cast("bigint")
            .alias("n_success"),
        )
        .orderBy("user_id")
    )


@_register(
    "success_rate",
    """
    SELECT event_type,
           ROUND(100.0 * AVG(CASE WHEN value > 5.0 THEN 1.0 ELSE 0.0 END), 4) AS pct_high
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def success_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 success-rate %: 100*success/total (ref find_IR_pgs_v1.py:693-696)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(
                100.0 * F.avg(F.when(F.col("value") > 5.0, 1.0).otherwise(0.0)), 4
            ).alias("pct_high")
        )
        .orderBy("event_type")
    )


@_register(
    "sum_bytes",
    """
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice), 2) AS total_price,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def sum_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 byte-sum accumulation (ref download_reports.py:537-546,:576-582)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("total_qty"),
        )
        .orderBy("l_returnflag")
    )


@_register(
    "latest_year_quarter",
    """
    SELECT o_custkey,
           CAST(MAX(EXTRACT(year FROM o_orderdate) * 10
                    + EXTRACT(quarter FROM o_orderdate)) // 10 AS INT) AS latest_year,
           CAST(MAX(EXTRACT(year FROM o_orderdate) * 10
                    + EXTRACT(quarter FROM o_orderdate)) % 10 AS INT) AS latest_quarter
    FROM orders
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
)
def latest_year_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 latest-(year,quarter) argmax (ref enhanced_selenium_scraper.py:400-425):
    max year, then max quarter within that year — i.e. max of the
    lexicographic (year, quarter) struct, computed per customer."""
    o = load_table(spark, sf_dir, "orders")
    latest = F.max(
        F.struct(
            F.year("o_orderdate").alias("y"),
            F.quarter("o_orderdate").alias("q"),
        )
    )
    return (
        o.groupBy("o_custkey")
        .agg(latest.alias("latest"))
        .select(
            "o_custkey",
            F.col("latest.y").cast("int").alias("latest_year"),
            F.col("latest.q").cast("int").alias("latest_quarter"),
        )
        .orderBy("o_custkey")
    )


@_register(
    "collect_list_rollup",
    """
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           STRING_AGG(c_name, ',' ORDER BY c_name) AS customer_names
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def collect_list_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 collect-list nested rollup (ref simple_metadata_collector.py:90-108):
    per-group list of members, emitted as a sorted joined string so the
    hash comparison is order-insensitive.

    Scale note: the per-group list grows with group membership — that
    is the REFERENCE's own semantics (its collector emits the full
    member list per group), so the unbounded row is inherent to the
    operator, not an implementation choice; a production variant caps
    with slice(sort_array(...), 1, K) at the same plan shape."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.array_join(F.sort_array(F.collect_list("c_name")), ",").alias("customer_names"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Filters / projections (SURVEY §2.2)
# ---------------------------------------------------------------------------


@_register(
    "filter_project",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, ROUND(o_totalprice, 2) AS total
    FROM orders
    WHERE o_orderstatus = 'O'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_totalprice > 1000.0
    ORDER BY o_orderkey
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P8-class predicate + projection; all three predicates push into
    the parquet scan (verify with .explain → PushedFilters)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.where(
            (F.col("o_orderstatus") == "O")
            & (F.col("o_orderdate") >= F.lit("1997-01-01"))
            & (F.col("o_totalprice") > 1000.0)
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("total"),
        )
        .orderBy("o_orderkey")
    )


@_register(
    "isin_filter",
    """
    SELECT n_name, n_regionkey FROM nation
    WHERE n_name IN ('CHINA', 'FRANCE', 'PERU', 'KENYA')
    ORDER BY n_name
    """,
)
def isin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 allowlist filter (ref orchestrator.py:271-273 COMPANIES list)."""
    n = load_table(spark, sf_dir, "nation")
    return (
        n.where(F.col("n_name").isin("CHINA", "FRANCE", "PERU", "KENYA"))
        .select("n_name", "n_regionkey")
        .orderBy("n_name")
    )


@_register(
    "null_keeping_filter",
    """
    SELECT doc_id, lang, n_chars FROM documents
    WHERE lang IS NULL OR lang <> 'zh' OR n_chars >= 300
    ORDER BY doc_id
    """,
)
def null_keeping_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 null-keeping min-year semantics (ref enhanced_selenium_scraper.py:768-777):
    drop rows failing a threshold but KEEP rows where the key is null."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.where(F.col("lang").isNull() | (F.col("lang") != "zh") | (F.col("n_chars") >= 300))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------


@_register(
    "enrichment_left_join",
    """
    SELECT o_orderkey,
           o_custkey,
           COALESCE(c_name, '') AS cust_name,
           COALESCE(c_mktsegment, '') AS segment
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'F'
    ORDER BY o_orderkey
    """,
)
def enrichment_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J5 enrichment left join with empty-string default
    (ref orchestrator.py:109-125 build, :145-156 probe,
    url_to_metadata.get(url, {}) at :147). The build side is the
    customer dimension, as the reference's dict build was — but
    customer grows with the fact tables at TPC-H scale, so no hard
    broadcast hint: the size-based threshold broadcasts it at test SF
    and AQE flips to a shuffle-hash join (skew-split) at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.where(F.col("o_orderstatus") == "F")
        .join(
            c.select("c_custkey", "c_name", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.coalesce("c_name", F.lit("")).alias("cust_name"),
            F.coalesce("c_mktsegment", F.lit("")).alias("segment"),
        )
        .orderBy("o_orderkey")
    )


@_register(
    "broadcast_dim_join",
    """
    SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 literal-map join (ref get30DowTickers.py:145-186 ticker→url dict):
    a broadcast join against a tiny dim table."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.count("*").alias("n_nations"))
        .orderBy("r_name")
    )


@_register(
    "semi_join",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 50000)
    ORDER BY c_custkey
    """,
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 left-semi allowlist (ref orchestrator.py:271-272)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 50000).select("o_custkey")
    return (
        c.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@_register(
    "anti_join",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    ORDER BY c_custkey
    """,
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 visited-set subtraction (ref enhanced_selenium_scraper.py:722,
    :555-571): frontier minus visited as a left-anti join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o.select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (SURVEY §2.5, §2.8 windows)
# ---------------------------------------------------------------------------


@_register(
    "topk_global",
    """
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 top-k by score (ref enhanced_selenium_scraper.py:690-696,
    max_promising_links=5). orderBy+limit compiles to
    TakeOrderedAndProject — no global sort materialization."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
        .limit(10)
    )


@_register(
    "topk_per_group",
    """
    SELECT o_orderstatus, o_orderkey, ROUND(o_totalprice, 2) AS total, CAST(rn AS INT) AS rn
    FROM (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    ORDER BY o_orderstatus, rn
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 per-group top-k via window (SURVEY §2.8): the idiomatic
    per-company replacement for the reference's global sort+slice."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "o_orderstatus",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total"),
            F.col("rn").cast("int").alias("rn"),
        )
        .orderBy("o_orderstatus", "rn")
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.6)
# ---------------------------------------------------------------------------


@_register(
    "union_accumulate",
    """
    SELECT DISTINCT o_custkey FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT o_custkey FROM orders WHERE o_totalprice > 50000
    ) ORDER BY o_custkey
    """,
)
def union_accumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 accumulate-and-dedup (ref enhanced_selenium_scraper.py:698-708):
    unionByName + dropDuplicates on the identity key."""
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.where(F.col("o_totalprice") > 50000).select("o_custkey")
    return a.unionByName(b).dropDuplicates(["o_custkey"]).orderBy("o_custkey")


@_register(
    "except_subtract",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY o_custkey
    """,
)
def except_subtract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 frontier-minus-visited (ref enhanced_selenium_scraper.py:720-726)."""
    o = load_table(spark, sf_dir, "orders")
    pending = o.where(F.col("o_orderstatus") == "P").select("o_custkey")
    finished = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return pending.subtract(finished).orderBy("o_custkey")  # subtract == EXCEPT DISTINCT


# ---------------------------------------------------------------------------
# Multi-join analytics (SURVEY §2.3 + §2.4 composition)
# ---------------------------------------------------------------------------


@_register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d')                 AS order_date,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-03-15'
      AND l_shipdate  > TIMESTAMP '1999-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped 3-table join + agg + top-k (J1/A9/T2 composition).

    Scale shape: both selective filters run BEFORE their joins so the
    scans push `c_mktsegment`/date predicates into parquet. Only the
    segment-filtered 1-column customer side carries a broadcast hint;
    orders is fact-scale (the date filter keeps most of it), so
    lineitem x orders joins on l_orderkey WITHOUT a hint — broadcast
    at test SF via the size-based threshold, shuffle-hash at 100 TB
    with AQE skew splitting. The groupBy on l_orderkey then reuses
    that same key's partitioning. TakeOrdered replaces a global sort
    for the LIMIT 10.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < F.lit("1999-03-15"))
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > F.lit("1999-03-15"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(
            # no hard hint: the BUILDING segment is a fifth of CUSTOMER
            # — comfortably auto-broadcast at bench scale, but at 100 TB
            # it must be allowed to fall back to a hash join; forcing
            # broadcast on a customer-fraction frame is a driver OOM
            orders.join(cust, orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@_register(
    "market_share_by_year",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           ROUND(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN vol ELSE 0 END)
                 / SUM(vol), 4)           AS mkt_share
    FROM (
      SELECT o_orderdate,
             l_extendedprice * (1 - l_discount) AS vol,
             l_suppkey, o_custkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ) j
    JOIN customer ON o_custkey   = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey   = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'AMERICA'
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-shaped market share: 6-table snowflake join, conditional
    share aggregate per order year.

    Scale shape: the one genuinely large-x-large join (lineitem x
    orders) shuffles on the order key; every dimension hop after it is
    a broadcast (region/nation always; customer/supplier projected to
    2 int columns each carry NO hard hint, so the size-based threshold
    broadcasts them at test SF and at 100 TB they flip to shuffle
    joins automatically). The CASE share trick computes
    numerator and denominator in ONE aggregation pass instead of two
    scans + a join.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("supp_nation")
    )
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")

    amer_cust = (
        cust.join(F.broadcast(n1), cust.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(region), n1.n_regionkey == region.r_regionkey)
        .select("c_custkey")
    )
    vol = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(amer_cust, orders.o_custkey == amer_cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == n2.n2_nationkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("vol"),
            "supp_nation",
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol")).otherwise(0.0))
                / F.sum("vol"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@_register(
    "q18_large_orders",
    """
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 300
    )
    SELECT c_name,
           o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d')      AS order_date,
           ROUND(o_totalprice, 2)                 AS total_price,
           CAST(SUM(l_quantity) AS BIGINT)        AS total_qty
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN big      USING (l_orderkey)
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped large-volume-order report: a grouped-HAVING
    derived key set semi-joined back against the same fact table, then
    re-aggregated with customer context.

    Scale shape: the HAVING subquery is ONE map-side-partial agg over
    lineitem projected to 2 columns — its output (order keys over the
    quantity threshold) is tiny, so it broadcasts into a LEFT SEMI join
    that prunes lineitem BEFORE the wide join with orders/customer;
    the fact table is never shuffled at full width. A correlated
    rewrite (windowed sum over every row) would shuffle the whole
    table — the derived-key-set + semi-join form is the 100 TB answer.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 300)
        .select("l_orderkey")
        # tiny key set consumed by BOTH semi joins — without the
        # checkpoint each broadcast re-runs the HAVING aggregate's
        # full lineitem scan
        .localCheckpoint(eager=True)
    )
    # broadcast the tiny key set into BOTH fact tables — after the semi
    # joins everything downstream is |big|-bounded, so no full-width fact
    # shuffle ever happens
    li_pruned = li.join(F.broadcast(big), "l_orderkey", "left_semi")
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .join(
            F.broadcast(big.select(F.col("l_orderkey").alias("o_orderkey"))),
            "o_orderkey",
            "left_semi",
        )
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    per_order = (
        li_pruned.join(F.broadcast(orders), li_pruned.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
    )
    # per_order is |big| rows — broadcast it against the (at-scale large)
    # customer dim so customers never shuffle either
    return (
        cust.join(F.broadcast(per_order), cust.c_custkey == per_order.o_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round("o_totalprice", 2).alias("total_price"),
            "total_qty",
        )
        .orderBy(F.desc("total_price"), "o_orderkey")
        .limit(20)
    )
