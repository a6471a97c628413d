"""Additional TPC-H-shaped relational plans over the lite star schema.

Round-3 widening of the §2.3/§2.4/§2.5 relational surface with the
classic decision-support plan shapes not yet covered by
``plans/relational.py`` (Q1/Q3/Q8/Q18 live there): correlated-EXISTS
semi joins (Q4), two-sided nation pairs (Q7), returned-item top-k
(Q10), conditional promo share (Q14), argmax-vs-global-scalar (Q15),
disjunctive predicate pushdown (Q19), the only-offender double
correlation (Q21) re-expressed as one aggregate, and anti-join +
global-scalar gating (Q22). Queries are adapted to the columns this
schema actually has (no partsupp / commitdate / shipmode), so each is
the *plan shape*, not the literal spec query.

Conventions match plans/relational.py: identical aliases in Spark and
DuckDB SQL, ROUND()ed double aggregates, explicit BIGINT casts.
Broadcast hints appear ONLY on bounded dimensions (nation, region,
1-row scalar frames); customer/supplier/part-derived sides carry no
hint so the size-based threshold broadcasts them at test SF and AQE
flips them to shuffle joins at 100 TB.
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
    "q4_order_priority",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped correlated EXISTS: orders of 1996 having at
    least one lineitem shipped >60 days after the order date (the lite
    schema's stand-in for commitdate < receiptdate), counted by
    priority.

    Scale shape: LEFT SEMI join on the order key with the date gap as
    a non-equi residual — one shuffle on l_orderkey/o_orderkey, no
    duplicate explosion (semi join emits each order at most once,
    exactly what EXISTS means). The year filter pushes into the orders
    scan; lineitem projects to 2 columns."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-01-01"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@_register(
    "q7_volume_shipping",
    """
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey  = c_custkey
    JOIN supplier  ON l_suppkey  = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, o_year
    ORDER BY supp_nation, cust_nation, o_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-shaped bilateral trade volume: revenue between a
    nation pair, both directions, by order year.

    Scale shape: the nation-pair predicate is applied to the
    2-int-column customer/supplier maps BEFORE the fact joins, so the
    fact stream only carries rows for the two nations (selectivity
    2/N^2 of pairs). lineitem x orders is the one big equi shuffle;
    customer/supplier hop on with no hard hint; the two nation hops
    ARE hinted (25 rows forever)."""
    n1 = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = F.col("n_name").isin("NATION_1", "NATION_2")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(n1.where(pair).withColumnRenamed("n_name", "supp_nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(n1.where(pair).withColumnRenamed("n_name", "cust_nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "cust_nation")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "o_year")
    )


@_register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped returned-item report: top 20 customers by
    revenue lost to returns ('R' flag) on one quarter's orders.

    Scale shape: both selective filters (returnflag, quarter) push
    into their parquet scans before the orderkey shuffle; the
    per-customer aggregate keys the second shuffle; nation is a hinted
    broadcast; TakeOrdered(20) instead of a global sort. Revenue sums
    in DECIMAL(18,2)-derived exact arithmetic (not double) so the
    result — and the top-20 cut — is identical regardless of
    partitioning/summation order, on any engine."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1996-04-01"))
        )
        .select("o_orderkey", "o_custkey")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@_register(
    "q14_promo_revenue",
    """
    SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS ship_month,
           ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY ship_month
    ORDER BY ship_month
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped promo share: percentage of 1996 revenue from
    PROMO-type parts, by ship month.

    Scale shape: numerator and denominator come out of ONE aggregation
    pass (conditional sum), not two scans + a join. The date filter
    prunes lineitem at the scan; part projects to (key, type) with no
    hard hint — part grows with scale, so the join keys a shuffle at
    100 TB and the monthly aggregate is a 12-group rollup after it."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_share_pct")
        )
        .orderBy("ship_month")
    )


@_register(
    "q15_top_supplier",
    """
    WITH srev AS (
      SELECT l_suppkey,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM srev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM srev)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped argmax against a global scalar: supplier(s)
    whose quarterly revenue equals the maximum quarterly revenue.

    Scale shape: the per-supplier aggregate is one shuffle; its global
    MAX is a 1-row frame crossJoin-broadcast back over the aggregate
    (no second scan of lineitem, no global sort); the supplier-name
    hop joins the handful of winners, so it carries no hint and AQE
    will broadcast the tiny winner side at any scale."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .select("l_suppkey", "l_extendedprice", "l_discount")
    )
    srev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    # The aggregate feeds both the winners filter and its own global
    # max; without materialization Spark re-plans the quarter-filtered
    # lineitem scan + aggregate for the max branch (plan audit: 2
    # lineitem scans). localCheckpoint pins the per-supplier frame —
    # orders of magnitude smaller than the fact slice — so the max
    # reads the materialized rows.
    srev = srev.localCheckpoint(eager=True)
    mx = srev.agg(F.max("total_revenue").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        srev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@_register(
    "q19_disjunctive_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped disjunctive predicate: revenue over three
    OR-ed brand/size/quantity bands.

    Scale shape: the disjunction splits into per-side conjuncts that
    each push down — part rows outside the three brands and lineitem
    rows outside qty 1..50∪10..35∪20..50 die at their scans (Catalyst
    derives `p_brand IN (...) AND p_size BETWEEN 1 AND 50` and
    `l_quantity BETWEEN 1 AND 50` as common prefilters from the OR);
    the cross-table residual evaluates after the partkey join. Single
    equi shuffle, 1-row output."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )


@_register(
    "q21_sole_failing_supplier",
    """
    WITH per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_fail,
             MIN(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS offender
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM per_order JOIN supplier ON offender = s_suppkey
    WHERE n_supp >= 2 AND n_fail = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q21_sole_failing_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-shaped 'only offender' double correlation: in
    finished multi-supplier orders, the supplier who is the ONLY one
    with returned ('R') lines — the lite-schema stand-in for Q21's
    late-delivery EXISTS/NOT-EXISTS pair — ranked by offense count.

    Scale shape: the spec query's two correlated self-joins of
    lineitem collapse into ONE per-order aggregate (distinct-supplier
    count, distinct-offender count, MIN offender — which is THE
    offender exactly when n_fail=1), so lineitem is scanned once and
    shuffled once on the order key. The supplier-name join sees only
    qualifying orders; the final per-supplier count is a second, tiny
    shuffle. No hard broadcast hints."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    fail_supp = F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct(fail_supp).alias("n_fail"),
            F.min(fail_supp).alias("offender"),
        )
        .where((F.col("n_supp") >= 2) & (F.col("n_fail") == 1))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.join(supp, per_order.offender == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@_register(
    "q22_idle_customers",
    """
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_custs,
           ROUND(SUM(c_acctbal), 2) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    CROSS JOIN avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped sales opportunity: customers with
    above-average (positive) balance who have never ordered, rolled up
    by nation.

    Scale shape: the global average is a 1-row frame crossJoin-
    broadcast over customer (second customer scan is the same cached
    parquet, filter c_acctbal>0 pushed down); never-ordered is a LEFT
    ANTI join on o_custkey — one shuffle, no row explosion, the
    distinct-ing of orders' keys happens inside the anti join; nation
    is a hinted broadcast."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("n_name")
    )


@_register(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped forecasting-revenue-change: scan-only
    conditional aggregate, zero joins — the pure predicate-pushdown /
    whole-stage-codegen benchmark shape.

    Scale shape: all three predicates push into the parquet scan
    (date + discount range + quantity reach PushedFilters, so row
    groups outside the year prune on statistics); the aggregate is a
    map-side partial to a 1-row result. Exact DECIMAL arithmetic so
    the sum is identical under any partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )


@_register(
    "q12_shipmode_priority",
    """
    SELECT l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY ship_class
    ORDER BY ship_class
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-shaped priority mix per shipping class (returnflag
    stands in for the lite schema's missing l_shipmode): high/low
    priority line counts in one conditional pass.

    Scale shape: the year filter pushes into the lineitem scan; one
    equi shuffle on the order key; both counters come out of a single
    aggregation (no per-priority scans)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .select("l_orderkey", "l_returnflag")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@_register(
    "q13_customer_distribution",
    """
    WITH per_cust AS (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped customer order-count distribution: LEFT OUTER
    join so zero-order customers land in the c_count=0 bucket, then a
    second aggregation over the counts (the double-aggregate histogram
    shape).

    Scale shape: outer join + first aggregate share the c_custkey
    shuffle key (one exchange serves both); the second aggregate's
    input is one row per customer and its output is bounded by the
    distinct count values — tiny. COUNT(o_orderkey) not COUNT(*) so
    the null row from the outer join counts as zero, mirrored exactly
    in the oracle."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@_register(
    "q17_small_quantity_revenue",
    """
    WITH brand_parts AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'
    ),
    li AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN brand_parts ON l_partkey = p_partkey
    ),
    avg_qty AS (
      SELECT l_partkey, AVG(l_quantity) AS aq FROM li GROUP BY l_partkey
    )
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2)
             AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM li JOIN avg_qty USING (l_partkey)
    WHERE l_quantity < 0.2 * aq
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped small-quantity order revenue: lines of one
    brand's parts whose quantity is below 20% of that part's average
    quantity — the correlated-scalar-subquery-per-group shape.

    Scale shape: the brand filter cuts part to ~1/25 and semi-reduces
    lineitem FIRST (join on partkey before any aggregation); the
    per-part average and the re-join both key on l_partkey, so the
    shuffle partitioning is computed once and reused; the correlated
    subquery becomes one aggregate + one same-key join instead of a
    per-row re-scan."""
    parts = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .drop("p_partkey")
    )
    avg_qty = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("aq"))
    return (
        li.join(avg_qty, "l_partkey")
        .where(F.col("l_quantity") < 0.2 * F.col("aq"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly"),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Round-4 widening: the five remaining classic shapes (Q2, Q9, Q11,
# Q16, Q20), each adapted to the lite schema (no partsupp — lineitem's
# observed (part, supplier) pairs stand in for it, with unit price
# MIN(l_extendedprice / l_quantity) as the supply-cost proxy and
# p_retailprice-derived unit cost for the profit rollup).
# ---------------------------------------------------------------------------


@_register(
    "q2_min_cost_supplier",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS cost
      FROM lineitem GROUP BY 1, 2
    ),
    cand AS (
      SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal,
             n.n_name, c.cost,
             ROW_NUMBER() OVER (PARTITION BY p.p_partkey
                                ORDER BY c.cost, s.s_suppkey) AS rn
      FROM cost c
      JOIN part p     ON c.l_partkey = p.p_partkey AND p.p_size = 11
      JOIN supplier s ON c.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           ROUND(cost, 4) AS min_cost
    FROM cand WHERE rn = 1
    ORDER BY s_acctbal DESC, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-shaped correlated min-cost supplier: for each size-11
    part, the cheapest EUROPE supplier by observed unit price, top-100
    by supplier balance. The spec's correlated scalar subquery
    (ps_supplycost = MIN over the region's partsupp) becomes ONE
    window rank over the region-filtered candidates — no re-scan.

    Scale shape: unit costs aggregate per (part, supplier) in one
    map-side-combined shuffle; part and region filters push into their
    scans before the joins; nation x region broadcast (bounded dims),
    supplier carries no hint (fact-scale at 100 TB). The window
    partitions by p_partkey — same key as the preceding join, so AQE
    reuses the partitioning. Ties on cost break by s_suppkey and the
    final cut orders on (acctbal, name, partkey): fully deterministic
    LIMIT."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    parts = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size") == 11)
        .select("p_partkey", "p_name")
    )
    dims = F.broadcast(
        load_table(spark, sf_dir, "nation").join(
            F.broadcast(
                load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(dims, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = cost.join(parts, F.col("l_partkey") == F.col("p_partkey")).join(
        sup, F.col("l_suppkey") == F.col("s_suppkey")
    )
    w = Window.partitionBy("p_partkey").orderBy(F.col("cost").asc(), F.col("s_suppkey").asc())
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("cost", 4).alias("min_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(100)
    )


@_register(
    "q9_product_profit",
    """
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               - p.p_retailprice * 0.5 * l.l_quantity
                               AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_name LIKE 'red %'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-shaped product-profit rollup: profit on red parts by
    supplier nation and order year. Unit supply cost is proxied as
    half the part's retail price (no partsupp in the lite schema).

    Scale shape: the selective p_name filter semi-reduces lineitem
    FIRST (smallest join early), then the two fact-fact joins shuffle
    on their natural keys (l_suppkey, then l_orderkey — orders is the
    big probe and comes last so the already-reduced stream is what
    shuffles); nation broadcasts, supplier/part/orders carry no hints.
    Per-row profit is computed in double (bit-identical cross-engine)
    and SUMMED AS DECIMAL so the aggregate is order-independent —
    the double-sum nondeterminism trap the oracle conventions call
    out."""
    parts = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("red %"))
        .select("p_partkey", "p_retailprice")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = F.broadcast(load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * 0.5 * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit).cast("double"), 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@_register(
    "q11_important_stock",
    """
    WITH nine AS (
      SELECT s_suppkey FROM supplier
      JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_9'
    ),
    per_part AS (
      SELECT l_partkey AS partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS v
      FROM lineitem JOIN nine ON l_suppkey = s_suppkey
      GROUP BY l_partkey
    ),
    total AS (SELECT SUM(v) AS tot FROM per_part)
    SELECT partkey, ROUND(CAST(v AS DOUBLE), 2) AS part_value
    FROM per_part CROSS JOIN total
    WHERE CAST(v AS DOUBLE) > CAST(tot AS DOUBLE) * 0.001
    ORDER BY part_value DESC, partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-shaped group-filter-by-global-scalar: per-part value
    supplied by NATION_9's suppliers, keeping parts above 0.1% of the
    nation's total — the HAVING-against-a-scalar-subquery shape.

    Scale shape: the nation filter reduces supplier before touching
    lineitem; per-part values aggregate in one map-side-combined
    shuffle; the global total is a 1-row frame broadcast into the
    filter (a scalar, never a shuffle). Values sum as DECIMAL so both
    the per-part figures and the threshold comparison are
    order-independent; the 1-row total carries an explicit broadcast
    (bounded by construction)."""
    nine = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_9")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    per_part = (
        li.join(nine, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(amount).alias("v"))
    )
    total = per_part.agg(F.sum("v").alias("tot"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("v").cast("double") > F.col("tot").cast("double") * 0.001)
        .select("partkey", F.round(F.col("v").cast("double"), 2).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "partkey")
    )


@_register(
    "q16_parts_supplier",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON ps.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (5, 11, 17, 23)
      AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-shaped supplier diversity count: distinct suppliers
    per (brand, type, size) for a size slice, excluding one brand, one
    type, and the complained-about suppliers (negative balance stands
    in for the spec's comment scan) — the NOT-IN-subquery shape,
    executed as a left-anti join.

    Scale shape: lineitem's observed (part, supplier) pairs dedup in
    one map-side-combined shuffle BEFORE any join (the partsupp
    stand-in); the brand/type/size predicates push into the part scan;
    the exclusion set is an anti join, not a per-row subquery. No
    fact-side hints."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    parts = (
        load_table(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(5, 11, 17, 23)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    excl = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(excl, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@_register(
    "q20_potential_promotion",
    """
    WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red %'),
    q AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
      FROM lineitem JOIN red ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    ),
    dom AS (
      SELECT DISTINCT l_suppkey FROM (
        SELECT l_suppkey, qty, SUM(qty) OVER (PARTITION BY l_partkey) AS tot
        FROM q
      ) WHERE qty > 0.5 * tot
    )
    SELECT s_name, n_name
    FROM supplier JOIN dom ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    ORDER BY s_name
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-shaped dominant-supplier selection: suppliers who
    shipped more than half of some red part's total 1996 volume (the
    spec's availqty > 0.5 * sum(l_quantity) correlated subquery,
    re-expressed as a window share over the same aggregate).

    Scale shape: date + part-name filters push into the scans and
    semi-reduce lineitem before the per-(part, supplier) aggregate;
    the correlated total is a window SUM over the aggregate's own
    partitioning key (no second scan, no re-shuffle — the window
    reuses the groupBy's hash partitioning); the supplier join is a
    semi-style inner on the deduped dominant set. Quantities are
    small integers, so the double sums and the 0.5x comparison are
    exact cross-engine."""
    red = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("red %"))
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    q = (
        li.join(red, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dom = (
        q.withColumn("tot", F.sum("qty").over(w))
        .where(F.col("qty") > 0.5 * F.col("tot"))
        .select("l_suppkey")
        .distinct()
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nat = F.broadcast(load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    return (
        sup.join(dom, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@_register(
    "q5_local_supplier_volume",
    """
    SELECT n.n_name AS nation,
           ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 proper (the flagship is the Q5-shaped variant without
    the local-supplier restriction): revenue from lineitems where the
    CUSTOMER and the SUPPLIER share a nation, per ASIA nation, one
    year. The c_nationkey = s_nationkey equi-condition is the defining
    feature — it rides on the supplier join as an extra key, not a
    post-filter, so the join output never carries non-local pairs.

    Scale shape: the date filter pushes into the orders scan and the
    region filter into the dim chain before any fact join; join order
    is customer->orders (key o_custkey), ->lineitem (o_orderkey),
    ->supplier (l_suppkey + nation equality); nation x region
    broadcast. Revenue sums as DECIMAL; DESC cut tie-broken by
    nation."""
    cutoff_lo, cutoff_hi = "1996-01-01", "1997-01-01"
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit(cutoff_lo))
            & (F.col("o_orderdate") < F.lit(cutoff_hi))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    dims = F.broadcast(
        load_table(spark, sf_dir, "nation").join(
            F.broadcast(
                load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(dims, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "nation")
    )
