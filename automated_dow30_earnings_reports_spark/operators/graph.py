"""Graph analytics over the star schema (beyond-reference §2.11 family).

Complements the label-propagation connected components in
operators/dedup.py with a weighted-PageRank shape: derive a nation-level
trade digraph from lineitem ⋈ orders ⋈ customer ⋈ supplier (edge
supplier-nation → customer-nation, weight = lineitem count), then run a
fixed number of damped power-iteration rounds.

Cross-engine parity: the iteration count is FIXED (3) and unrolled in
the DuckDB oracle as chained CTEs, so both engines compute the identical
arithmetic; outputs round to 6 decimals to absorb summation-order ulps.

Scale design: the expensive part is the EDGE DERIVATION — two fact-fact
joins that shuffle on order key — executed once. The iteration itself
runs on the aggregated graph (nodes × avg-degree rows, tiny compared to
the facts). At web scale (edges >> memory) each round is one
shuffle-join of the rank vector against the edge list keyed by source —
the canonical Spark PageRank; per-round localCheckpoint would cut
lineage exactly as dedup_clusters does. Here the fixed-small node set
(25 nations) makes every rank join a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.tables import load_table

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

DAMPING = 0.85
N_ITER = 3


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier-nation → customer-nation edge list with lineitem-count
    weights. customer/supplier project to 2 int columns with NO hard
    broadcast hint (they grow with the fact tables — size-based
    threshold broadcasts at test SF, shuffle join at 100 TB); the only
    guaranteed big shuffle is lineitem ⋈ orders on the order key."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(F.count("*").cast("double").alias("w"))
    )


_EDGES_SQL = """
    edges AS (
      SELECT s_nationkey AS src, c_nationkey AS dst, CAST(COUNT(*) AS DOUBLE) AS w
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      JOIN supplier ON l_suppkey  = s_suppkey
      GROUP BY src, dst
    ),
    outw AS (SELECT src, SUM(w) AS tot FROM edges GROUP BY src),
    norm AS (
      SELECT e.src, e.dst, e.w / o.tot AS p
      FROM edges e JOIN outw o USING (src)
    ),
    nodes AS (SELECT n_nationkey AS id FROM nation),
    n_cnt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)
"""


def _rank_round_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT nodes.id,
             (1 - {DAMPING}) / n_cnt.n
             + {DAMPING} * COALESCE(SUM(norm.p * {prev}.r), 0) AS r
      FROM nodes CROSS JOIN n_cnt
      LEFT JOIN norm ON norm.dst = nodes.id
      LEFT JOIN {prev} ON {prev}.id = norm.src
      GROUP BY nodes.id, n_cnt.n
    )"""


def _pagerank_oracle() -> str:
    rounds = ",".join(
        _rank_round_sql(f"r{i}", f"r{i + 1}") for i in range(N_ITER)
    )
    return f"""
    WITH {_EDGES_SQL},
    r0 AS (SELECT id, 1.0 / n_cnt.n AS r FROM nodes CROSS JOIN n_cnt),
    {rounds}
    SELECT id AS nation_key, ROUND(r, 6) AS pagerank
    FROM r{N_ITER}
    ORDER BY nation_key
    """


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@_register("pagerank_trade_graph", _pagerank_oracle())
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round damped PageRank over the nation trade graph. Iterations
    are plain DataFrame joins against the (tiny, broadcast) rank
    vector; arithmetic mirrors the unrolled-CTE oracle exactly."""
    edges = _edges(spark, sf_dir)
    outw = edges.groupBy("src").agg(F.sum("w").alias("tot"))
    # localCheckpoint, not persist: materializes the expensive edge
    # derivation exactly once for the iteration loop, and the blocks are
    # ContextCleaner-reclaimed when the RDD is GC'd — persist() entries
    # live in CacheManager keyed by plan and would accumulate across
    # repeated invocations in a long driver session (ADVICE r2).
    norm = (
        edges.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("tot")).alias("p"))
        .localCheckpoint(eager=True)
    )
    nodes = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("id")
    )
    n = nodes.count()

    rank = nodes.select("id", F.lit(1.0 / n).alias("r"))
    for _ in range(N_ITER):
        contrib = (
            norm.join(
                F.broadcast(rank.select(F.col("id").alias("src"), "r")), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("r")).alias("inflow"))
        )
        rank = (
            nodes.join(contrib, nodes.id == F.col("dst"), "left")
            .select(
                "id",
                (
                    F.lit((1 - DAMPING) / n)
                    + F.lit(DAMPING) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("r"),
            )
        )
    return rank.select(
        F.col("id").alias("nation_key"), F.round("r", 6).alias("pagerank")
    ).orderBy("nation_key")


# ---------------------------------------------------------------------------
# Triangle counting over the co-supply graph — the third classic graph
# primitive next to PageRank (above) and connected components
# (operators/dedup.py): build supplier–supplier edges weighted by how
# many parts both supply, keep the TRI_EDGES strongest (bounded,
# deterministic), count triangles by the ordered two-path + closing-
# edge join.
# ---------------------------------------------------------------------------

TRI_EDGES = 400

# Shared ps/sup/e derivation (Spark helper + SQL fragment below): ONE
# definition of the strongest-edge co-supply graph, used by both
# triangle_count_cosupply and supplier_hops_bfs so the "same bounded
# edge list" claim cannot drift.
_COSUPPLY_SQL = f"""ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    sup AS (
      SELECT a.l_suppkey AS sa, b.l_suppkey AS sb, COUNT(*) AS c
      FROM ps a JOIN ps b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2
    ),
    e AS (SELECT sa, sb FROM sup ORDER BY c DESC, sa, sb LIMIT {TRI_EDGES})"""


def _pair_explode(grouped_sets: DataFrame, set_col: str, a: str, b: str) -> DataFrame:
    """Ordered within-group pairs (a < b) from a frame of per-group
    SORTED DISTINCT arrays — the join-free replacement for the
    dedup self-join both co-supply and co-occurrence used (r10, guide
    §2.4): `distinct → self-join on the group key` costs an exchange
    for the dedup plus an exchange into the sort-merge join whose
    pair output re-shuffles into the pair aggregation; building the
    per-group set costs ONE exchange (collect_set partially
    aggregates map-side) and the k·(k-1)/2 pair fan-out happens
    inside the row — no join, and the only corpus-sized shuffle
    carries one array row per group (the dedup'd representation,
    smaller than the pair rows). The fan-out is bounded by the
    per-group set size exactly as the join was (the production cap is
    per-group top-d, identical in both shapes).

    Two measured gotchas (guide §1.1's "ideal plan is slower at
    first"), both fixed here:
    - nested higher-order lambdas building struct pairs run
      INTERPRETED per row; two chained generators (posexplode +
      explode of the tail slice) stay inside whole-stage codegen —
      4.3 s vs 7.2 s for the full co-supply derivation at sf0.1;
    - AQE coalesces the collect_set exchange by its BYTE size, but
      the downstream stage does k²/2 fan-out work per row, so the
      sets must be spread explicitly (repartition with an explicit
      scale-adaptive count — AQE respects user-specified counts)
      before the explosion: 2.5 s vs 4.3 s. The spread shuffles the
      smallest intermediate in the plan (the per-group arrays)."""
    n_part = int(
        grouped_sets.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    s = F.col(set_col)
    return (
        grouped_sets.repartition(n_part)
        .select(set_col, F.posexplode(set_col).alias("_i", a))
        .select(
            a,
            F.explode(F.slice(s, F.col("_i") + F.lit(2), F.size(s))).alias(b),
        )
    )


def _cosupply_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(sa, sb) strongest-TRI_EDGES co-supply edges, sa < sb, cut
    deterministically by (shared-part count DESC, sa, sb) —
    localCheckpointed because every caller references it repeatedly
    (triangle legs / BFS rounds).

    r10 shape: per-part sorted supplier sets + in-row pair expansion
    (_pair_explode) replace the (l_partkey, l_suppkey) distinct +
    self-join — 4 exchanges → 2, no sort-merge join, and the shuffle
    carries one array row per part instead of the dedup'd pair rows
    twice. collect_set dedups (partkey, suppkey) exactly as the old
    distinct did; sort_array makes the slice-generated pairs ascending
    so sa < sb and each unordered pair appears once per part — the
    edge multiset (and therefore the cut) is unchanged."""
    sets = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .groupBy("l_partkey")
        .agg(F.sort_array(F.collect_set("l_suppkey")).alias("ss"))
    )
    sup = (
        _pair_explode(sets, "ss", "sa", "sb")
        .groupBy("sa", "sb")
        .agg(F.count("*").alias("c"))
    )
    return (
        sup.orderBy(F.col("c").desc(), "sa", "sb")
        .limit(TRI_EDGES)
        .select("sa", "sb")
        .localCheckpoint(eager=True)
    )


def _triangle_oracle() -> str:
    return f"""
    WITH {_COSUPPLY_SQL}
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*)
                 FROM e e1
                 JOIN e e2 ON e1.sb = e2.sa
                 JOIN e e3 ON e3.sa = e1.sa AND e3.sb = e2.sb) AS BIGINT)
             AS n_triangles
    """


@_register("triangle_count_cosupply", _triangle_oracle())
def triangle_count_cosupply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the supplier co-supply graph. Edges orient
    low-key → high-key, so each triangle a<b<c is found exactly once
    as the two-path (a,b)+(b,c) closed by (a,c) — no division by 6,
    no duplicate wedges.

    Scale shape: the (part, supplier) dedup and the per-part pair
    explosion are the bounded-fan-out pattern shared with
    co_occurrence_part_pairs (per-part supplier count caps the
    quadratic term); the strongest-edge cut (orderBy+limit =
    TakeOrdered, k rows on the driver) bounds the triangle join input
    regardless of corpus size — the production form of the same knob
    is a per-node top-d adjacency cap, which also bounds the wedge
    join at d^2 per node. The closing joins run on k-row frames (AQE
    broadcasts them)."""
    # The edge list is referenced four times (two-path legs, closing
    # probe, edge count); _cosupply_edges localCheckpoints the
    # <= TRI_EDGES rows once so the (part, supplier) dedup + pair
    # aggregation don't replan per reference (plan audit showed 4x
    # re-derivation without it).
    e = _cosupply_edges(spark, sf_dir)
    tri = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.sb") == F.col("e2.sa"))
        .join(
            e.alias("e3"),
            (F.col("e3.sa") == F.col("e1.sa")) & (F.col("e3.sb") == F.col("e2.sb")),
        )
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    n_edges = e.agg(F.count("*").cast("bigint").alias("n_edges"))
    return n_edges.crossJoin(F.broadcast(tri)).select("n_edges", "n_triangles")


# ---------------------------------------------------------------------------
# BFS shortest hops — the fourth classic graph primitive here next to
# PageRank (above), connected components (operators/dedup.py) and
# triangle counting: hop distance from a deterministic source over the
# strongest-edge co-supply graph, as an iterative frontier expansion.
# ---------------------------------------------------------------------------

BFS_MAX_HOPS = 6


def _bfs_oracle() -> str:
    return f"""
    WITH RECURSIVE {_COSUPPLY_SQL},
    und AS (
      SELECT sa AS src, sb AS dst FROM e
      UNION ALL SELECT sb, sa FROM e
    ),
    s0 AS (SELECT MIN(sa) AS s FROM e),
    walk(node, d) AS (
      SELECT s, 0 FROM s0
      UNION
      SELECT u.dst, w.d + 1 FROM walk w JOIN und u ON u.src = w.node
      WHERE w.d < {BFS_MAX_HOPS}
    ),
    dist AS (SELECT node, MIN(d) AS dist FROM walk GROUP BY node)
    SELECT CAST(dist AS INTEGER) AS dist,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(MIN(node) AS BIGINT) AS min_supplier
    FROM dist GROUP BY dist ORDER BY dist
    """


@_register("supplier_hops_bfs", _bfs_oracle())
def supplier_hops_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-distance histogram from the lowest-keyed supplier in the
    strongest-edge co-supply graph (same bounded edge list as
    triangle_count_cosupply), BFS-expanded for at most BFS_MAX_HOPS
    rounds. Per round: frontier ⋈ edges, anti-join against settled
    nodes, localCheckpoint lineage cut — structurally the crawl_bfs /
    connected_components loop, here with an EXACT recursive-CTE oracle
    (UNION-dedup recursion caps the path blowup the same way the
    anti-join does in Spark).

    Scale shape: every frame is node-bounded (the edge cut keeps this
    demo small, but the loop shape is the production one — frontier
    joins shuffle on the node key, settled set grows monotonically,
    rounds = graph diameter). Early exit when a round adds nothing."""
    e = _cosupply_edges(spark, sf_dir)
    und = e.selectExpr("sa AS src", "sb AS dst").unionByName(
        e.selectExpr("sb AS src", "sa AS dst")
    )
    seed = (
        e.agg(F.min("sa").alias("node"))
        .withColumn("dist", F.lit(0))
        .localCheckpoint(eager=True)
    )
    # r10: the settled set is kept as a UNION of the per-round
    # checkpointed frontiers instead of being re-checkpointed every
    # round — each union leg is already a materialized leaf, so the
    # anti-join below reads cached blocks either way and the loop runs
    # 2 jobs per round (frontier checkpoint + emptiness probe) instead
    # of 3. Same frames, same anti-join semantics, one fewer barrier
    # per hop.
    frames = [seed]
    settled = seed
    frontier = seed
    for k in range(1, BFS_MAX_HOPS + 1):
        reached = (
            frontier.join(und, frontier.node == und.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .withColumn("dist", F.lit(k))
        )
        new = reached.join(settled, "node", "left_anti").localCheckpoint(eager=True)
        if new.isEmpty():
            break
        frames.append(new)
        settled = frames[0]
        for f in frames[1:]:
            settled = settled.unionByName(f)
        frontier = new
    return (
        settled.groupBy(F.col("dist").cast("int").alias("dist"))
        .agg(
            F.count("*").cast("bigint").alias("n_suppliers"),
            F.min("node").cast("bigint").alias("min_supplier"),
        )
        .orderBy("dist")
    )


# ---------------------------------------------------------------------------
# Local clustering coefficient — the per-node refinement of the global
# triangle count: how close each supplier's co-supply neighborhood is
# to a clique. Same bounded edge list as the triangle/BFS primitives.
# ---------------------------------------------------------------------------

CLUSTER_TOP = 20


def _clustering_oracle() -> str:
    return f"""
    WITH {_COSUPPLY_SQL},
    und AS (
      SELECT sa AS src, sb AS dst FROM e
      UNION ALL SELECT sb, sa FROM e
    ),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
            FROM und GROUP BY src),
    tri AS (
      SELECT e1.sa AS a, e1.sb AS b, e2.sb AS c
      FROM e e1
      JOIN e e2 ON e1.sb = e2.sa
      JOIN e e3 ON e3.sa = e1.sa AND e3.sb = e2.sb
    ),
    tri_nodes AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ),
    tcnt AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
             FROM tri_nodes GROUP BY node)
    SELECT d.node AS supplier, d.degree,
           CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_triangles,
           ROUND(CASE WHEN d.degree >= 2
                 THEN CAST(2 * COALESCE(t.n_tri, 0) AS DOUBLE)
                      / (d.degree * (d.degree - 1)) END, 6) AS coefficient
    FROM deg d LEFT JOIN tcnt t ON t.node = d.node
    ORDER BY d.degree DESC, d.node
    LIMIT {CLUSTER_TOP}
    """


@_register("clustering_coefficient", _clustering_oracle())
def clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient c_v = 2·T_v / (deg_v·(deg_v−1)) for
    the CLUSTER_TOP highest-degree suppliers in the strongest-edge
    co-supply graph. Each ordered triangle a<b<c (the same two-path +
    closing-edge join as triangle_count_cosupply) credits all three
    corners; degree comes from the undirected edge expansion.

    Determinism: T_v and deg_v are exact integers; the coefficient is
    one integer-ratio division (NULL below degree 2, mirrored CASE);
    the cut orders by (degree DESC, node).

    Scale shape: everything runs on the checkpointed ≤TRI_EDGES edge
    frame — the corpus-scale work (the per-part pair explosion) is
    identical to the attested triangle plan; at web scale the per-node
    top-d adjacency cap bounds both the wedge join and the degree
    table the same way."""
    e = _cosupply_edges(spark, sf_dir)
    und = e.select(F.col("sa").alias("src"), F.col("sb").alias("dst")).unionByName(
        e.select(F.col("sb").alias("src"), F.col("sa").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("bigint").alias("degree")
    )
    tri = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.sb") == F.col("e2.sa"))
        .join(
            e.alias("e3"),
            (F.col("e3.sa") == F.col("e1.sa")) & (F.col("e3.sb") == F.col("e2.sb")),
        )
        .select(
            F.col("e1.sa").alias("a"), F.col("e1.sb").alias("b"), F.col("e2.sb").alias("c")
        )
    )
    tri_nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    tcnt = tri_nodes.groupBy("node").agg(F.count("*").cast("bigint").alias("n_tri"))
    coeff = F.when(
        F.col("degree") >= 2,
        (2 * F.coalesce(F.col("n_tri"), F.lit(0))).cast("double")
        / (F.col("degree") * (F.col("degree") - 1)),
    )
    return (
        deg.join(tcnt, "node", "left")
        .select(
            F.col("node").alias("supplier"),
            "degree",
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("bigint").alias("n_triangles"),
            F.round(coeff, 6).alias("coefficient"),
        )
        .orderBy(F.desc("degree"), "supplier")
        .limit(CLUSTER_TOP)
    )
