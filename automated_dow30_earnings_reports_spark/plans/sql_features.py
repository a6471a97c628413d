"""Modern Spark SQL surface (Spark 4.x): recursive CTEs, the VARIANT
semi-structured type, and SQL scalar UDFs — each exercised as a
driver-checked query so the engine's DECLARATIVE versions of things the
repo already does imperatively are value-checked too.

- `recursive_cte_reachability` is the declarative twin of
  supplier_hops_bfs's driver loop (two constructions of one contract,
  the bpe_train_merges pattern): Spark 4 recursion is UNION ALL-only,
  which is safe here because the ascending-key co-supply edge list is a
  DAG (sa < sb — no cycles) and is BOUNDED at TRI_EDGES rows by
  construction, so walk multiplicity cannot blow up with data scale.
- `variant_props_stats` reads the events.props JSON through
  parse_json/variant_get — the Spark-4-native semi-structured path
  (the from_json-with-schema path is json_scalar).
- `sql_udf_len_band` declares the banding logic as CREATE OR REPLACE
  TEMPORARY FUNCTION (idempotent re-registration, same-session re-run
  safe) and calls it from a DataFrame expression.
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


# ---------------------------------------------------------------------------
# Recursive CTE — directed reachability over the bounded co-supply DAG.
# ---------------------------------------------------------------------------

RCTE_MAX_HOPS = 4
from automated_dow30_earnings_reports_spark.operators.graph import (  # noqa: E402
    _COSUPPLY_SQL,
    TRI_EDGES as _RCTE_EDGES,
)


def _rcte_sql(edges_cte: str) -> str:
    """The recursion text shared by BOTH engines; only the `e` CTE
    differs — the DuckDB oracle derives the edge list inline, Spark
    reads it from a temp view over the CHECKPOINTED _cosupply_edges
    frame (without that, Spark's recursive execution re-derives the
    whole per-part pair explosion on EVERY iteration: 19 s vs 3 s at
    sf0.1). UNION ALL recursion + MIN(d) dedup at the end — the only
    recursion form Spark 4 supports; termination is the
    d < {RCTE_MAX_HOPS} bound plus the DAG's ascending-key
    acyclicity."""
    return f"""
    WITH RECURSIVE {edges_cte},
    s0 AS (SELECT MIN(sa) AS s FROM e),
    walk(node, d) AS (
      SELECT s, 0 FROM s0
      UNION ALL
      SELECT e.sb, w.d + 1 FROM walk w JOIN e ON e.sa = w.node
      WHERE w.d < {RCTE_MAX_HOPS}
    ),
    dist AS (SELECT node, MIN(d) AS dd FROM walk GROUP BY node)
    SELECT CAST(dd AS INT) AS dist,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(MIN(node) AS BIGINT) AS min_supplier
    FROM dist GROUP BY dd ORDER BY dist
    """


# the edge CTE is graph._COSUPPLY_SQL verbatim — ONE definition of the
# strongest-edge co-supply graph, so tuning TRI_EDGES or the tie-break
# cannot leave this oracle validating a different graph than the query
# (the Spark side already runs graph._cosupply_edges)
_RCTE_EDGES_ORACLE = _COSUPPLY_SQL


@_register("recursive_cte_reachability", _rcte_sql(_RCTE_EDGES_ORACLE))
def recursive_cte_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ascending-key reachability from the lowest-keyed supplier over
    the strongest-edge co-supply DAG, written as a Spark 4 WITH
    RECURSIVE — the declarative twin of supplier_hops_bfs's frontier
    loop (directed here, so the hop histogram differs; the CONTRACT
    under test is Spark's recursion execution against DuckDB's).

    Scale shape: the corpus-side work (ps dedup + per-part pair
    explosion) is the attested _cosupply_edges derivation, materialized
    ONCE by its localCheckpoint and exposed to the recursion as a temp
    view — Spark's recursive execution has no lineage cut of its own,
    so recursing over the raw derivation re-ran the corpus joins every
    iteration (19 s → 3 s at sf0.1). The recursion then runs on the
    ≤{_RCTE_EDGES}-row DAG, whose walk multiplicity is a property of
    the FIXED graph bound, not of data scale. The driver-loop form
    with per-round checkpoints (supplier_hops_bfs) remains the
    production path for unbounded graphs."""
    from automated_dow30_earnings_reports_spark.operators.graph import (
        _cosupply_edges,
    )

    _cosupply_edges(spark, sf_dir).createOrReplaceTempView("rcte_edges")
    return spark.sql(_rcte_sql("e AS (SELECT sa, sb FROM rcte_edges)"))


# ---------------------------------------------------------------------------
# VARIANT — the Spark 4 semi-structured type over the events.props JSON.
# ---------------------------------------------------------------------------


@_register(
    "variant_props_stats",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)  AS n_events,
           CAST(COUNT(TRY_CAST(props::JSON->>'k' AS INTEGER)) AS BIGINT) AS n_with_k,
           CAST(MIN(TRY_CAST(props::JSON->>'k' AS INTEGER)) AS INT)  AS min_k,
           CAST(MAX(TRY_CAST(props::JSON->>'k' AS INTEGER)) AS INT)  AS max_k,
           CAST(SUM(TRY_CAST(props::JSON->>'k' AS INTEGER)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through the VARIANT type:
    parse_json(props) once, variant_get the field with a typed path —
    the schema-on-read path for ragged JSON where from_json's fixed
    schema (json_scalar) would force a priori structure. All outputs
    are exact integers.

    Scale shape: parse + extract are per-row map work on the scan
    (VARIANT's binary encoding is columnar-friendly — the open-format
    answer to shredded JSON); the aggregate is a 5-key groupBy."""
    e = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.count("k").cast("bigint").alias("n_with_k"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# SQL scalar UDF — logic shipped as CREATE FUNCTION, not a Python UDF.
# ---------------------------------------------------------------------------

_LEN_BAND_DDL = """
CREATE OR REPLACE TEMPORARY FUNCTION doc_len_band(n BIGINT)
RETURNS STRING
RETURN CASE WHEN n < 200 THEN 'short'
            WHEN n < 1000 THEN 'medium'
            ELSE 'long' END
"""


@_register(
    "sql_udf_len_band",
    """
    SELECT CASE WHEN n_chars < 200 THEN 'short'
                WHEN n_chars < 1000 THEN 'medium'
                ELSE 'long' END AS band,
           CAST(COUNT(*) AS BIGINT)      AS n_docs,
           CAST(SUM(n_chars) AS BIGINT)  AS total_chars
    FROM documents
    GROUP BY band
    ORDER BY band
    """,
)
def sql_udf_len_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length banding through a SQL scalar UDF (CREATE OR
    REPLACE TEMPORARY FUNCTION — Spark 4's shareable, catalog-resident
    alternative to cloning CASE expressions into every query; unlike a
    Python UDF the body is a SQL expression, so Catalyst inlines it
    into codegen and pushdown still works). CREATE OR REPLACE keeps
    same-session re-runs idempotent."""
    spark.sql(_LEN_BAND_DDL)
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.expr("doc_len_band(n_chars)").alias("band"), "n_chars")
        .groupBy("band")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# VARIANT through the lake: the semi-structured column survives a
# parquet write/read round trip (Spark 4 shreds VariantType natively).
# ---------------------------------------------------------------------------

import os as _os

_SCRATCH_VARIANT = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
    ".scratch",
    "variant_lake",
)


@_register(
    "variant_lake_roundtrip",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(TRY_CAST(props::JSON->>'k' AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(COUNT(*) FILTER (TRY_CAST(props::JSON->>'k' AS INTEGER) IS NULL)
                AS BIGINT) AS n_null_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def variant_lake_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT column as a STORAGE type: parse events.props once at
    ingest, persist the VariantType column to parquet (Spark 4 writes
    variant natively — the shredded binary encoding, not a re-stringed
    JSON), read it back, and aggregate typed paths from the STORED
    variant. Content-transparency gate: the post-roundtrip aggregate
    must hash-match the oracle computed from the original JSON text —
    a lossy encode/decode or a dropped field breaks it.

    Scale shape: parse-at-ingest is the production contract (parse
    once, query many); the write is one scan + per-partition files,
    the read-back aggregation prunes to (event_type, v)."""
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        scratch_path,
    )

    e = load_table(spark, sf_dir, "events")
    path = scratch_path(_SCRATCH_VARIANT, sf_dir)
    e.select("event_id", "event_type", F.parse_json("props").alias("v")).write.mode(
        "overwrite"
    ).parquet(path)
    back = spark.read.parquet(path)
    k = F.try_variant_get(F.col("v"), "$.k", "int")
    return (
        back.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_null_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# pandas API on Spark — the third front-end (SQL, DataFrame, pandas)
# answering from the same engine, value-checked like everything else.
# ---------------------------------------------------------------------------


@_register(
    "ps_api_doc_stats",
    """
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)     AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS mean_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def ps_api_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document stats through pyspark.pandas — the pandas
    front-end compiles to the SAME Catalyst plans as the DataFrame API
    (groupby.agg here becomes a hash aggregate, not a driver-side
    pandas frame), so a pandas-fluent user gets distributed execution
    for free. The result converts back via to_spark() and the ratio +
    rounding run ENGINE-side, keeping the cross-engine determinism
    conventions (exact integer aggregates, one double division)."""
    import pyspark.pandas as ps

    psdf = ps.read_parquet(_os.path.join(sf_dir, "documents.parquet"))
    g = psdf.groupby("lang", as_index=False, dropna=False).agg(
        {"doc_id": "count", "n_chars": "sum"}
    )
    sdf = g.to_spark()
    return sdf.select(
        "lang",
        F.col("doc_id").cast("bigint").alias("n_docs"),
        F.col("n_chars").cast("bigint").alias("total_chars"),
        F.round(
            F.col("n_chars").cast("double") / F.col("doc_id"), 4
        ).alias("mean_chars"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# CACHE TABLE — the storage-layer surface: an InMemoryRelation serving
# repeated queries from columnar cache instead of re-scanning parquet.
# ---------------------------------------------------------------------------


@_register(
    "cache_table_reuse",
    """
    WITH li AS (
      SELECT l_orderkey, l_quantity, l_extendedprice, l_returnflag
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_price
    FROM li
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def cache_table_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's columnar cache as a first-class surface: register the
    projected fact slice as a temp view, CACHE TABLE it (eager — the
    statement itself materializes the columnar batches), and return the
    aggregate, which reads the InMemoryRelation instead of parquet
    (plan pin + result-transparency-across-cached/uncached pin in
    tests); the driver's hash against the scan-side oracle proves the
    cached batches content-transparent.

    Scale shape: caching a PROJECTED slice (4 columns, not the table)
    is the production pattern — the cache cost is the working set you
    actually re-query. The entry stays resident so the RETURNED plan
    still reads it (uncaching first would silently hand back a parquet
    scan); a stale prior entry is dropped up front, re-runs replace
    rather than stack, and Spark's storage memory is unified/evictable
    so an idle entry yields to later shuffles instead of starving
    them."""
    spark.sql("UNCACHE TABLE IF EXISTS cache_demo_li")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    li.createOrReplaceTempView("cache_demo_li")
    spark.sql("CACHE TABLE cache_demo_li")  # eager: batches built HERE
    return (
        spark.table("cache_demo_li")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"),
                2,
            ).alias("total_price"),
        )
        .orderBy("l_returnflag")
    )
