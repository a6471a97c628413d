"""Python UDTFs registered into Spark SQL (§2.10 widening).

The reference's row-expanding steps (link extraction from a page,
`extract_all_links` at enhanced_selenium_scraper.py:698-708) map to
TABLE functions, not scalar UDFs. `pipeline/llm_extract.py` models the
heavyweight one as `mapInPandas`; this module covers the OTHER half of
the §2.10 surface: a proper `@udtf` class registered with
`spark.udtf.register` and invoked from SQL with `LATERAL` — the
idiomatic Spark-4 way to let analysts call a Python row-expander from
plain SQL.

Scale notes: a UDTF runs row-at-a-time in Python, so it belongs on
ALREADY-REDUCED data (here: one synthesized page per document — the
expansion is bounded at 2 links/row) or as the last resort after the
JVM regex paths (sources/html_table.py) don't fit. The query exists to
pin the API contract (registration, LATERAL join, column naming,
determinism) with a value-checked oracle, exactly like the PNG
header round trip pins the container parsers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


class ExtractLinks:
    """UDTF: anchor tags out of an HTML fragment → (href, anchor) rows.

    Declared analyze-free (static returnType at registration); eval
    yields in document order so the output is deterministic."""

    def eval(self, html: str):  # noqa: A003 - UDTF contract name
        import re

        if html is None:
            return
        for m in re.finditer(
            r"<a\s[^>]*href=[\"']([^\"']*)[\"'][^>]*>(.*?)</a>",
            html,
            re.S | re.I,
        ):
            anchor = re.sub(r"<[^>]*>", "", m.group(2)).strip()
            yield (m.group(1), anchor)


def register_udtfs(spark: SparkSession) -> None:
    """Idempotently register this module's UDTFs on the session."""
    from pyspark.sql.functions import udtf

    # Arrow-batched UDTF eval (ArrowEvalPythonUDTF instead of pickled
    # row-at-a-time BatchEvalPythonUDTF) — same policy as every other
    # Python stage in this repo.
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    spark.udtf.register(
        "extract_links_udtf",
        udtf(ExtractLinks, returnType="href string, anchor string"),
    )


@_register(
    "udtf_lateral_links",
    """
    SELECT doc_id,
           '/doc/' || CAST(doc_id AS VARCHAR) || '.pdf' AS href,
           'Report ' || CAST(doc_id AS VARCHAR)         AS anchor
    FROM documents
    UNION ALL
    SELECT doc_id,
           'http://mirror/' || source AS href,
           source                     AS anchor
    FROM documents
    ORDER BY doc_id, href
    """,
)
def udtf_lateral_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-invoked Python UDTF: synthesize a two-anchor page per
    document in-plan, LATERAL-join the UDTF over it, return the parsed
    (href, anchor) rows. The oracle states the expected rows
    algebraically, so any parsing slip, row loss, or ordering bug in
    the UDTF/LATERAL path breaks the value hash."""
    from automated_dow30_earnings_reports_spark.tables import load_table

    register_udtfs(spark)
    load_table(spark, sf_dir, "documents").select("doc_id", "source").createOrReplaceTempView(
        "udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, l.href, l.anchor
        FROM (
          SELECT doc_id,
                 concat('<p>intro</p><a href="/doc/', CAST(doc_id AS STRING),
                        '.pdf"><b>Report ', CAST(doc_id AS STRING),
                        '</b></a> <a class=x href=''http://mirror/', source,
                        ''' rel=nofollow>', source, '</a>') AS html
          FROM udtf_docs
        ) d,
        LATERAL extract_links_udtf(d.html) l
        ORDER BY d.doc_id, l.href
        """
    )


@_register(
    "sql_fulfillment_rollup",
    """
    WITH per AS (
      SELECT o_orderpriority AS priority, o_orderstatus AS status,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(SUM(o_totalprice), 2) AS total_price
      FROM orders GROUP BY 1, 2
    )
    SELECT COALESCE(priority, 'ALL') AS priority,
           COALESCE(status, 'ALL')   AS status,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders,
           ROUND(SUM(total_price), 2)    AS total_price
    FROM per
    GROUP BY ROLLUP (priority, status)
    ORDER BY priority, status
    """,
)
def sql_fulfillment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure `spark.sql` entry path: temp-view registration + a CTE +
    ROLLUP report authored entirely in SQL — pinning that the SQL
    surface (not just the DataFrame API) drives the same Catalyst
    plans. Two-level aggregate keeps the ROLLUP input at group
    cardinality (the Expand operator multiplies ROWS x grouping sets —
    pre-aggregating first means it multiplies ~15 rows, not the fact
    table; same trick as cube_priority_status)."""
    from automated_dow30_earnings_reports_spark.tables import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sql_orders")
    return spark.sql(
        """
        WITH per AS (
          SELECT o_orderpriority AS priority, o_orderstatus AS status,
                 CAST(COUNT(*) AS BIGINT) AS n_orders,
                 ROUND(SUM(o_totalprice), 2) AS total_price
          FROM sql_orders GROUP BY 1, 2
        )
        SELECT COALESCE(priority, 'ALL') AS priority,
               COALESCE(status, 'ALL')   AS status,
               CAST(SUM(n_orders) AS BIGINT) AS n_orders,
               ROUND(SUM(total_price), 2)    AS total_price
        FROM per
        GROUP BY ROLLUP (priority, status)
        ORDER BY priority, status
        """
    )
