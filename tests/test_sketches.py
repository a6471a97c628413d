"""Sketch-operator guarantees (operators/sketches.py): Count-Min
overestimates, Bloom never false-negatives, and both stay tiny."""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.operators.sketches import (
    BLOOM_K,
    BLOOM_M,
    CMS_D,
    CMS_W,
    bloom_join_prune,
    cms_heavy_hitters,
)
from automated_dow30_earnings_reports_spark.tables import load_table


def test_cms_overestimate_and_shape(spark, sf_correctness):
    rows = cms_heavy_hitters(spark, sf_correctness).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        # the Count-Min contract: never underestimate
        assert r.cms_estimate >= r.exact_n
        # error bounded far below eps*N in this regime; sanity-bound it
        assert r.cms_estimate - r.exact_n < r.exact_n  # < 2x overcount
    # heavy hitters come back in exact-count order
    counts = [r.exact_n for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_cms_sketch_cardinality_bounded(spark, sf_correctness):
    """The sketch itself must stay <= d*w rows no matter the corpus."""
    # rebuild just the sketch side the same way the operator does
    from automated_dow30_earnings_reports_spark.operators.sketches import (
        _bucket_col,
        _digest_col,
    )

    d = load_table(spark, sf_correctness, "documents")
    toks = d.select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"))
    hashed = toks.withColumn("dg", _digest_col(F.col("tok")))
    n_cells = (
        hashed.select(
            F.explode(
                F.array(*[_bucket_col(F.col("dg"), i) + i * CMS_W for i in range(CMS_D)])
            ).alias("cell")
        )
        .distinct()
        .count()
    )
    assert n_cells <= CMS_D * CMS_W


def test_bloom_no_false_negatives(spark, sf_correctness):
    """Every row of the plain join must survive the bloom pre-filter:
    joined_rows from the pruned path equals the unpruned join count."""
    out = bloom_join_prune(spark, sf_correctness).collect()[0]
    cust = (
        load_table(spark, sf_correctness, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .distinct()
    )
    orders = load_table(spark, sf_correctness, "orders")
    expected = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    assert out.joined_rows == expected
    # and the filter actually prunes (false-positive rate << 1)
    assert out.bloom_survivors < out.probe_rows
    assert out.bloom_survivors - out.joined_rows < 0.05 * out.probe_rows
    assert BLOOM_M >= 1024 and BLOOM_K >= 2


def test_kmv_estimate_within_band(spark, sf_correctness):
    """KMV relative error concentrates at ~1/sqrt(k); allow 5 sigma."""
    from automated_dow30_earnings_reports_spark.operators.sketches import (
        KMV_K,
        kmv_distinct_orders,
    )

    out = kmv_distinct_orders(spark, sf_correctness).collect()[0]
    assert out.kth_hash > 0
    rel_err = abs(out.kmv_estimate - out.exact_distinct) / out.exact_distinct
    assert rel_err < 5.0 / (KMV_K ** 0.5)


def test_kmv_union_consistency(spark, sf_correctness):
    """Sketch-union estimate tracks the exact union within the same
    band, and the union estimate >= each side's lower bound logic
    (merged kth hash can only shrink vs either input's kth)."""
    from automated_dow30_earnings_reports_spark.operators.sketches import (
        KMV_UNION_K,
        kmv_union_returnflags,
    )

    out = kmv_union_returnflags(spark, sf_correctness).collect()[0]
    rel_err = abs(out.union_estimate - out.exact_union) / out.exact_union
    assert rel_err < 5.0 / (KMV_UNION_K ** 0.5)


def test_quantile_sketch_error_bounded_by_bin_width(spark, sf_correctness):
    """Midpoint read-out can be off by at most one bin width."""
    from automated_dow30_earnings_reports_spark.operators.sketches import (
        QSK_BINS,
        quantile_sketch_events,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table
    from pyspark.sql import functions as F

    ext = (
        load_table(spark, sf_correctness, "events")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()[0]
    )
    bin_w = (ext.hi - ext.lo) / QSK_BINS
    rows = quantile_sketch_events(spark, sf_correctness).collect()
    assert [r.q for r in rows] == [0.5, 0.95, 0.99]
    for r in rows:
        assert abs(r.est - r.exact) <= bin_w


def _tiny_sf(spark, tmp_path, **tables):
    """Materialize a miniature sf_dir: one parquet per named table."""
    d = str(tmp_path / "tiny_sf")
    for name, df in tables.items():
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/{name}.parquet")
    return d


def test_kmv_partial_sketch_is_exact(spark, tmp_path):
    """With fewer distinct keys than k the k-min set IS the key set, so
    the estimate must be the exact count — not (k-1)*space/kth
    (ADVICE r3: the full-sketch formula is wrong for partial sketches)."""
    from automated_dow30_earnings_reports_spark.operators.sketches import (
        kmv_distinct_orders,
    )

    li = spark.range(10).selectExpr("id AS l_orderkey")
    sf = _tiny_sf(spark, tmp_path, lineitem=li)
    out = kmv_distinct_orders(spark, sf).collect()[0]
    assert out.exact_distinct == 10
    assert out.kmv_estimate == 10.0


def test_kmv_union_partial_sketch_is_exact(spark, tmp_path):
    from automated_dow30_earnings_reports_spark.operators.sketches import (
        kmv_union_returnflags,
    )
    from pyspark.sql import functions as F

    li = (
        spark.range(8)
        .selectExpr("id AS l_orderkey")
        .withColumn("l_returnflag", F.when(F.col("l_orderkey") % 2 == 0, "R").otherwise("A"))
    )
    sf = _tiny_sf(spark, tmp_path, lineitem=li)
    out = kmv_union_returnflags(spark, sf).collect()[0]
    assert out.exact_union == 8
    assert out.union_estimate == 8.0


def test_quantile_sketch_degenerate_distribution(spark, tmp_path):
    """All-equal values must yield the trivial answer (est == exact ==
    the constant), not a divide-by-zero NULL bin (ADVICE r3). Checked
    against the DuckDB oracle on the same tiny table so the mirrored
    CASE guard is exercised on both engines."""
    from automated_dow30_earnings_reports_spark.operators.sketches import (
        ORACLES,
        quantile_sketch_events,
    )
    from tests.oracle_harness import compare
    from pyspark.sql import functions as F

    ev = spark.range(100).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
        F.lit(7.5).alias("value"),
    )
    sf = _tiny_sf(spark, tmp_path, events=ev)
    rows = quantile_sketch_events(spark, sf).collect()
    assert [r.q for r in rows] == [0.5, 0.95, 0.99]
    for r in rows:
        assert r.est == 7.5 and r.exact == 7.5
    import duckdb

    con = duckdb.connect()
    # Spark wrote events.parquet as a directory of part files; glob it.
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet/*.parquet')")
    oracle_pdf = con.execute(ORACLES["quantile_sketch_events"]).df()
    assert compare("quantile_sketch_events", quantile_sketch_events(spark, sf), oracle_pdf) == []
