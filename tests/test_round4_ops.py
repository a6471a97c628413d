"""Round-4 operator contracts on tiny constructed inputs (the oracle
parity suite checks them against DuckDB at sf0.01; these pin the
SEMANTICS on inputs small enough to verify by hand)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _tiny_sf(spark, tmp_path, **tables):
    d = str(tmp_path / "tiny_sf")
    for name, df in tables.items():
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/{name}.parquet")
    return d


def test_repeated_ngram_spans_detects_shared_span(spark, tmp_path):
    from automated_dow30_earnings_reports_spark.operators.dedup import (
        repeated_ngram_spans,
    )

    shared = "a b c d e f g h"  # exactly one 8-gram
    docs = spark.createDataFrame(
        [
            (0, shared + " x y z", "en", "s", 1),
            (1, "p q r s t u v w " + shared, "en", "s", 1),
            (2, "k l m n o only once here words", "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _tiny_sf(spark, tmp_path, documents=docs)
    rows = {r.doc_id: r for r in repeated_ngram_spans(spark, sf).collect()}
    # doc 0: 4 grams, 1 shared; doc 1: 9 grams, 1 shared; doc 2: none
    assert rows[0].n_repeated == 1 and rows[0].n_grams == 4
    assert rows[1].n_repeated == 1 and rows[1].n_grams == 9
    assert rows[2].n_repeated == 0
    assert rows[0].repeated_frac == 0.25


def test_weighted_sample_is_weight_monotone(spark, tmp_path):
    """With equal hash draws, a larger weight must never score lower —
    check the exact formula on controlled weights."""
    from automated_dow30_earnings_reports_spark.operators.curation import (
        ES_SAMPLE_K,
        weighted_sample_topk,
    )

    docs = spark.createDataFrame(
        [(i, "t", "en", "s", 10 + (i % 7) * 100) for i in range(200)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _tiny_sf(spark, tmp_path, documents=docs)
    out = weighted_sample_topk(spark, sf).collect()
    assert len(out) == ES_SAMPLE_K
    # scores are ln(u)/w <= 0 and sorted descending
    scores = [r.es_score for r in out]
    assert all(s <= 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    # heavier docs dominate the sample: mean sampled weight well above
    # the corpus mean (draws are md5-deterministic, so this is stable)
    corpus_mean = sum(10 + (i % 7) * 100 for i in range(200)) / 200
    sample_mean = sum(r.n_chars for r in out) / len(out)
    assert sample_mean > corpus_mean


def test_snapshot_diff_cdc_classes(spark, sf_smoke):
    from automated_dow30_earnings_reports_spark.plans.advanced import (
        snapshot_diff_cdc,
    )

    rows = {r.change_type: r for r in snapshot_diff_cdc(spark, sf_smoke).collect()}
    assert set(rows) == {"insert", "delete", "update"}
    # inserts have no pre-image, deletes no post-image, updates both
    assert rows["insert"].pre_total is None and rows["insert"].post_total is not None
    assert rows["delete"].post_total is None and rows["delete"].pre_total is not None
    assert rows["update"].pre_total is not None and rows["update"].post_total is not None
    # an update rewrites status only: pre/post priced identically
    assert rows["update"].pre_total == rows["update"].post_total


def test_triangle_count_on_known_graph(spark, tmp_path):
    """K4 minus one edge has exactly 2 triangles; encode it as a
    co-supply pattern (each edge = one shared part)."""
    from automated_dow30_earnings_reports_spark.operators.graph import (
        triangle_count_cosupply,
    )

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]  # K4 minus (3,4)
    rows = [
        (part_id, supp)
        for part_id, (a, b) in enumerate(edges)
        for supp in (a, b)
    ]
    li = spark.createDataFrame(rows, "l_partkey long, l_suppkey long")
    sf = _tiny_sf(spark, tmp_path, lineitem=li)
    out = triangle_count_cosupply(spark, sf).collect()[0]
    assert out.n_edges == 5
    assert out.n_triangles == 2  # {1,2,3} and {1,2,4}


def test_co_occurrence_counts_distinct_baskets(spark, tmp_path):
    from automated_dow30_earnings_reports_spark.plans.advanced import (
        co_occurrence_part_pairs,
    )

    li = spark.createDataFrame(
        [
            # order 1: parts 10, 20 (twice -> must count once)
            (1, 10), (1, 20), (1, 20),
            # order 2: parts 10, 20, 30
            (2, 10), (2, 20), (2, 30),
        ],
        "l_orderkey long, l_partkey long",
    )
    part = spark.createDataFrame(
        [(10, "ten"), (20, "twenty"), (30, "thirty")], "p_partkey long, p_name string"
    )
    sf = _tiny_sf(spark, tmp_path, lineitem=li, part=part)
    out = {(r.part_a, r.part_b): r for r in co_occurrence_part_pairs(spark, sf).collect()}
    assert out[(10, 20)].support == 2  # duplicate line in order 1 not double-counted
    assert out[(10, 30)].support == 1 and out[(20, 30)].support == 1
    assert out[(10, 20)].name_a == "ten" and out[(10, 20)].name_b == "twenty"


def test_orderkey_islands_known_runs(spark, tmp_path):
    """Keys {1..5, 8, 10..13} minus the %97 filter (no-op here) form
    islands [1-5], [8-8], [10-13] -> lengths 5, 4, 1."""
    from automated_dow30_earnings_reports_spark.plans.advanced import (
        orderkey_islands,
    )

    keys = [1, 2, 3, 4, 5, 8, 10, 11, 12, 13]
    o = spark.createDataFrame([(k,) for k in keys], "o_orderkey long")
    sf = _tiny_sf(spark, tmp_path, orders=o)
    rows = [(r.island_start, r.island_end, r.island_len) for r in orderkey_islands(spark, sf).collect()]
    assert rows == [(1, 5, 5), (10, 13, 4), (8, 8, 1)]


def test_rolling_distinct_window_bounds(spark, tmp_path):
    """Users seen exactly 7 days before a day are IN its window; 8
    days before are OUT."""
    from automated_dow30_earnings_reports_spark.plans.advanced import (
        rolling_7d_distinct_users,
    )
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [(0, "2024-01-01 00:00:00", 1), (1, "2024-01-07 00:00:00", 2),
         (2, "2024-01-09 00:00:00", 3)],
        "event_id long, ts_s string, user_id long",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id")
    sf = _tiny_sf(spark, tmp_path, events=ev)
    out = {r.day: r.n_users_7d for r in rolling_7d_distinct_users(spark, sf).collect()}
    assert out["2024-01-01"] == 1
    assert out["2024-01-07"] == 2   # Jan 1 is day-6: inside the window
    assert out["2024-01-09"] == 2   # Jan 1 fell out; Jan 7 + Jan 9 remain


def test_value_trend_degenerate_group_yields_null(spark, tmp_path):
    """All of a type's events on ONE day -> OLS denominator is 0; the
    slope must be NULL, not an ANSI DIVIDE_BY_ZERO task failure
    (code-review r4 finding)."""
    from automated_dow30_earnings_reports_spark.plans.advanced import (
        value_trend_by_type,
    )

    ev = spark.createDataFrame(
        [(0, "2024-01-01 03:00:00", 1, "oneday", 5.0),
         (1, "2024-01-01 09:00:00", 2, "oneday", 9.0),
         (2, "2024-01-01 00:00:00", 3, "twoday", 1.0),
         (3, "2024-01-02 00:00:00", 4, "twoday", 3.0)],
        "event_id long, ts_s string, user_id long, event_type string, value double",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type", "value")
    sf = _tiny_sf(spark, tmp_path, events=ev)
    out = {r.event_type: r for r in value_trend_by_type(spark, sf).collect()}
    assert out["oneday"].slope_per_day is None and out["oneday"].intercept is None
    assert out["twoday"].slope_per_day == 2.0  # (3-1)/1 day


def test_spread_handles_percent_encoded_paths(spark, tmp_path):
    """A directory with a space must still be size-estimated (inputFiles
    returns percent-encoded URIs; code-review r4 finding)."""
    from automated_dow30_earnings_reports_spark.tables import spread

    d = tmp_path / "with space"
    spark.range(1000).coalesce(1).write.mode("overwrite").parquet(str(d))
    df = spark.read.parquet(str(d))
    out = spread(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 1000


def test_schema_evolution_null_alignment(spark, sf_smoke):
    """Pre-evolution rows surface NULL quality (counted), and the
    merged read loses no rows vs the base table."""
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        schema_evolution_read,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table

    out = schema_evolution_read(spark, sf_smoke).collect()
    base = load_table(spark, sf_smoke, "documents")
    assert sum(r.n_docs for r in out) == base.count()
    assert sum(r.n_pre_evolution for r in out) == base.where("doc_id < 250").count()


def test_file_skipping_is_sound(spark, sf_smoke):
    """A file the zone-map says to skip must contain ZERO matching
    rows (false skips would be data loss); with value-clustered
    layout, most files are skippable for a narrow range predicate."""
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        SKIP_N_FILES,
        file_skipping_stats,
    )

    rows = file_skipping_stats(spark, sf_smoke).collect()
    # Equal-width binning emits no row for an empty bucket (a price
    # outlier stretching the span can drain interior buckets), so pin
    # a range, not exact equality; ids must stay in [1, N].
    assert 1 <= len(rows) <= SKIP_N_FILES
    assert all(1 <= r.file_id <= SKIP_N_FILES for r in rows)
    for r in rows:
        if r.skipped:
            assert r.n_matching == 0
    # the [400, 500] probe touches at most a few buckets of the span
    assert sum(1 for r in rows if r.skipped) >= len(rows) - 3


def test_session_gap_rule(spark, tmp_path):
    """Events 29 min apart share a session; 31 min apart split."""
    from automated_dow30_earnings_reports_spark.plans.advanced import (
        session_stats_batch,
    )

    base = 1_700_000_000
    ev = spark.createDataFrame(
        [(0, base, 1), (1, base + 29 * 60, 1), (2, base + 29 * 60 + 31 * 60, 1)],
        "event_id long, es long, user_id long",
    ).select("event_id", F.timestamp_seconds("es").alias("ts"), "user_id")
    sf = _tiny_sf(spark, tmp_path, events=ev)
    out = session_stats_batch(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_sessions == 2 and r.max_events == 2


def test_bm25_ranks_exact_formula(spark, tmp_path):
    """Hand-computed BM25 on a 3-doc corpus: doc with both query terms
    outranks single-term docs; absent-term docs are excluded."""
    import math

    from automated_dow30_earnings_reports_spark.operators.textstats import (
        BM25_B,
        BM25_K1,
        BM25_QUERY,
        bm25_retrieval,
    )

    t0, t1 = BM25_QUERY[0], BM25_QUERY[1]
    docs = spark.createDataFrame(
        [
            (0, f"{t0} {t1} filler words here", "en", "s", 1),
            (1, f"{t0} filler words here more", "en", "s", 1),
            (2, "nothing relevant at all here", "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _tiny_sf(spark, tmp_path, documents=docs)
    rows = bm25_retrieval(spark, sf).collect()
    assert [r.doc_id for r in rows] == [0, 1]  # doc 2 has no query term
    # reproduce doc 1's score: N=3, df(t0)=2, tf=1, dl=5, avgdl=5
    idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    tfc = (1 * (BM25_K1 + 1.0)) / (1 + BM25_K1 * (1.0 - BM25_B + BM25_B * 5 / 5.0))
    assert abs(rows[1].bm25 - round(idf * tfc, 6)) < 1e-9


def test_session_gap_is_microsecond_exact(spark, tmp_path):
    """A 1800.5s gap must SPLIT the session (the code-review repro:
    second-floored arithmetic merged it while the oracle split it)."""
    from automated_dow30_earnings_reports_spark.plans.advanced import (
        session_stats_batch,
    )

    base_us = 1_700_000_000_000_000 + 200_000  # base + 0.2s
    ev = spark.createDataFrame(
        [(0, base_us, 1), (1, base_us + 1_800_500_000, 1)],
        "event_id long, us long, user_id long",
    ).select("event_id", F.timestamp_micros("us").alias("ts"), "user_id")
    sf = _tiny_sf(spark, tmp_path, events=ev)
    r = session_stats_batch(spark, sf).collect()[0]
    assert r.n_sessions == 2 and r.max_events == 1
    # and exactly 1800.000000s stays ONE session (boundary not >)
    ev2 = spark.createDataFrame(
        [(0, base_us, 1), (1, base_us + 1_800_000_000, 1)],
        "event_id long, us long, user_id long",
    ).select("event_id", F.timestamp_micros("us").alias("ts"), "user_id")
    sf2 = str(tmp_path / "b")
    ev2.coalesce(1).write.mode("overwrite").parquet(f"{sf2}/events.parquet")
    r2 = session_stats_batch(spark, sf2).collect()[0]
    assert r2.n_sessions == 1 and r2.max_events == 2


def test_conf_bytes_honors_size_suffixes(spark):
    """'64m' must read as 64 MiB, not 64 bytes — the digit-run parse
    made maxSplitBytes tiny and spread() a silent no-op whenever the
    user passed a suffixed conf value (review find)."""
    from automated_dow30_earnings_reports_spark.tables import _conf_bytes

    key = "spark.sql.files.maxPartitionBytes"
    prev = spark.conf.get(key, None)
    try:
        for raw, want in [
            ("64m", 64 << 20), ("64mb", 64 << 20), ("1g", 1 << 30),
            ("512k", 512 << 10), ("134217728", 134217728), ("128MB", 128 << 20),
        ]:
            spark.conf.set(key, raw)
            got = _conf_bytes(spark, key, 0)
            assert got == want, f"{raw}: {got} != {want}"
        # unparsable -> default (a free-form key: Spark validates size
        # confs at set time, so the real key can't hold garbage)
        spark.conf.set("spark.test.fakeBytes", "not-a-size")
        assert _conf_bytes(spark, "spark.test.fakeBytes", 42) == 42
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
