"""Sketch operators (beyond-reference §2.11 — the mergeable-summary
family a 100 TB pipeline leans on when exact state is too big).

Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data
stream summary: the count-min sketch and its applications"): d hash
rows x w buckets of counts. Built here AS DATA — a (row, bucket, n)
DataFrame — because that is what makes it useful at scale: the sketch
aggregates map-side (groupBy on (row, bucket) — bounded d*w
cardinality regardless of corpus size), merges across
days/shards/streams by simple addition, and persists as a tiny table
that later jobs probe without rescanning the corpus.

Every arithmetic step is md5-based integer work mirrored 1:1 in the
DuckDB oracle, so the ESTIMATES themselves are value-checked — not
just asserted to be within epsilon. The overestimate guarantee
(est >= exact, err <= eps*N w.h.p.) is additionally pinned in tests.

Bloom-filter pre-join pruning lives here too: the bit positions of a
key set, aggregated once, broadcast to prune a big probe side before
an expensive shuffle join — the cross-job, persistable cousin of
Spark's runtime bloom-join optimization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.tables import load_table, spread

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Carter-Wegman row hashes over the 28-bit md5 digest (same family as
# the MinHash tier — products < 2^59, exact in bigint on both engines).
CMS_D = 4  # hash rows
CMS_W = 1024  # buckets per row
CMS_P = 4294967311
CMS_A = [7 * i * 1_000_033 + 91_193 for i in range(1, CMS_D + 1)]
CMS_B = [i * 65_447 + 13 for i in range(CMS_D)]
TOP_TOKENS = 20


def _digest_col(tok: Column) -> Column:
    """28-bit integer from the first 7 md5 hex digits of the token."""
    return F.conv(F.substring(F.md5(tok.cast("binary")), 1, 7), 16, 10).cast("bigint")


_DIGEST_SQL = (
    "("
    + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({{t}}), {p}, 1)) - 1) * {16 ** (7 - p)}"
        for p in range(1, 8)
    )
    + ")"
)


def _bucket_col(digest: Column, i: int) -> Column:
    return ((digest * CMS_A[i] + CMS_B[i]) % CMS_P % CMS_W).cast("int")


def _bucket_sql(digest: str, i: int) -> str:
    return f"CAST((({digest}) * {CMS_A[i]} + {CMS_B[i]}) % {CMS_P} % {CMS_W} AS INT)"


def _cms_oracle() -> str:
    digest = _DIGEST_SQL.format(t="tok")
    sketch_rows = "\n      UNION ALL\n      ".join(
        f"SELECT {i} AS r, {_bucket_sql('dg', i)} AS bucket, doc_n FROM hashed"
        for i in range(CMS_D)
    )
    probe_rows = "\n      UNION ALL\n      ".join(
        f"SELECT tok, exact_n, {i} AS r, {_bucket_sql('dg', i)} AS bucket FROM cands"
        for i in range(CMS_D)
    )
    return f"""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ),
    counted AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS doc_n FROM toks GROUP BY tok),
    hashed AS (SELECT tok, doc_n, {digest} AS dg FROM counted),
    entries AS (
      {sketch_rows}
    ),
    sketch AS (SELECT r, bucket, CAST(SUM(doc_n) AS BIGINT) AS n
               FROM entries GROUP BY r, bucket),
    cands AS (
      SELECT tok, doc_n AS exact_n, dg FROM hashed
      ORDER BY doc_n DESC, tok LIMIT {TOP_TOKENS}
    ),
    probes AS (
      {probe_rows}
    )
    SELECT p.tok,
           p.exact_n,
           CAST(MIN(s.n) AS BIGINT) AS cms_estimate
    FROM probes p JOIN sketch s ON s.r = p.r AND s.bucket = p.bucket
    GROUP BY p.tok, p.exact_n
    ORDER BY exact_n DESC, tok
    """


@_register("cms_heavy_hitters", _cms_oracle())
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters: build the d x w sketch over corpus
    tokens, then read the top-{TOP_TOKENS} tokens' counts back OUT of
    the sketch (min over the d probed cells) next to their exact
    counts. The overestimate (cms_estimate >= exact_n) is the sketch's
    contract; the exact column exists only because test SF allows a
    ground truth — a production pipeline keeps just the d*w-row
    sketch.

    Scale shape: token counts aggregate map-side; the sketch groupBy
    has at most d*w = {CMS_D}x{CMS_W} groups regardless of corpus
    size; probing joins {TOP_TOKENS}*d rows against the sketch —
    broadcast territory forever."""
    # spread(): the token explode + per-token digest is the dominant map
    # stage and the one-file local scan would otherwise run it on one
    # core (tables.spread contract; no-op at scale)
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok")
    )
    counted = toks.groupBy("tok").agg(F.count("*").cast("bigint").alias("doc_n"))
    # materialized: both the sketch build and the top-N candidate branch
    # consume `hashed`, and without this the corpus-wide token explode +
    # count shuffle (the dominant cost) runs twice
    hashed = counted.withColumn("dg", _digest_col(F.col("tok"))).localCheckpoint(
        eager=True
    )

    entries = hashed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        _bucket_col(F.col("dg"), i).alias("bucket"),
                        F.col("doc_n").alias("doc_n"),
                    )
                    for i in range(CMS_D)
                ]
            )
        ).alias("e")
    ).select("e.r", "e.bucket", "e.doc_n")
    sketch = entries.groupBy("r", "bucket").agg(
        F.sum("doc_n").cast("bigint").alias("n")
    )

    cands = hashed.orderBy(F.desc("doc_n"), "tok").limit(TOP_TOKENS).select(
        "tok", F.col("doc_n").alias("exact_n"), "dg"
    )
    probes = cands.select(
        "tok",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"), _bucket_col(F.col("dg"), i).alias("bucket")
                    )
                    for i in range(CMS_D)
                ]
            )
        ).alias("e"),
    ).select("tok", "exact_n", "e.r", "e.bucket")
    return (
        probes.join(sketch, ["r", "bucket"])
        .groupBy("tok", "exact_n")
        .agg(F.min("n").cast("bigint").alias("cms_estimate"))
        .orderBy(F.desc("exact_n"), "tok")
    )


# ---------------------------------------------------------------------------
# Bloom-filter pre-join pruning — build the filter AS DATA from the
# build side's keys, broadcast it, and drop probe rows whose key cannot
# be in the build side BEFORE the join shuffle. False positives only
# (the join's equality check removes them), so the join RESULT is
# byte-identical to the unfiltered join — which is exactly what the
# oracle asserts. The pruning ratio is reported alongside.
# ---------------------------------------------------------------------------

BLOOM_M = 8192  # bits
BLOOM_K = 3  # hash probes


def _bloom_pos_col(digest: Column, i: int) -> Column:
    return ((digest * CMS_A[i] + CMS_B[i]) % CMS_P % BLOOM_M).cast("int")


def _bloom_pos_sql(digest: str, i: int) -> str:
    return f"CAST((({digest}) * {CMS_A[i]} + {CMS_B[i]}) % {CMS_P} % {BLOOM_M} AS INT)"


def _bloom_oracle() -> str:
    # The bloom pass is transparent to the join result: oracle = the
    # plain join aggregate, plus the pruning stats recomputed from the
    # same bit arithmetic.
    digest_o = _DIGEST_SQL.format(t="CAST(o_custkey AS VARCHAR)")
    digest_c = _DIGEST_SQL.format(t="CAST(c_custkey AS VARCHAR)")
    build_pos = "\n      UNION ALL\n      ".join(
        f"SELECT {_bloom_pos_sql('dg', i)} AS pos FROM build_keys" for i in range(BLOOM_K)
    )
    probe_checks = " AND ".join(
        f"{_bloom_pos_sql('dg', i)} IN (SELECT pos FROM bloom)" for i in range(BLOOM_K)
    )
    return f"""
    WITH build_keys AS (
      SELECT DISTINCT c_custkey, {digest_c} AS dg FROM customer
      WHERE c_mktsegment = 'BUILDING'
    ),
    bloom AS (SELECT DISTINCT pos FROM ({build_pos})),
    probe AS (SELECT o_custkey, o_totalprice, {digest_o} AS dg FROM orders),
    survivors AS (
      SELECT o_custkey, o_totalprice FROM probe WHERE {probe_checks}
    ),
    joined AS (
      SELECT s.o_custkey, s.o_totalprice
      FROM survivors s JOIN build_keys b ON b.c_custkey = s.o_custkey
    )
    SELECT CAST((SELECT COUNT(*) FROM probe) AS BIGINT)      AS probe_rows,
           CAST((SELECT COUNT(*) FROM survivors) AS BIGINT)  AS bloom_survivors,
           CAST((SELECT COUNT(*) FROM joined) AS BIGINT)     AS joined_rows,
           CAST((SELECT ROUND(SUM(o_totalprice), 2) FROM joined) AS DOUBLE)
                                                             AS joined_totalprice
    """


@_register("bloom_join_prune", _bloom_oracle())
def bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned join: BUILDING-segment customers' keys become an
    {BLOOM_M}-bit filter (as a distinct bit-position table, broadcast);
    orders rows failing any of the {BLOOM_K} probes are dropped before
    the join. Output pins probe/survivor/joined counts and the joined
    aggregate — the aggregate proves result-transparency, the counts
    prove the pruning actually happened (and match the oracle's
    identical bit arithmetic).

    At 100 TB: the filter is built once from the small side (or read
    from a stored sketch table), broadcast at a few KB, and the big
    probe side sheds non-matching rows map-side BEFORE paying the
    shuffle — the manual, cross-job-persistable form of Spark's
    runtime bloom-join optimization."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .distinct()
        .withColumn("dg", _digest_col(F.col("c_custkey").cast("string")))
        # dim-sized; feeds BOTH the filter build and the verifying join
        .localCheckpoint(eager=True)
    )
    bloom = (
        cust.select(
            F.explode(
                F.array(*[_bloom_pos_col(F.col("dg"), i) for i in range(BLOOM_K)])
            ).alias("pos")
        )
        # no distinct: collect_set dedupes (map-side partials included),
        # so a pre-distinct was one full extra shuffle for nothing
        .agg(F.collect_set("pos").alias("bits"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).withColumn("dg", _digest_col(F.col("o_custkey").cast("string")))
    probe = orders.crossJoin(F.broadcast(bloom))
    ok = None
    for i in range(BLOOM_K):
        cond = F.array_contains(F.col("bits"), _bloom_pos_col(F.col("dg"), i))
        ok = cond if ok is None else (ok & cond)
    # SINGLE probe-side pass: a LEFT broadcast join keeps every orders
    # row, so probe count / bloom survivors / true-join rows are three
    # conditional sums of one aggregate — the count-per-stage form
    # scanned orders three times for the same output row
    staged = probe.select("o_custkey", "o_totalprice", ok.alias("pass")).join(
        F.broadcast(cust.select("c_custkey")),
        F.col("o_custkey") == F.col("c_custkey"),
        "left",
    )
    hit = F.col("pass") & F.col("c_custkey").isNotNull()
    return staged.agg(
        F.count("*").cast("bigint").alias("probe_rows"),
        F.sum(F.when(F.col("pass"), 1).otherwise(0))
        .cast("bigint")
        .alias("bloom_survivors"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias("joined_rows"),
        F.round(F.sum(F.when(hit, F.col("o_totalprice"))), 2)
        .cast("double")
        .alias("joined_totalprice"),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch — Bar-Yossef et al. 2002
# ("Counting distinct elements in a data stream"). Hash every key into
# [0, 2^28); keep only the k smallest distinct hash values; estimate
# |D| ≈ (k-1) * 2^28 / h_(k). Unlike HLL, every step here is exact
# integer/md5 arithmetic that DuckDB reproduces bit-for-bit, so the
# ESTIMATE itself is value-checked cross-engine — a sketch family you
# can regression-test exactly.
#
# Scale shape: the k-min set is a mergeable summary. Spark's
# TakeOrdered (orderBy+limit) computes per-partition k-min partials
# and merges them on the driver — which IS the KMV merge operation —
# so no global sort ever happens and the working set after the
# distinct is k rows regardless of corpus size. Sketch union (for
# distinct-of-OR across filters/days/shards) re-mins the concatenated
# k-min sets: 2k rows in, k rows out, no rescan.
# ---------------------------------------------------------------------------

KMV_K = 256
KMV_SPACE = 16**7  # 28-bit digest space


def _kmv_estimate_col(k: int) -> Column:
    """THE KMV read-out contract, Spark side (_kmv_estimate_sql's twin):
    (k-1)*space/h_(k) for a full sketch; a sketch smaller than k holds
    every distinct key, so its size IS the exact answer. One
    implementation for both the single-set and union sketches — a fix
    to the partial-sketch guard or estimator constant cannot skew only
    one of them."""
    return F.round(
        F.when(
            F.col("sketch_size") < k, F.col("sketch_size").cast("double")
        ).otherwise((k - 1) * F.lit(float(KMV_SPACE)) / F.col("kth_hash")),
        4,
    )


def _kmv_estimate_sql(minset: str, k: int) -> str:
    return (
        f"SELECT MAX(dg) AS kth_hash, CAST(COUNT(*) AS BIGINT) AS sketch_size "
        f"FROM (SELECT dg FROM {minset} ORDER BY dg LIMIT {k})"
    )


def _kmv_oracle() -> str:
    digest = _DIGEST_SQL.format(t="CAST(l_orderkey AS VARCHAR)")
    return f"""
    WITH keys AS (SELECT DISTINCT l_orderkey FROM lineitem),
    hashed AS (SELECT DISTINCT {digest} AS dg FROM keys),
    sk AS ({_kmv_estimate_sql('hashed', KMV_K)})
    SELECT CAST((SELECT COUNT(*) FROM keys) AS BIGINT) AS exact_distinct,
           CAST(kth_hash AS BIGINT) AS kth_hash,
           ROUND(CASE WHEN sketch_size < {KMV_K} THEN CAST(sketch_size AS DOUBLE)
                      ELSE ({KMV_K} - 1) * {KMV_SPACE}.0 / kth_hash END,
                 4) AS kmv_estimate
    FROM sk
    """


@_register("kmv_distinct_orders", _kmv_oracle())
def kmv_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch over lineitem's order keys: keep the
    {KMV_K} smallest 28-bit md5 hashes of the distinct keys; estimate
    distinct = (k-1)*2^28 / h_(k). The exact count rides along as
    ground truth (affordable at test SF; production keeps only the
    k-row sketch). Every value — including the estimate — is exact
    md5/integer arithmetic mirrored in the oracle.

    Scale shape: groupBy-distinct aggregates map-side; orderBy+limit
    compiles to TakeOrdered = per-partition k-min partials merged on
    the driver (the KMV merge), so the post-distinct working set is k
    rows at any corpus size. k trades accuracy for size
    (err ~ 1/sqrt(k)); 2^10-2^12 is the production sweet spot."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    keys = li.distinct()
    hashed = keys.select(
        _digest_col(F.col("l_orderkey").cast("string")).alias("dg")
    ).distinct()
    minset = hashed.orderBy("dg").limit(KMV_K)
    sk = minset.agg(
        F.max("dg").cast("bigint").alias("kth_hash"),
        F.count("*").cast("bigint").alias("sketch_size"),
    )
    exact = keys.agg(F.count("*").cast("bigint").alias("exact_distinct"))
    return exact.crossJoin(F.broadcast(sk)).select(
        "exact_distinct",
        "kth_hash",
        _kmv_estimate_col(KMV_K).alias("kmv_estimate"),
    )


KMV_UNION_K = 128


def _kmv_union_oracle() -> str:
    digest = _DIGEST_SQL.format(t="CAST(l_orderkey AS VARCHAR)")
    return f"""
    WITH r_keys AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'),
    a_keys AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'A'),
    r_min AS (SELECT DISTINCT {digest} AS dg FROM r_keys ORDER BY dg LIMIT {KMV_UNION_K}),
    a_min AS (SELECT DISTINCT {digest} AS dg FROM a_keys ORDER BY dg LIMIT {KMV_UNION_K}),
    merged AS (SELECT DISTINCT dg FROM (SELECT dg FROM r_min UNION ALL SELECT dg FROM a_min)),
    sk AS ({_kmv_estimate_sql('merged', KMV_UNION_K)})
    SELECT CAST((SELECT COUNT(*) FROM (SELECT l_orderkey FROM r_keys
                                       UNION SELECT l_orderkey FROM a_keys)) AS BIGINT)
             AS exact_union,
           CAST(kth_hash AS BIGINT) AS kth_hash,
           ROUND(CASE WHEN sketch_size < {KMV_UNION_K} THEN CAST(sketch_size AS DOUBLE)
                      ELSE ({KMV_UNION_K} - 1) * {KMV_SPACE}.0 / kth_hash END,
                 4) AS union_estimate
    FROM sk
    """


@_register("kmv_union_returnflags", _kmv_union_oracle())
def kmv_union_returnflags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch UNION: distinct orders with returned ('R') or
    defective ('A') lines, estimated by merging the two flags'
    independent k-min sketches — concatenate the two k-row sets,
    re-take the k minima, read the estimate off the merged sketch. The
    exact union count rides along as ground truth.

    Scale shape: this is the operation that makes KMV a *system*
    primitive — per-day/per-shard/per-filter sketches are built once
    (each a k-row summary via TakeOrdered partials) and any OR-set's
    cardinality is answered later from 2k rows with NO rescan of the
    fact table. Same md5 arithmetic as kmv_distinct_orders, so the
    merged estimate is value-checked cross-engine."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")

    def minset(flag: str) -> DataFrame:
        return (
            li.where(F.col("l_returnflag") == flag)
            .select("l_orderkey")
            .distinct()
            .select(_digest_col(F.col("l_orderkey").cast("string")).alias("dg"))
            .distinct()
            .orderBy("dg")
            .limit(KMV_UNION_K)
        )

    merged = minset("R").unionByName(minset("A")).distinct()
    sk = merged.orderBy("dg").limit(KMV_UNION_K).agg(
        F.max("dg").cast("bigint").alias("kth_hash"),
        F.count("*").cast("bigint").alias("sketch_size"),
    )
    exact = (
        li.where(F.col("l_returnflag").isin("R", "A"))
        .select("l_orderkey")
        .distinct()
        .agg(F.count("*").cast("bigint").alias("exact_union"))
    )
    return exact.crossJoin(F.broadcast(sk)).select(
        "exact_union",
        "kth_hash",
        _kmv_estimate_col(KMV_UNION_K).alias("union_estimate"),
    )


# ---------------------------------------------------------------------------
# Mergeable fixed-bin histogram quantile sketch. The 100 TB problem:
# exact percentiles need a global sort; a B-bin histogram needs one
# map-side-combinable aggregate with AT MOST B groups, merges across
# shards/days by addition, and answers any quantile later from B rows.
# Every sketch step (bin index, cumulative counts, midpoint read-out)
# is correctly-rounded double / integer arithmetic mirrored 1:1 in
# DuckDB, so the sketch estimates are value-checked; the exact
# percentiles ride along as ground truth.
# ---------------------------------------------------------------------------

QSK_BINS = 1024
QSK_QS = (0.5, 0.95, 0.99)


def _qsketch_oracle() -> str:
    q_rows = " UNION ALL ".join(f"SELECT {q} AS q" for q in QSK_QS)
    exact_case = " ".join(
        f"WHEN q = {q} THEN quantile_cont(value, {q})" for q in QSK_QS
    )
    return f"""
    WITH vals AS (
      SELECT value FROM events WHERE value IS NOT NULL
    ),
    ext AS (
      SELECT MIN(value) AS vmin, MAX(value) AS vmax,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM vals
    ),
    binned AS (
      SELECT CASE WHEN vmax = vmin THEN CAST(0 AS BIGINT)
                  ELSE LEAST({QSK_BINS} - 1,
                             CAST(FLOOR((value - vmin) / (vmax - vmin) * {QSK_BINS})
                                  AS BIGINT)) END
               AS bin,
             COUNT(*) AS cnt
      FROM vals CROSS JOIN ext
      GROUP BY 1
    ),
    cum AS (
      SELECT bin, SUM(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
      FROM binned
    ),
    qs AS ({q_rows}),
    hit AS (
      SELECT q, MIN(bin) AS qbin
      FROM qs CROSS JOIN ext JOIN cum ON cum >= CAST(ceil(q * n) AS BIGINT)
      GROUP BY q
    ),
    exact AS (
      SELECT q, ROUND(CASE {exact_case} END, 4) AS exact
      FROM qs CROSS JOIN events
      GROUP BY q
    )
    SELECT q,
           ROUND(vmin + (qbin + 0.5) * (vmax - vmin) / {QSK_BINS}, 4) AS est,
           exact
    FROM hit CROSS JOIN ext JOIN exact USING (q)
    ORDER BY q
    """


@_register("quantile_sketch_events", _qsketch_oracle())
def quantile_sketch_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram quantile sketch over events.value: equal-width bins
    between the observed extent, cumulative counts, bin-midpoint
    read-out for p50/p95/p99 next to the exact percentiles.

    Scale shape: the extent pass and the bin aggregate are single
    map-side-combined shuffles with bounded output (1 row, then <=
    QSK_BINS rows); the cumulative window orders <= QSK_BINS rows on
    one partition — bounded, not data-scale (contrast: a percentile
    over the raw column sorts the corpus). Per-shard histograms merge
    by adding counts, so daily jobs answer any later quantile without
    re-scanning. The exact column is test-SF ground truth; production
    keeps only the histogram."""
    from pyspark.sql import Window

    # NULL values are excluded in BOTH engines: Spark's unpartitioned
    # ORDER BY bin sorts a NULL bin NULLS FIRST while DuckDB's window
    # sorts it NULLS LAST, so an unfiltered NULL row would land in
    # opposite ends of the cumulative sum and skew every quantile
    # differently per engine (the bootstrap_ci_mean convention)
    e = (
        load_table(spark, sf_dir, "events")
        .select("value")
        .where(F.col("value").isNotNull())
    )
    ext = e.agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.count("*").cast("bigint").alias("n"),
    ).localCheckpoint(eager=True)  # 1 row, read by binning AND read-out:
    # without the checkpoint each consumer re-runs the corpus extent scan
    binned = (
        e.crossJoin(F.broadcast(ext))
        .select(
            # Degenerate extent (all values equal) puts everything in bin
            # 0 instead of dividing by zero; est then reads out ~vmin.
            F.when(F.col("vmax") == F.col("vmin"), F.lit(0).cast("bigint"))
            .otherwise(
                F.least(
                    F.lit(QSK_BINS - 1),
                    F.floor(
                        (F.col("value") - F.col("vmin"))
                        / (F.col("vmax") - F.col("vmin"))
                        * QSK_BINS
                    ).cast("bigint"),
                )
            )
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
    )
    cum = binned.select(
        "bin",
        F.sum("cnt")
        .over(Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    qs = spark.createDataFrame([(q,) for q in QSK_QS], "q double")
    hit = (
        qs.crossJoin(F.broadcast(ext))
        .join(F.broadcast(cum), F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("q", "vmin", "vmax")
        .agg(F.min("bin").alias("qbin"))
    )
    exact_wide = e.agg(
        *[
            F.round(F.expr(f"percentile(value, {q})"), 4).alias(f"ex{i}")
            for i, q in enumerate(QSK_QS)
        ]
    )
    exact_expr = None
    for i, q in enumerate(QSK_QS):
        branch = F.when(F.col("q") == q, F.col(f"ex{i}"))
        exact_expr = branch if exact_expr is None else exact_expr.when(
            F.col("q") == q, F.col(f"ex{i}")
        )
    return (
        hit.crossJoin(F.broadcast(exact_wide))
        .select(
            "q",
            F.round(
                F.col("vmin")
                + (F.col("qbin") + 0.5) * (F.col("vmax") - F.col("vmin")) / QSK_BINS,
                4,
            ).alias("est"),
            exact_expr.alias("exact"),
        )
        .orderBy("q")
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct count — the register-based production sketch
# beside KMV (KMV keeps k hashes; HLL keeps 2^P 5-bit ranks and merges
# by per-register MAX, which is what makes it the warehouse-standard
# approx_count_distinct summary). Same 28-bit md5 digest contract:
# low P bits pick the register, the remaining 20 bits give the rank
# via the minimal-binary-length identity rank = 21 - len(bin(w)) —
# exact integer arithmetic in both engines. The indicator sum
# Σ 2^(-M_j) is a sum of dyadic rationals ≥ 2^-21 with magnitude
# < 2^9 — EXACTLY representable in double and order-independent, so
# even the estimate is value-checked cross-engine (the KMV property,
# kept for the harder sketch).
# ---------------------------------------------------------------------------

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
HLL_RANK_BITS = 28 - HLL_P  # 20-bit rank domain -> max rank 21
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)  # Flajolet et al. 2007


def _hll_oracle() -> str:
    digest = _DIGEST_SQL.format(t="CAST(user_id AS VARCHAR)")
    return f"""
    WITH pairs AS (SELECT DISTINCT event_type, user_id FROM events),
    hashed AS (
      SELECT event_type, {digest} AS dg FROM pairs
    ),
    rr AS (
      SELECT event_type, dg & {HLL_M - 1} AS reg, dg >> {HLL_P} AS w
      FROM hashed
    ),
    regs AS (
      SELECT event_type, reg,
             MAX(CASE WHEN w > 0 THEN {HLL_RANK_BITS + 1} - length(bin(w))
                      ELSE {HLL_RANK_BITS + 1} END) AS m_j
      FROM rr GROUP BY event_type, reg
    ),
    sk AS (
      SELECT event_type,
             SUM(pow(2.0, -m_j)) + ({HLL_M} - COUNT(*)) * 1.0 AS s,
             {HLL_M} - COUNT(*) AS v
      FROM regs GROUP BY event_type
    ),
    est AS (
      SELECT event_type, v,
             CAST({_HLL_ALPHA!r} AS DOUBLE) * {HLL_M} * {HLL_M} / s AS raw
      FROM sk
    ),
    fin AS (
      SELECT event_type,
             CASE WHEN raw <= 2.5 * {HLL_M} AND v > 0
                  THEN {HLL_M} * ln({HLL_M} * 1.0 / v)
                  ELSE raw END AS hll
      FROM est
    ),
    exact AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS exact_distinct
      FROM pairs GROUP BY event_type
    )
    SELECT e.event_type, e.exact_distinct,
           ROUND(f.hll, 4) AS hll_estimate,
           ROUND(ABS(f.hll - e.exact_distinct) / e.exact_distinct, 4) AS rel_err
    FROM exact e JOIN fin f ON e.event_type = f.event_type
    ORDER BY e.event_type
    """


@_register("hll_distinct_users", _hll_oracle())
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type HLL(P={HLL_P}) distinct-user estimate with the
    small-range linear-counting correction, beside the exact count and
    relative error.

    Scale shape: the register table is the mergeable summary — after
    the map-side distinct, every group collapses to ≤{HLL_M} (register,
    max-rank) rows whatever the corpus size; cross-shard/day union is
    per-register MAX over 2×{HLL_M} rows, no rescan (the same merge
    contract the KMV family documents, at 6 bits per register instead
    of 28 per kept hash)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    pairs = ev.distinct().localCheckpoint(eager=True)
    exact = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_distinct")
    )
    dg = _digest_col(F.col("user_id").cast("string"))
    rr = pairs.select(
        "event_type",
        dg.bitwiseAND(HLL_M - 1).alias("reg"),
        F.shiftright(dg, HLL_P).alias("w"),
    )
    rank = F.when(
        F.col("w") > 0, F.lit(HLL_RANK_BITS + 1) - F.length(F.bin("w"))
    ).otherwise(F.lit(HLL_RANK_BITS + 1))
    regs = rr.select("event_type", "reg", rank.alias("r")).groupBy(
        "event_type", "reg"
    ).agg(F.max("r").alias("m_j"))
    sk = regs.groupBy("event_type").agg(
        (
            F.sum(F.pow(F.lit(2.0), -F.col("m_j")))
            + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(1.0)
        ).alias("s"),
        (F.lit(HLL_M) - F.count(F.lit(1))).alias("v"),
    )
    raw = F.lit(_HLL_ALPHA) * HLL_M * HLL_M / F.col("s")
    hll = F.when(
        (raw <= 2.5 * HLL_M) & (F.col("v") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(HLL_M) * F.lit(1.0) / F.col("v")),
    ).otherwise(raw)
    fin = sk.select("event_type", hll.alias("hll"))
    return (
        exact.join(fin, "event_type")
        .select(
            "event_type",
            "exact_distinct",
            F.round(F.col("hll"), 4).alias("hll_estimate"),
            F.round(
                F.abs(F.col("hll") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence intervals (Chamandy et al. 2012, "Ask
# your distribution" / the standard distributed bootstrap): classical
# resampling needs the row count up front and a global multinomial
# draw; the Poisson approximation gives every row an independent
# Poisson(1) replicate weight, which is embarrassingly parallel — THE
# bootstrap you can run in one pass over 100 TB. Weights derive from
# the 28-bit md5 digest of (event_id, replicate) through the exact
# integer inverse-CDF thresholds below, so both engines draw the
# identical "random" weights; weighted sums accumulate in DECIMAL, so
# every replicate mean — and therefore the CI — is value-checked
# cross-engine.
# ---------------------------------------------------------------------------

BOOT_B = 64  # replicates; CI = 2nd / 63rd order statistic (~2.5/97.5%)

# P[Poisson(1) <= k] * 2^28, exact integers (k >= 8 is ~1e-9: weight 8)
_POIS_TH = [
    (0, 98751885),
    (1, 197503771),
    (2, 246879713),
    (3, 263338361),
    (4, 267453023),
    (5, 268275955),
    (6, 268413111),
    (7, 268432704),
]


def _boot_weight_sql(dg: str) -> str:
    branches = " ".join(f"WHEN {dg} < {t} THEN {k}" for k, t in _POIS_TH)
    return f"(CASE {branches} ELSE 8 END)"


def _boot_weight_col(dg: Column) -> Column:
    w = F.when(dg < _POIS_TH[0][1], F.lit(0))
    for k, t in _POIS_TH[1:]:
        w = w.when(dg < t, F.lit(k))
    return w.otherwise(F.lit(8))


def _bootstrap_oracle() -> str:
    digest = _DIGEST_SQL.format(
        t="CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)"
    )
    return f"""
    WITH ev AS (
      SELECT event_type, event_id, CAST(value AS DECIMAL(18,6)) AS v
      FROM events WHERE value IS NOT NULL
    ),
    rep AS (
      SELECT event_type, event_id, v, b, {_boot_weight_sql(digest)} AS w
      FROM ev CROSS JOIN (SELECT unnest(range(0, {BOOT_B})) AS b) reps
    ),
    means AS (
      SELECT event_type, b,
             CASE WHEN SUM(w) > 0
                  THEN CAST(SUM(w * v) AS DOUBLE) / SUM(w) END AS mean_b
      FROM rep GROUP BY event_type, b
    ),
    ci AS (
      SELECT event_type, list(mean_b ORDER BY mean_b) AS ms
      FROM means WHERE mean_b IS NOT NULL GROUP BY event_type
    ),
    base AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_value
      FROM ev GROUP BY event_type
    )
    SELECT base.event_type, n_rows,
           ROUND(mean_value, 6) AS mean_value,
           ROUND(ms[2], 6) AS ci_lo,
           ROUND(ms[{BOOT_B - 1}], 6) AS ci_hi
    FROM base JOIN ci ON base.event_type = ci.event_type
    ORDER BY base.event_type
    """


@_register("bootstrap_ci_mean", _bootstrap_oracle())
def bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type mean of `value` with a {BOOT_B}-replicate Poisson
    bootstrap CI (2nd/63rd order statistics of the replicate means).

    Scale shape: the replicate expansion is map-side (x{BOOT_B}) and
    collapses immediately in the partial aggregate to |types|x{BOOT_B}
    groups — the wire carries replicate sums, never resampled rows;
    the order-statistic cut runs over a {BOOT_B}-element array per
    group (bounded-cardinality sort_array, not a window). One corpus
    pass, one tiny shuffle: the reason Poisson bootstrap replaced the
    multinomial one for distributed data."""
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type", "event_id", F.col("value").cast("decimal(18,6)").alias("v")
        )
    )
    # the x{B} replicate expansion (and its md5 per expanded row)
    # inherits INPUT splits — a single small parquet file would run it
    # on one task (the embedding_top_pc lesson); placement is free to
    # change because every aggregate downstream is exact
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    rep = ev.repartition(n_part).select(
        "event_type",
        "event_id",
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
    )
    dg = _digest_col(
        F.concat_ws(
            ":", F.col("event_id").cast("string"), F.col("b").cast("string")
        )
    )
    means = (
        rep.select("event_type", "b", "v", _boot_weight_col(dg).alias("w"))
        .groupBy("event_type", "b")
        .agg(F.sum("w").alias("sw"), F.sum(F.col("w") * F.col("v")).alias("swv"))
        .select(
            "event_type",
            "b",
            F.when(
                F.col("sw") > 0, F.col("swv").cast("double") / F.col("sw")
            ).alias("mean_b"),
        )
    )
    # drop NULL mean_b (all-zero-weight replicates) EXPLICITLY before
    # the collect: Spark's collect_list happens to skip NULLs but
    # DuckDB's list() keeps them (sorted last), so the order-statistic
    # indices would drift — the filter is mirrored in the oracle's
    # WHERE mean_b IS NOT NULL
    ci = (
        means.where(F.col("mean_b").isNotNull())
        .groupBy("event_type")
        .agg(F.sort_array(F.collect_list("mean_b")).alias("ms"))
    )
    base = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("mean_value"),
    )
    return (
        base.join(ci, "event_type")
        .select(
            "event_type",
            "n_rows",
            F.round("mean_value", 6).alias("mean_value"),
            # a short replicate array (only possible when replicates
            # were dropped as NULL above) yields NULL order statistics,
            # matching DuckDB's out-of-bounds ms[i] = NULL; unguarded
            # element_at would THROW under ANSI mode
            F.round(
                F.when(F.size("ms") >= 2, F.element_at("ms", 2)), 6
            ).alias("ci_lo"),
            F.round(
                F.when(
                    F.size("ms") >= BOOT_B - 1, F.element_at("ms", BOOT_B - 1)
                ),
                6,
            ).alias("ci_hi"),
        )
        .orderBy("event_type")
    )
