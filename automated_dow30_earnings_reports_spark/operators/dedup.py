"""Deduplication operators (SURVEY.md §2.11 + A4).

Four tiers, all built from JVM builtins (no Python UDFs), each with a
DuckDB oracle. Hash functions are md5-based because md5 is bit-identical
across engines; minhashing uses the *lexicographic* min of
md5(seed || shingle), which is a valid min-wise hash family
(Broder 1997, "On the resemblance and containment of documents";
banding analysis per Leskovec/Rajaraman/Ullman, Mining of Massive
Datasets ch.3). SimHash follows Charikar 2002 ("Similarity estimation
techniques from rounding algorithms").

Scale design (100 TB):
  - exact dedup: hash-groupBy — one shuffle on the digest, map-side
    partial agg. The canonical pattern for petabyte dedup.
  - MinHash-LSH: signatures are computed in ONE groupBy over exploded
    shingles (H aggregate columns, no Hx row blowup); candidates come
    from a shuffle on (band_id, band_key). Bucket skew (a popular band
    key) is the known hazard — AQE skew-join handles moderate cases;
    degenerate buckets should be df-capped upstream.
  - exact n-gram jaccard: inverted-index self-join on shingle. At scale
    you cap shingle document-frequency before the join (a shingle in
    10k docs creates 10k^2 pairs and can't indicate near-duplication
    anyway); at test SF the join is exact and uncapped.
  - SimHash: 64 conditional sums per doc — embarrassingly parallel,
    single groupBy; near-dup candidates via 16-bit band equality.

Reference tie-in: the reference's only dedup is Python set-by-href
(src/enhanced_selenium_scraper.py:112-120, :130, :706) — the exact
tier; near-dup tiers are the BASELINE.json mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.tables import load_table, spread

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _read_idx(spark, path):
    """Index-table read with the process-cached schema (r11):
    skips the per-call parquet footer inference (~60-130 ms) for
    tables whose column set is process-stable — every index table
    here. Delegates to parquet_lake.read_known_schema."""
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        read_known_schema,
    )

    return read_known_schema(spark, path)


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# shared shingling
# ---------------------------------------------------------------------------

SHINGLE_K = 3  # word 3-shingles


def tokens_col(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def shingles_col(text: Column, k: int = SHINGLE_K) -> Column:
    """Word k-shingles as an array column ([] when the doc has < k words)."""
    t = tokens_col(text)
    make = F.transform(
        F.sequence(F.lit(1), F.size(t) - (k - 1)),
        lambda i: F.array_join(F.slice(t, i, k), " "),
    )
    return F.when(F.size(t) >= k, make).otherwise(F.array().cast("array<string>"))


def doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → distinct (doc_id, shingle) rows. Distinctness is
    per-document, so array_distinct BEFORE the explode produces the set
    map-side — no shuffle, unlike explode + DataFrame distinct (which
    would shuffle every shingle row in the corpus)."""
    d = spread(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.explode(F.array_distinct(shingles_col(F.col("text")))).alias("shingle"),
    )


# DuckDB equivalent of doc_shingles (list comprehension mirrors transform).
_SHD_SQL = """
    toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(CASE WHEN len(t) >= 3
                    THEN [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)]
                    ELSE CAST([] AS VARCHAR[]) END) AS shingle
      FROM toks
    ),
    shd AS (SELECT DISTINCT doc_id, shingle FROM sh)
"""


def doc_shingle_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → distinct (doc_id, h) rows where h is the 28-bit
    md5-digest integer of each shingle — the MinHash tier's working set.

    Narrower than doc_shingles on purpose (VERDICT r2 "Next round" #6):
    the tier persists this across four plan branches, and 8-byte ints
    both persist smaller than shingle strings and make every downstream
    shuffle/join key an integer compare. Hashing happens INSIDE the
    shingle array (transform + array_distinct) so the per-document set
    is still built map-side with zero shuffles, and the distinct is
    over hashes — in-doc collisions collapse identically in the oracle
    (list_distinct over the same transform). Hashed-shingle jaccard is
    the production form (Lee et al. 2022 hash their n-grams); the
    string-exact baseline remains dedup_ngram_jaccard."""
    return _shingle_hashes_of(spread(load_table(spark, sf_dir, "documents")))


def _shingle_hashes_of(docs: DataFrame) -> DataFrame:
    """(doc_id, h) for an arbitrary documents frame — the per-batch
    form: restricting ``docs`` BEFORE this call keeps the shingling
    cost proportional to the batch (dedup_incremental_index's ingest
    contract)."""
    hs = F.array_distinct(
        F.transform(
            shingles_col(F.col("text")),
            lambda s: F.conv(F.substring(F.md5(s.cast("binary")), 1, 7), 16, 10).cast(
                "bigint"
            ),
        )
    )
    return docs.select("doc_id", F.explode(hs).alias("h"))


def _h_of(expr: str) -> str:
    """DuckDB twin of the 28-bit digest: first 7 md5 nibbles as int."""
    nib = f"(strpos('0123456789abcdef', substr(md5({expr}), {{p}}, 1)) - 1)"
    return " + ".join(nib.format(p=p) + f" * {16 ** (7 - p)}" for p in range(1, 8))


# (doc_id, h) twin of doc_shingle_hashes: hash each shingle inside the
# list, dedupe in-list, then unnest.
_SHD_H_SQL = f"""
    toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ),
    shd AS (
      SELECT doc_id,
             unnest(list_distinct(CASE WHEN len(t) >= 3
                    THEN [{_h_of("array_to_string(t[i:i+2], ' ')")}
                          FOR i IN range(1, len(t) - 1)]
                    ELSE CAST([] AS BIGINT[]) END)) AS h
      FROM toks
    )
"""


# ---------------------------------------------------------------------------
# Tier 1 — exact dedup (A4: dropDuplicates by content hash)
# ---------------------------------------------------------------------------


@_register(
    "dedup_exact",
    """
    WITH canon AS (
      SELECT doc_id, md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
      FROM documents
    )
    SELECT fp, CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id, COUNT(*) AS n_copies
    FROM canon GROUP BY fp ORDER BY keeper_doc_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by canonicalized content hash: lowercase, collapse
    whitespace, md5, keep the lowest doc_id per digest (deterministic
    survivor, unlike bare dropDuplicates)."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.regexp_replace("text", r"\s+", " ")).cast("binary"))
    return (
        d.select(fp.alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_copies"))
        .orderBy("keeper_doc_id")
    )


# ---------------------------------------------------------------------------
# Tier 2 — MinHash + LSH banding
# ---------------------------------------------------------------------------

MINHASH_H = 12  # signature length
LSH_R = 2  # rows per band -> 6 bands
LSH_BANDS = MINHASH_H // LSH_R
NEARDUP_THRESHOLD = 0.8


# Universal-hash family over a 28-bit digest: h_i(x) = (A_i*H + B_i) mod P.
# One md5 per shingle (instead of one per shingle PER SEED) + 12 integer
# multiply-adds — ~12x less hashing in the hottest loop. Products stay
# under 2^59 (A_i < 2^31, H < 2^28), so bigint arithmetic is exact and
# identical on both engines. Min-wise validity per Carter-Wegman
# universal hashing; min of h_i over the set is the MinHash estimator.
MINHASH_P = 4294967311  # prime > 2^32

# Process-level caches for pure-constant Column expression templates
# (r11): building them is py4j-roundtrip-bound and they never vary.
_SIG_AGGS_CACHE: dict = {}
_BAND_EXPLODE_CACHE: dict = {}
MINHASH_A = [2 * i * 1_000_003 + 12_345 for i in range(1, MINHASH_H + 1)]
MINHASH_B = [i * 97_911 + 7 for i in range(MINHASH_H)]


def minhash_signatures(
    shd: DataFrame, h: int = MINHASH_H, with_size: bool = False
) -> DataFrame:
    """One column per hash fn: min of (A_i*H + B_i) mod P over the
    pre-hashed (doc_id, h) working set (doc_shingle_hashes). Single
    groupBy — signature width is columns, not rows. Takes the hashed
    form ONLY: a silent string-column fallback would have to re-derive
    the md5 digest bit-identically to doc_shingle_hashes to stay
    correct, and an unexercised duplicate of that contract is exactly
    the kind of code that rots.

    ``with_size`` additionally emits ``sz`` = COUNT(*) per doc (the
    shingle-set size) in the SAME aggregation — the persisted-index
    build needs both, and riding one groupBy saves a whole second
    pass over the (doc_id, h) working set (r10 optimization).

    The aggregation COLUMNS are process-cached (r11): building the 12
    Carter-Wegman expressions is ~100 py4j round trips, measured
    300-700 ms per call on this box and paid once per index build,
    append, and streaming staging. Columns are immutable expression
    templates, so reusing the identical objects across plans cannot
    change any result."""
    key = (h, with_size)
    aggs = _SIG_AGGS_CACHE.get(key)
    if aggs is None:
        H = F.col("h")
        aggs = [
            F.min((H * MINHASH_A[i] + MINHASH_B[i]) % MINHASH_P).alias(f"m{i}")
            for i in range(h)
        ]
        if with_size:
            aggs.append(F.count("*").alias("sz"))
        _SIG_AGGS_CACHE[key] = aggs
    return shd.groupBy("doc_id").agg(*aggs)


def lsh_band_keys(sig: DataFrame, bands: int = LSH_BANDS, r: int = LSH_R) -> DataFrame:
    """Unpivot signatures to (doc_id, band_id, band_key) rows. The
    explode column is process-cached like the minhash aggs (r11) —
    pure-constant expression template, one build per process."""
    key = (bands, r)
    e = _BAND_EXPLODE_CACHE.get(key)
    if e is None:
        entries = [
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws(",", *[F.col(f"m{b * r + j}") for j in range(r)]).cast("binary")
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
        e = F.explode(F.array(*entries)).alias("e")
        _BAND_EXPLODE_CACHE[key] = e
    return sig.select("doc_id", e).select("doc_id", "e.band_id", "e.band_key")


LSH_BUCKET_CAP = 50


def lsh_candidates(bandkeys: DataFrame, bucket_cap: int = LSH_BUCKET_CAP) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any band bucket.
    The self-join shuffles on (band_id, band_key) — the LSH scale trick.

    Buckets larger than ``bucket_cap`` are dropped before pairing: a
    band key shared by B documents emits B² pairs, and a bucket that
    hot is a degenerate hash region (boilerplate corpus), not a
    near-dup signal. This bounds per-bucket work the same way the
    shingle DF cap bounds the tier-3 join — and the oracle applies the
    identical cap, so the scale semantics stay value-checked.

    The size gate is a window count over the same (band_id, band_key)
    partitioning the self-join shuffles on anyway — one shuffle total,
    no extra aggregate+join round trip."""
    sized = (
        bandkeys.withColumn(
            "bsz", F.count("*").over(Window.partitionBy("band_id", "band_key"))
        )
        .where(F.col("bsz") <= bucket_cap)
        .drop("bsz")
    )
    a = sized.alias("a")
    b = sized.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def verified_jaccard(
    cand: DataFrame, shd: DataFrame, key: str, sizes: DataFrame | None = None
) -> DataFrame:
    """Exact jaccard for candidate pairs via set intersection on `key`
    (shingle strings for the exact tiers, 28-bit hashes for the MinHash
    tier's narrow working set). ``sizes`` lets an index-backed caller
    supply the STORED (doc_id, sz) table instead of recomputing it from
    shd — part of the persisted-index contract (sizes must survive the
    parquet round trip, so the probe must not silently re-derive
    them)."""
    if sizes is None:
        sizes = shd.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sa = shd.select(F.col("doc_id").alias("id_a"), key)
    sb = shd.select(F.col("doc_id").alias("id_b"), key)
    inter = (
        cand.join(sa, "id_a")
        .join(sb, ["id_b", key])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("i"))
    )
    za = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(za, "id_a")
        .join(zb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("i") / (F.col("sz_a") + F.col("sz_b") - F.col("i"))).alias("jaccard"),
        )
    )


def _verify_new_old_pairs(
    cand: DataFrame, shd: DataFrame, sizes: DataFrame | None = None
) -> DataFrame:
    """The shared verification tail of the incremental-batch and
    persisted-index probes: exact jaccard for (new_id, old_id)
    candidates over the 28-bit hash working set through THE
    verified_jaccard contract, thresholded and 3-dp rounded. One
    jaccard implementation — a threshold or denominator fix cannot
    miss a copy."""
    ver = verified_jaccard(
        cand.select(F.col("new_id").alias("id_a"), F.col("old_id").alias("id_b")),
        shd,
        "h",
        sizes=sizes,
    )
    return (
        ver.where(F.col("jaccard") >= NEARDUP_THRESHOLD)
        .select(
            F.col("id_a").alias("new_id"),
            F.col("id_b").alias("old_id"),
            F.round("jaccard", 3).alias("jaccard"),
        )
        .orderBy("new_id", "old_id")
    )


def _lsh_cand_sql_prefix() -> str:
    """The shared WITH-body from the (doc_id, h) working set through
    the LSH candidate pairs — the 28-bit digest CTE (_SHD_H_SQL ==
    Spark's doc_shingle_hashes), the same Carter-Wegman mixes as
    minhash_signatures, banding, the bucket cap, and the bucket
    self-join. Used by _minhash_oracle and the dedup_lsh_quality
    oracle so the candidate-set construction cannot drift."""
    mins = ",\n             ".join(
        f"min((h * {MINHASH_A[i]} + {MINHASH_B[i]}) % {MINHASH_P}) AS m{i}"
        for i in range(MINHASH_H)
    )
    band_rows = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {b} AS band_id, "
        + "md5("
        + " || ',' || ".join(
            f"CAST(m{b * LSH_R + j} AS VARCHAR)" for j in range(LSH_R)
        )
        + ") AS band_key FROM sig"
        for b in range(LSH_BANDS)
    )
    return f"""{_SHD_H_SQL},
    sig AS (
      SELECT doc_id,
             {mins}
      FROM shd GROUP BY doc_id
    ),
    bandkeys AS (
      {band_rows}
    ),
    smallbuckets AS (
      SELECT band_id, band_key FROM bandkeys
      GROUP BY band_id, band_key HAVING count(*) <= {LSH_BUCKET_CAP}
    ),
    sized AS (
      SELECT bk.doc_id, bk.band_id, bk.band_key
      FROM bandkeys bk JOIN smallbuckets USING (band_id, band_key)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sized a
      JOIN sized b ON a.band_id = b.band_id AND a.band_key = b.band_key
                   AND a.doc_id < b.doc_id
    )"""


def _minhash_oracle() -> str:
    return f"""
    WITH {_lsh_cand_sql_prefix()},
    sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS i
      FROM cand c
      JOIN shd sa ON sa.doc_id = c.id_a
      JOIN shd sb ON sb.doc_id = c.id_b AND sb.h = sa.h
      GROUP BY c.id_a, c.id_b
    )
    SELECT id_a, id_b,
           ROUND(1.0 * i / (za.sz + zb.sz - i), 3) AS jaccard
    FROM inter
    JOIN sizes za ON za.doc_id = id_a
    JOIN sizes zb ON zb.doc_id = id_b
    WHERE 1.0 * i / (za.sz + zb.sz - i) >= {NEARDUP_THRESHOLD}
    ORDER BY id_a, id_b
    """


@_register("dedup_minhash_lsh", _minhash_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup detection: shingle → 12-wide signature →
    6 bands of 2 → bucket self-join → exact-jaccard verification ≥ 0.8.

    The working set feeds four plan branches (signatures, both probe
    sides of the verification join, sizes); persist() materializes the
    explode once instead of four times — on a cluster this is the
    difference between one and four full scans of the corpus. The
    persisted projection is (doc_id, h) 8-byte ints rather than shingle
    strings (doc_shingle_hashes) — smaller cached blocks, integer join
    keys in every downstream shuffle, and the md5 hot loop runs once at
    materialization instead of per branch.
    ContextCleaner frees the blocks once the query's RDDs are GC'd."""
    shd = doc_shingle_hashes(spark, sf_dir).localCheckpoint(eager=True)
    sig = minhash_signatures(shd)
    cand = lsh_candidates(lsh_band_keys(sig))
    return (
        verified_jaccard(cand, shd, key="h")
        .where(F.col("jaccard") >= NEARDUP_THRESHOLD)
        .select("id_a", "id_b", F.round("jaccard", 3).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


def _lsh_quality_oracle() -> str:
    return f"""
    WITH {_lsh_cand_sql_prefix()},
    sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
    inter_all AS (
      SELECT sa.doc_id AS id_a, sb.doc_id AS id_b, count(*) AS i
      FROM shd sa JOIN shd sb ON sb.h = sa.h AND sa.doc_id < sb.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT id_a, id_b
      FROM inter_all
      JOIN sizes za ON za.doc_id = id_a
      JOIN sizes zb ON zb.doc_id = id_b
      WHERE 1.0 * i / (za.sz + zb.sz - i) >= {NEARDUP_THRESHOLD}
    ),
    m AS (
      SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
             CAST((SELECT COUNT(*) FROM cand) AS BIGINT)  AS n_candidates,
             CAST((SELECT COUNT(*) FROM cand JOIN truth USING (id_a, id_b))
                  AS BIGINT) AS tp
    )
    SELECT n_truth, n_candidates, tp,
           ROUND(CASE WHEN n_candidates > 0
                 THEN CAST(tp AS DOUBLE) / n_candidates END, 6) AS precision,
           ROUND(CASE WHEN n_truth > 0
                 THEN CAST(tp AS DOUBLE) / n_truth END, 6) AS recall,
           ROUND(CASE WHEN n_candidates + n_truth > 0
                 THEN CAST(2 * tp AS DOUBLE) / (n_candidates + n_truth) END, 6)
             AS f1
    FROM m ORDER BY n_truth
    """


@_register("dedup_lsh_quality", _lsh_quality_oracle())
def dedup_lsh_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-set quality report for the MinHash-LSH tier: precision
    and recall of the banded candidate pairs against the EXACT
    hashed-shingle Jaccard ≥ {NEARDUP_THRESHOLD} ground truth — the
    b/r-curve tuning read a dedup team does before trusting the banding
    parameters (candidate precision = verification work wasted; recall
    = true near-dups the bands never surface).

    F1 uses the harmonic identity 2·tp/(n_cand+n_truth), so every
    ratio is one division of exact integers. The ground-truth
    inverted-index self-join is the LABELED exact baseline (the
    dedup_ngram_jaccard exemption) — the quality report is exactly the
    job you run at small scale to pick (bands, rows) before the
    banded form runs alone at 100 TB.

    Scale shape: one shingle working set (checkpointed, shared by the
    signature and truth branches), the banded bucket join from
    lsh_candidates (capped buckets), and three tiny count aggregates
    crossJoined into one row."""
    shd = doc_shingle_hashes(spark, sf_dir).localCheckpoint(eager=True)
    cand = lsh_candidates(lsh_band_keys(minhash_signatures(shd))).localCheckpoint(
        eager=True
    )
    # exact ground truth: the shared tier-3 edge generator over the
    # narrow int working set (one jaccard contract, not a re-inline)
    truth = _ngram_edges(shd, NEARDUP_THRESHOLD, key="h").localCheckpoint(eager=True)
    n_truth = truth.agg(F.count("*").cast("bigint").alias("n_truth"))
    n_cand = cand.agg(F.count("*").cast("bigint").alias("n_candidates"))
    tp = (
        cand.join(truth, ["id_a", "id_b"])
        .agg(F.count("*").cast("bigint").alias("tp"))
    )
    m = n_truth.crossJoin(n_cand).crossJoin(tp)
    return m.select(
        "n_truth",
        "n_candidates",
        "tp",
        F.round(
            F.when(
                F.col("n_candidates") > 0,
                F.col("tp").cast("double") / F.col("n_candidates"),
            ),
            6,
        ).alias("precision"),
        F.round(
            F.when(F.col("n_truth") > 0, F.col("tp").cast("double") / F.col("n_truth")),
            6,
        ).alias("recall"),
        F.round(
            F.when(
                F.col("n_candidates") + F.col("n_truth") > 0,
                (2 * F.col("tp")).cast("double")
                / (F.col("n_candidates") + F.col("n_truth")),
            ),
            6,
        ).alias("f1"),
    ).orderBy("n_truth")


# ---------------------------------------------------------------------------
# Tier 3 — exact n-gram jaccard via inverted index
# ---------------------------------------------------------------------------


@_register(
    "dedup_ngram_jaccard",
    f"""
    WITH {_SHD_SQL},
    sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
    inter AS (
      SELECT sa.doc_id AS id_a, sb.doc_id AS id_b, count(*) AS i
      FROM shd sa JOIN shd sb ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(1.0 * i / (za.sz + zb.sz - i), 3) AS jaccard
    FROM inter
    JOIN sizes za ON za.doc_id = id_a
    JOIN sizes zb ON zb.doc_id = id_b
    WHERE 1.0 * i / (za.sz + zb.sz - i) >= 0.5
    ORDER BY id_a, id_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs 3-gram jaccard ≥ 0.5 through an inverted-index
    self-join (no LSH approximation — the recall baseline the LSH tier
    is judged against). shd persisted: three plan branches."""
    shd = doc_shingles(spark, sf_dir).localCheckpoint(eager=True)
    sa = shd.select(F.col("doc_id").alias("id_a"), "shingle")
    sb = shd.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        sa.join(sb, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("i"))
    )
    sizes = shd.groupBy("doc_id").agg(F.count("*").alias("sz"))
    za = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.col("i") / (F.col("sz_a") + F.col("sz_b") - F.col("i"))
    return (
        inter.join(za, "id_a")
        .join(zb, "id_b")
        .where(jac >= 0.5)
        .select("id_a", "id_b", F.round(jac, 3).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Cluster assignment — connected components over near-dup pair edges.
# The step after pair detection in a real dedup pipeline: each document
# gets a cluster id (the component's min doc_id) so one keeper per
# cluster survives. Iterative min-label propagation in Spark; the oracle
# is exact via DuckDB's recursive CTE.
# ---------------------------------------------------------------------------


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """(id_a, id_b) undirected edges → (doc_id, cluster_id=min reachable
    id). Driver-loop label propagation: each round every node adopts the
    min label among itself and its neighbors; converges in O(component
    diameter) rounds. Lineage cut per round (localCheckpoint) — the
    iterative-algorithm pattern shared with the BFS crawl."""
    both = (
        edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        # Materialize the edge list ONCE. Edge generation upstream is the
        # expensive part (e.g. a shingle self-join); without this cut every
        # iteration's join would re-run that whole subplan. Probed (r5):
        # pre-repartitioning on dst before the cut does NOT let rounds
        # reuse the layout — under AQE the checkpointed LogicalRDD reports
        # unknown outputPartitioning, so the join re-exchanges regardless
        # (verified via executedPlan at sf0.1). The per-round exchange is
        # over the candidate EDGE set (orders below corpus size); a
        # many-round production deployment would persist `both` as a
        # bucketed table on dst to delete it.
        .localCheckpoint(eager=True)
    )
    labels = (
        both.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            both.join(labels, both.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .select(
                "doc_id",
                F.least(F.col("cluster_id"), F.coalesce("nmin", F.col("cluster_id"))).alias(
                    "new_cluster_id"
                ),
                "cluster_id",
            )
            .localCheckpoint(eager=True)
        )
        labels = updated.select("doc_id", F.col("new_cluster_id").alias("cluster_id"))
        if updated.filter(F.col("new_cluster_id") != F.col("cluster_id")).isEmpty():
            converged = True
            break
    if not converged:
        # a path-shaped component with diameter > max_iter would exit
        # here with non-minimal labels — wrong cluster assignments
        # with nothing breaking downstream. Fail loudly instead: the
        # caller raises max_iter (cost is per-round, graph-diameter
        # bounded), it does not get silently-split clusters.
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} rounds: "
            "a component's diameter exceeds max_iter; raise max_iter"
        )
    return labels


_COMPONENTS_SQL = f"""
    WITH RECURSIVE {_SHD_H_SQL},
    sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
    inter AS (
      SELECT sa.doc_id AS id_a, sb.doc_id AS id_b, count(*) AS i
      FROM shd sa JOIN shd sb ON sa.h = sb.h AND sa.doc_id < sb.doc_id
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes za ON za.doc_id = id_a
      JOIN sizes zb ON zb.doc_id = id_b
      WHERE 1.0 * i / (za.sz + zb.sz - i) >= 0.5
    ),
    und AS (
      SELECT id_a AS src, id_b AS dst FROM edges
      UNION ALL
      SELECT id_b, id_a FROM edges
    ),
    reach(node, label) AS (
      SELECT src, src FROM und
      UNION
      SELECT u.dst, r.label FROM reach r JOIN und u ON u.src = r.node
    ),
    comp AS (
      SELECT node                       AS doc_id,
             CAST(MIN(label) AS BIGINT) AS cluster_id
      FROM reach GROUP BY node
    )
"""


def _clusters_oracle() -> str:
    return f"""
    {_COMPONENTS_SQL}
    SELECT doc_id, cluster_id FROM comp ORDER BY doc_id
    """


def _ngram_edges(shd: DataFrame, threshold: float = 0.5, *, key: str) -> DataFrame:
    """Tier-3 near-dup pair edges: inverted-index self-join + exact
    jaccard ≥ threshold on `key` (the shared edge generator for
    clustering and retention; clustering runs it over 28-bit shingle
    hashes — integer join keys, hashed-jaccard semantics mirrored in
    the oracle)."""
    sa = shd.select(F.col("doc_id").alias("id_a"), key)
    sb = shd.select(F.col("doc_id").alias("id_b"), key)
    inter = (
        sa.join(sb, key)
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("i"))
    )
    sizes = shd.groupBy("doc_id").agg(F.count("*").alias("sz"))
    za = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(za, "id_a")
        .join(zb, "id_b")
        .where(F.col("i") / (F.col("sz_a") + F.col("sz_b") - F.col("i")) >= threshold)
        .select("id_a", "id_b")
    )


@_register("dedup_clusters", _clusters_oracle())
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: jaccard ≥ 0.5 pairs (tier-3 edges) → connected
    components → (doc_id, cluster_id). The oracle computes the same
    components with a recursive CTE, so the iterative Spark loop is
    value-checked, not just row-counted. The working set is the narrow
    (doc_id, h) projection, localCheckpoint-ed (materialized once for
    the three edge-plan branches, blocks ContextCleaner-reclaimed —
    unlike CacheManager persist entries)."""
    shd = doc_shingle_hashes(spark, sf_dir).localCheckpoint(eager=True)
    return connected_components(_ngram_edges(shd, key="h")).orderBy("doc_id")


@_register(
    "dedup_cluster_canonical",
    f"""
    {_COMPONENTS_SQL}
    SELECT doc_id,
           cluster_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY cluster_id
                                   ORDER BY d.n_chars DESC, doc_id ASC) = 1
                AS BIGINT) AS is_keeper
    FROM comp JOIN documents d USING (doc_id)
    ORDER BY doc_id
    """,
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention policy on near-dup clusters: within each connected
    component, keep the highest-quality member (longest text, ties to
    the lowest doc_id) and flag the rest for dropping — the decision
    step a dedup pipeline runs after clustering. The quality join and
    per-cluster ranking are one broadcast-or-shuffle join plus one
    window over cluster_id; cluster cardinalities are tiny, so the
    window never skews."""
    shd = doc_shingle_hashes(spark, sf_dir).localCheckpoint(eager=True)
    labels = connected_components(_ngram_edges(shd, key="h"))
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        labels.join(docs, "doc_id")
        .withColumn(
            "is_keeper", (F.row_number().over(w) == 1).cast("bigint")
        )
        .select("doc_id", "cluster_id", "is_keeper")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Tier 3b — document-frequency-capped candidate generation (the 100 TB
# form of the inverted-index join). A shingle appearing in d documents
# contributes O(d^2) candidate pairs; past a cap it cannot indicate
# near-duplication (it is boilerplate), so production dedup pipelines
# drop it BEFORE the self-join. Verification runs over the FULL
# (hashed) shingle sets, so precision is unchanged — the cap only
# bounds the quadratic term. Like the MinHash tier, the working set is
# the narrow (doc_id, h) projection (integer keys; hashed-shingle
# jaccard per Lee et al. 2022, mirrored in the oracle); the
# string-exact verifier remains dedup_ngram_jaccard.
# ---------------------------------------------------------------------------

MAX_SHINGLE_DF = 20
MIN_SHARED_SHINGLES = 3


@_register(
    "dedup_ngram_dfcap",
    f"""
    WITH {_SHD_H_SQL},
    rare AS (
      SELECT h FROM shd GROUP BY h HAVING count(*) <= {MAX_SHINGLE_DF}
    ),
    cand AS (
      SELECT sa.doc_id AS id_a, sb.doc_id AS id_b
      FROM shd sa
      JOIN rare r ON r.h = sa.h
      JOIN shd sb ON sb.h = sa.h AND sa.doc_id < sb.doc_id
      GROUP BY 1, 2 HAVING count(*) >= {MIN_SHARED_SHINGLES}
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS i
      FROM cand c
      JOIN shd sa ON sa.doc_id = c.id_a
      JOIN shd sb ON sb.doc_id = c.id_b AND sb.h = sa.h
      GROUP BY c.id_a, c.id_b
    )
    SELECT id_a, id_b,
           ROUND(1.0 * i / (za.sz + zb.sz - i), 3) AS jaccard
    FROM inter
    JOIN sizes za ON za.doc_id = id_a
    JOIN sizes zb ON zb.doc_id = id_b
    WHERE 1.0 * i / (za.sz + zb.sz - i) >= 0.5
    ORDER BY id_a, id_b
    """,
)
def dedup_ngram_dfcap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DF-capped near-dup over hashed shingles: candidates come only from shingles in
    ≤ MAX_SHINGLE_DF documents (bounding the self-join blowup) AND must
    share ≥ MIN_SHARED_SHINGLES of them (one shared rare shingle is
    noise; a near-dup at jaccard 0.5 shares dozens). The count gate
    turns the candidate set from "every pair with any rare shingle in
    common" — quadratic in practice — into a near-dup-only set, so the
    exact-jaccard verification join stays tiny. The oracle applies the
    identical cap + gate, so the scale-path semantics themselves are
    value-checked — not just asserted to approximate the uncapped
    tier."""
    shd = doc_shingle_hashes(spark, sf_dir).localCheckpoint(eager=True)
    rare = (
        shd.groupBy("h")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= MAX_SHINGLE_DF)
        .select("h")
    )
    sa = shd.join(rare, "h").select(F.col("doc_id").alias("id_a"), "h")
    sb = shd.select(F.col("doc_id").alias("id_b"), "h")
    cand = (
        sa.join(sb, "h")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("i_rare"))
        .where(F.col("i_rare") >= MIN_SHARED_SHINGLES)
        .select("id_a", "id_b")
    )
    return (
        verified_jaccard(cand, shd, key="h")
        .where(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", F.round("jaccard", 3).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Tier 4 — SimHash (64-bit, md5-nibble construction)
# ---------------------------------------------------------------------------

_HEXDIGITS = "0123456789abcdef"


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _simhash_bit_sums_spark() -> list[Column]:
    """64 conditional sums: for nibble p (0..15) and bit w (3..0), the
    sum over distinct tokens of ±1 by whether that bit of nibble p of
    md5(token) is set. Process-cached (r11): building the 64 sums is
    ~500 py4j round trips (~1 s measured) and the expression is a pure
    constant — immutable Column templates reuse safely across plans."""
    sums = []
    for p in range(16):
        nib = F.expr(f"locate(substring(th, {p + 1}, 1), '{_HEXDIGITS}') - 1")
        for w in (3, 2, 1, 0):
            bit = F.shiftright(nib, w).bitwiseAND(F.lit(1))
            sums.append(F.sum(bit * 2 - 1).alias(f"s_{p}_{w}"))
    return sums


@_functools.lru_cache(maxsize=None)
def _simhash_hex_spark() -> Column:
    digits = []
    for p in range(16):
        val = None
        for w in (3, 2, 1, 0):
            b = F.when(F.col(f"s_{p}_{w}") > 0, F.lit(1 << w)).otherwise(F.lit(0))
            val = b if val is None else val + b
        digits.append(F.lit(_HEXDIGITS).substr(val + 1, F.lit(1)))
    return F.concat(*digits).alias("simhash")


def _simhash_oracle() -> str:
    sums = []
    for p in range(16):
        nib = f"(strpos('{_HEXDIGITS}', substr(th, {p + 1}, 1)) - 1)"
        for w in (3, 2, 1, 0):
            sums.append(
                f"sum((({nib} >> {w}) & 1) * 2 - 1) AS s_{p}_{w}"
            )
    digits = []
    for p in range(16):
        val = " + ".join(
            f"(CASE WHEN s_{p}_{w} > 0 THEN {1 << w} ELSE 0 END)" for w in (3, 2, 1, 0)
        )
        digits.append(f"substr('{_HEXDIGITS}', ({val}) + 1, 1)")
    simhash = " || ".join(digits)
    sums_sql = ",\n             ".join(sums)
    return f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    th AS (SELECT doc_id, md5(tok) AS th FROM toks),
    sums AS (
      SELECT doc_id,
             {sums_sql}
      FROM th GROUP BY doc_id
    )
    SELECT doc_id, {simhash} AS simhash
    FROM sums ORDER BY doc_id
    """


@_register("dedup_simhash", _simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document over distinct tokens. Near-dup
    candidates at scale come from equality on 16-bit bands of this
    signature (hamming ≤ 3 guarantee with 4 bands); the signature
    itself is the oracle-checked output."""
    d = spread(load_table(spark, sf_dir, "documents"))
    # per-doc distinct is computable MAP-SIDE (array_distinct before the
    # explode) — at 100 TB this deletes a full corpus-wide shuffle that
    # a row-level .distinct() would need; same (doc_id, tok) set.
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(tokens_col(F.col("text")))).alias("tok")
    )
    th = toks.select("doc_id", F.md5(F.col("tok").cast("binary")).alias("th"))
    sums = th.groupBy("doc_id").agg(*_simhash_bit_sums_spark())
    return sums.select("doc_id", _simhash_hex_spark()).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Tier 6 — corpus-wide chunk dedup with document reconstruction
# ---------------------------------------------------------------------------

CHUNK_W = 10  # words per non-overlapping chunk


def _chunk_dedup_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ),
    ch AS (
      SELECT doc_id,
             unnest([{{'pos': i - 1,
                       'chunk': array_to_string(
                         t[(i - 1) * {CHUNK_W} + 1 : (i - 1) * {CHUNK_W} + {CHUNK_W}],
                         ' ')}}
                     FOR i IN range(1, CAST(ceil(len(t) / {CHUNK_W}.0) AS BIGINT) + 1)])
               AS u
      FROM toks
    ),
    ex AS (SELECT doc_id, (u).pos AS pos, (u).chunk AS chunk FROM ch),
    keep AS (
      SELECT doc_id, pos, chunk,
             row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
      FROM ex
    )
    SELECT doc_id,
           string_agg(chunk, ' ' ORDER BY pos) AS kept_text,
           CAST(COUNT(*) AS BIGINT)            AS n_kept
    FROM keep WHERE rn = 1
    GROUP BY doc_id ORDER BY doc_id
    """


@_register("chunk_dedup_reconstruct", _chunk_dedup_oracle())
def chunk_dedup_reconstruct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact chunk dedup with document reconstruction
    (the Lee et al. 2022 "Deduplicating Training Data" shape at chunk
    granularity): split each doc into non-overlapping 10-word chunks,
    keep only the globally-first occurrence of each distinct chunk
    (min (doc_id, pos)), then rebuild every document from its surviving
    chunks in order. Docs whose text is entirely boilerplate vanish.

    Scale: two shuffles, both inherent — one on the chunk value for
    the global first-occurrence window (at 100 TB, partition on a
    chunk digest instead of the raw string to bound key width), one
    back on doc_id for reassembly. Chunking itself is map-side."""
    d = spread(load_table(spark, sf_dir, "documents"))
    t = tokens_col(F.col("text"))
    n_chunks = F.ceil(F.size(t) / CHUNK_W).cast("int")
    chunks = F.when(
        F.size(t) > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(F.slice(t, i * CHUNK_W + 1, CHUNK_W), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = d.select("doc_id", F.posexplode(chunks).alias("pos", "chunk"))
    first = Window.partitionBy("chunk").orderBy("doc_id", "pos")
    keep = (
        ex.withColumn("rn", F.row_number().over(first))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
        lambda s: s["chunk"],
    )
    return (
        keep.groupBy("doc_id")
        .agg(
            F.array_join(ordered, " ").alias("kept_text"),
            F.count("*").cast("bigint").alias("n_kept"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Tier 7 — incremental dedup: new batch vs existing corpus
# ---------------------------------------------------------------------------

# Deterministic, SF-independent batch split: every 5th doc is "new".
INCR_NEW_PRED_SQL = "doc_id % 5 = 4"


def _incremental_oracle() -> str:
    base = _minhash_oracle()
    # reuse the shared CTE prefix up to the bandkeys stage, then swap
    # the self-join for a new-vs-existing join.
    prefix = base.split("smallbuckets AS")[0].rstrip().rstrip(",")
    return f"""{prefix},
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
      FROM bandkeys n
      JOIN bandkeys o ON n.band_id = o.band_id AND n.band_key = o.band_key
      WHERE n.{INCR_NEW_PRED_SQL} AND NOT (o.{INCR_NEW_PRED_SQL})
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
    inter AS (
      SELECT c.new_id, c.old_id, count(*) AS i
      FROM cand c
      JOIN shd sa ON sa.doc_id = c.new_id
      JOIN shd sb ON sb.doc_id = c.old_id AND sb.h = sa.h
      GROUP BY c.new_id, c.old_id
    )
    SELECT new_id, old_id,
           ROUND(1.0 * i / (za.sz + zb.sz - i), 3) AS jaccard
    FROM inter
    JOIN sizes za ON za.doc_id = new_id
    JOIN sizes zb ON zb.doc_id = old_id
    WHERE 1.0 * i / (za.sz + zb.sz - i) >= {NEARDUP_THRESHOLD}
    ORDER BY new_id, old_id
    """


@_register("dedup_incremental_batch", _incremental_oracle())
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dedup: an arriving batch (here: every 5th doc)
    is checked against the already-ingested corpus WITHOUT re-pairing
    the corpus against itself — the production shape, where the
    existing side's band keys are a precomputed index and the join is
    new x old instead of a quadratic self-join. Per-batch cost scales
    with batch size, not corpus size.

    The verification join still computes exact jaccard against the
    matched old docs only."""
    is_new = F.col("doc_id") % 5 == 4
    shd = doc_shingle_hashes(spark, sf_dir).localCheckpoint(eager=True)
    bk = lsh_band_keys(minhash_signatures(shd))
    new_keys = bk.where(is_new)
    old_keys = bk.where(~is_new)
    cand = (
        new_keys.alias("n")
        .join(
            old_keys.alias("o"),
            (F.col("n.band_id") == F.col("o.band_id"))
            & (F.col("n.band_key") == F.col("o.band_key")),
        )
        .select(
            F.col("n.doc_id").alias("new_id"), F.col("o.doc_id").alias("old_id")
        )
        .distinct()
    )
    return _verify_new_old_pairs(cand, shd)


# ---------------------------------------------------------------------------
# Tier 8 — blocked edit-distance fuzzy match
# ---------------------------------------------------------------------------

FUZZY_BLOCK_CHARS = 20
FUZZY_CMP_CHARS = 60
FUZZY_MAX_DIST = 15


@_register(
    "fuzzy_match_blocked",
    f"""
    WITH d AS (
      SELECT doc_id, text, substr(text, 1, {FUZZY_BLOCK_CHARS}) AS blk
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(substr(a.text, 1, {FUZZY_CMP_CHARS}),
                            substr(b.text, 1, {FUZZY_CMP_CHARS})) AS BIGINT)
             AS edit_dist
    FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE levenshtein(substr(a.text, 1, {FUZZY_CMP_CHARS}),
                      substr(b.text, 1, {FUZZY_CMP_CHARS})) <= {FUZZY_MAX_DIST}
    ORDER BY id_a, id_b
    """,
)
def fuzzy_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-match with prefix blocking: docs only compare
    within equal-prefix blocks, then levenshtein over a bounded slice
    decides. The blocked-record-linkage pattern — O(n²) only within a
    block, never corpus-wide, and the O(m²) DP cost per comparison is
    bounded by the 60-char slice. One shuffle on the block key; skewed
    blocks (a boilerplate prefix) are the hazard the LSH bucket cap
    handles in tier 2 — same cap applies here at scale."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring("text", 1, FUZZY_CMP_CHARS).alias("head"),
        F.substring("text", 1, FUZZY_BLOCK_CHARS).alias("blk"),
    )
    a, b = d.alias("a"), d.alias("b")
    dist = F.levenshtein(F.col("a.head"), F.col("b.head"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(dist <= FUZZY_MAX_DIST)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            dist.cast("bigint").alias("edit_dist"),
        )
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Asymmetric containment (Broder's "containment" measure,
# C(A,B) = |A∩B| / |A|): catches a SHORT document embedded inside a
# LONGER one — quotes, boilerplate wrappers, article-plus-comments
# pages — which symmetric jaccard misses entirely (a 100-shingle doc
# inside a 10,000-shingle doc has jaccard ~0.01 but containment 1.0).
# Same inverted-index join as dedup_ngram_jaccard; only the
# denominator changes, and the pair orientation is (contained,
# container) rather than (min_id, max_id).
# ---------------------------------------------------------------------------

CONTAINMENT_THRESHOLD = 0.9


@_register(
    "dedup_containment",
    f"""
    WITH {_SHD_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shd GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_small, b.doc_id AS id_big, COUNT(*) AS i
      FROM shd a JOIN shd b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_small, id_big,
           ROUND(1.0 * i / za.sz, 3) AS containment
    FROM inter
    JOIN sizes za ON za.doc_id = id_small
    JOIN sizes zb ON zb.doc_id = id_big
    WHERE 1.0 * i / za.sz >= {CONTAINMENT_THRESHOLD}
      AND (za.sz < zb.sz OR (za.sz = zb.sz AND id_small < id_big))
    ORDER BY id_small, id_big
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment pairs: documents whose shingle set is >= 90%
    inside a strictly larger (or equal-size, id-ordered) document.

    Scale shape: identical cost profile to the exact-jaccard tier —
    one shuffle on the shingle key for the inverted-index join, sizes
    as a per-doc aggregate joined back on ids. In production this
    runs with the DF-cap candidate gate (dedup_ngram_dfcap) exactly as
    jaccard does; here the exact form is the oracle-checked baseline.
    The asymmetric orientation means each unordered pair appears at
    most once, as (contained, container)."""
    shd = doc_shingles(spark, sf_dir).localCheckpoint(eager=True)
    sa = shd.select(F.col("doc_id").alias("id_small"), "shingle")
    sb = shd.select(F.col("doc_id").alias("id_big"), "shingle")
    inter = (
        sa.join(sb, "shingle")
        .where(F.col("id_small") != F.col("id_big"))
        .groupBy("id_small", "id_big")
        .agg(F.count("*").alias("i"))
    )
    sizes = shd.groupBy("doc_id").agg(F.count("*").alias("sz"))
    za = sizes.select(F.col("doc_id").alias("id_small"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("id_big"), F.col("sz").alias("sz_b"))
    cont = F.col("i") / F.col("sz_a")
    return (
        inter.join(za, "id_small")
        .join(zb, "id_big")
        .where(
            (cont >= CONTAINMENT_THRESHOLD)
            & (
                (F.col("sz_a") < F.col("sz_b"))
                | ((F.col("sz_a") == F.col("sz_b")) & (F.col("id_small") < F.col("id_big")))
            )
        )
        .select("id_small", "id_big", F.round(cont, 3).alias("containment"))
        .orderBy("id_small", "id_big")
    )


# ---------------------------------------------------------------------------
# Repeated n-gram span mining (the analysis half of Lee et al. 2022:
# BEFORE deduplicating, measure how much of each document is made of
# substrings that also occur elsewhere). Overlapping word 8-grams —
# distinct from chunk_dedup_reconstruct's non-overlapping chunks: a
# span repeated at any alignment is caught.
# ---------------------------------------------------------------------------

SPAN_N = 8  # words per sliding gram
SPAN_TOPK = 25


def _repeated_spans_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ),
    g AS (
      SELECT doc_id, array_to_string(t[i:i+{SPAN_N - 1}], ' ') AS gram
      FROM toks, UNNEST(range(1, len(t) - {SPAN_N - 2})) u(i)
      WHERE len(t) >= {SPAN_N}
    ),
    df AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY gram),
    per_doc AS (
      SELECT g.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(COUNT(*) FILTER (df.nd > 1) AS BIGINT) AS n_repeated
      FROM g JOIN df USING (gram)
      GROUP BY g.doc_id
    )
    SELECT doc_id, n_grams, n_repeated,
           ROUND(n_repeated * 1.0 / n_grams, 4) AS repeated_frac
    FROM per_doc
    ORDER BY repeated_frac DESC, doc_id
    LIMIT {SPAN_TOPK}
    """


@_register("repeated_ngram_spans", _repeated_spans_oracle())
def repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repeated-span coverage: the fraction of a doc's
    sliding word 8-grams that occur in at least one OTHER document —
    the diagnosis pass a corpus runs before choosing dedup thresholds
    (Lee et al. 2022 measure repeated substrings the same way; the
    reference has no corpus analytics at all). Top-25 most-boilerplate
    docs, deterministically cut on (rounded frac, doc_id).

    Scale shape: the gram explode is map-side; cross-doc document
    frequency is ONE map-side-combined groupBy on the gram; the
    re-join keys on the same gram so the shuffle partitioning is
    reused; per-doc rollup is one shuffle on doc_id. At 100 TB the
    gram key becomes a 28-bit digest (as dedup_ngram_dfcap does) so
    shuffles move ints, not strings — the string form here keeps the
    oracle 1:1."""
    d = spread(load_table(spark, sf_dir, "documents"))
    t = tokens_col(F.col("text"))
    grams = F.when(
        F.size(t) >= SPAN_N,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (SPAN_N - 1)),
            lambda i: F.array_join(F.slice(t, i, SPAN_N), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = d.select("doc_id", F.explode(grams).alias("gram"))
    df_counts = g.groupBy("gram").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    per_doc = (
        g.join(df_counts, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_repeated"),
        )
    )
    return (
        per_doc.select(
            "doc_id",
            "n_grams",
            "n_repeated",
            F.round(F.col("n_repeated") / F.col("n_grams"), 4).alias("repeated_frac"),
        )
        .orderBy(F.col("repeated_frac").desc(), "doc_id")
        .limit(SPAN_TOPK)
    )


# ---------------------------------------------------------------------------
# Tier 9 — persisted signature index: the dedup family's twin of the
# ivf_index_* lifecycle (operators/similarity.py:1363+). Today's
# dedup_incremental_batch re-derives the OLD corpus's shingle hashes
# and band keys every run — O(corpus) per ingest, which is the cost a
# 100 TB pipeline cannot pay per batch. The index persists three
# parquet tables once at build time:
#
#   bands/  (doc_id, band_id, band_key)  partitioned by bucket =
#           pmod(xxhash64(band_id, band_key), DEDUP_INDEX_BUCKETS) —
#           the probe joins on (bucket, band_id, band_key), so dynamic
#           partition pruning can skip bucket directories the batch's
#           keys never touch.
#   shd/    (doc_id, h) 28-bit shingle digests, partitioned by a doc
#           bucket for write parallelism — read only by the exact-
#           jaccard verification join, which is bounded by candidates.
#   sizes/  (doc_id, sz) shingle-set sizes (avoids recounting the
#           corpus for the jaccard denominator).
#
# Ingest then computes signatures for the NEW batch only, appends all
# three tables, and probes the stored buckets: per-batch cost is
# O(batch), independent of index size. The oracle is the existing
# full-corpus banded join (_incremental_oracle), so the hash proves
# the persisted path loses/duplicates nothing vs the pure computation.
# ---------------------------------------------------------------------------

import os as _os

DEDUP_INDEX_BUCKETS = 16

_SCRATCH_DEDUP = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
    ".scratch",
    "dedup_index",
)


def _dedup_index_path(sf_dir: str) -> str:
    """Scratch path for the persisted signature index — keying contract
    lives in sources/parquet_lake.scratch_path."""
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        scratch_path,
    )

    return scratch_path(_SCRATCH_DEDUP, sf_dir)


def _bucketed_bands(bandkeys: DataFrame) -> DataFrame:
    """Attach the index's partition bucket to a band-keys frame — THE
    single definition of the bucket expression (build, append, and the
    one-off `_banded` derivation all route through it)."""
    return bandkeys.withColumn(
        "bucket", F.pmod(F.xxhash64("band_id", "band_key"), F.lit(DEDUP_INDEX_BUCKETS))
    )


def _banded(shd: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_key, bucket) for one corpus slice."""
    return _bucketed_bands(lsh_band_keys(minhash_signatures(shd)))


def _build_signature_index(
    shd_old: DataFrame,
    path: str,
    tables: tuple[str, ...] = ("bands", "shd", "sizes"),
) -> None:
    """Write the index tables from the old corpus's (doc_id, h)
    working set — static overwrite, so re-running a lifecycle resets
    any earlier appends (the idempotency contract). ``tables`` lets a
    consumer that reads only part of the index skip the rest of the
    build: the stats verb needs just ``bands``, and the ``shd`` table
    (one row per distinct (doc_id, shingle-hash) — the largest
    artifact) is a corpus-sized write it would otherwise pay for
    nothing."""
    _write_signature_tables(shd_old, path, tables, mode="overwrite")


def _write_signature_tables(
    shd: DataFrame, path: str, tables: tuple[str, ...], mode: str
) -> None:
    """Shared build/append body. r10 optimization: when both bands and
    sizes are written, the minhash signatures and the per-doc set size
    ride ONE groupBy over the (doc_id, h) working set (persisted for
    the two writes, unpersisted after) instead of two independent
    passes — table content is bit-identical; sizes is written as a
    derivative of the same aggregation the bands came from.

    The shd table write OVERLAPS the bands/sizes writes (guide §2.6:
    independent jobs submitted from a driver thread back-fill idle
    executors): it reads only the caller's checkpointed (doc_id, h)
    frame — already-materialized blocks, disjoint from the sig cache
    the other two writes share — and targets its own directory, so
    running it concurrently cannot race a cache materialization or a
    commit. The SIZES write overlaps the shd write's tail the same way
    (r11): once the bands write has materialized the shared sig cache,
    the sizes projection is a read-only consumer of cached blocks into
    its own directory, so it rides the pool while the corpus-sized shd
    write (which always finishes last) drains. Each write's content is
    identical to the sequential shape; only the wall-clock overlap
    changes."""
    from concurrent.futures import ThreadPoolExecutor

    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        write_partitioned,
    )

    def _write_shd() -> None:
        write_partitioned(
            shd.withColumn("dbucket", F.pmod(F.col("doc_id"), F.lit(8))),
            _os.path.join(path, "shd"),
            ["dbucket"],
            mode=mode,
            dynamic=False,
        )

    both = "bands" in tables and "sizes" in tables
    sig = None
    shd_future = None
    sizes_future = None
    pool = ThreadPoolExecutor(max_workers=2) if "shd" in tables else None
    try:
        if pool is not None:
            shd_future = pool.submit(_write_shd)
        if both:
            sig = minhash_signatures(shd, with_size=True).persist()
            bandkeys = lsh_band_keys(sig)
        elif "bands" in tables:
            bandkeys = lsh_band_keys(minhash_signatures(shd))
        if "bands" in tables:
            write_partitioned(
                _bucketed_bands(bandkeys), _os.path.join(path, "bands"), ["bucket"],
                mode=mode, dynamic=False,
            )
        if "sizes" in tables:
            sizes = (
                sig.select("doc_id", "sz")
                if sig is not None
                else shd.groupBy("doc_id").agg(F.count("*").alias("sz"))
            )

            def _write_sizes() -> None:
                sizes.write.mode(mode).parquet(_os.path.join(path, "sizes"))

            if pool is not None and sig is not None:
                # sig cache is hot (the bands write above materialized
                # it): the tiny sizes write overlaps the shd tail
                sizes_future = pool.submit(_write_sizes)
            else:
                _write_sizes()
        if sizes_future is not None:
            sizes_future.result()  # surface any write failure loudly
        if shd_future is not None:
            shd_future.result()
    finally:
        if pool is not None:
            pool.shutdown(wait=True)
            for fut, name in ((shd_future, "shd"), (sizes_future, "sizes")):
                if fut is not None and fut.exception() is not None:
                    # a sibling write raised FIRST and is propagating:
                    # don't let this overlapped write's own failure
                    # vanish (its result() was never reached)
                    import logging

                    logging.getLogger(__name__).warning(
                        "overlapped %s write failed: %r", name, fut.exception()
                    )
        if sig is not None:
            sig.unpersist()


def _append_signature_index(shd_new: DataFrame, path: str) -> None:
    """Append one batch's rows to all three tables — the ingest write,
    shared with the streaming path (streaming_dedup_ingest)."""
    _write_signature_tables(shd_new, path, ("bands", "shd", "sizes"), mode="append")


def _probe_signature_index(
    spark: SparkSession, path: str, is_new: Column, merge_tombstones: bool = False
) -> DataFrame:
    """new-vs-old banded probe + exact-jaccard verification, reading
    ONLY the persisted index — the search half of the lifecycle,
    shared by the batch and streaming ingest queries.

    ``merge_tombstones`` is the MERGE-ON-READ forget phase (the
    text-index _search_text_index twin): every index table anti-joins
    the K-row ``tombstones`` table at read time, so a forgotten doc can
    neither anchor a candidate pair nor survive as a neighbor while the
    bucket partitions are still unrewritten — deletes are visible
    immediately, the rewrite (_purge_signature_index) runs on
    maintenance schedule."""
    bands = _read_idx(spark, _os.path.join(path, "bands"))
    shd = _read_idx(spark, _os.path.join(path, "shd")).select("doc_id", "h")
    sizes = _read_idx(spark, _os.path.join(path, "sizes"))
    if merge_tombstones:
        tombs = _read_idx(spark, _os.path.join(path, "tombstones")).select(
            "doc_id"
        )
        bands = bands.join(F.broadcast(tombs), "doc_id", "left_anti")
        shd = shd.join(F.broadcast(tombs), "doc_id", "left_anti")
        sizes = sizes.join(F.broadcast(tombs), "doc_id", "left_anti")
    cand = (
        bands.where(is_new)
        .alias("n")
        .join(
            bands.where(~is_new).alias("o"),
            (F.col("n.bucket") == F.col("o.bucket"))
            & (F.col("n.band_id") == F.col("o.band_id"))
            & (F.col("n.band_key") == F.col("o.band_key")),
        )
        .select(F.col("n.doc_id").alias("new_id"), F.col("o.doc_id").alias("old_id"))
        .distinct()
    )
    # stored sizes, not a re-derive: the parquet round trip is part
    # of what the green hash proves
    return _verify_new_old_pairs(cand, shd, sizes=sizes)


@_register("dedup_incremental_index", _incremental_oracle())
def dedup_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dedup through a PERSISTED signature index:
    (1) BUILD — the already-ingested corpus's band keys, shingle
    digests, and set sizes written once as bucket-partitioned parquet;
    (2) INGEST — the arriving batch (every 5th doc, the
    dedup_incremental_batch split) is shingled/signed in isolation
    (cost ∝ batch) and appended; (3) PROBE — new band keys join stored
    band keys on (bucket, band_id, band_key); (4) VERIFY — exact
    jaccard from the stored digest lists, sizes from the stored size
    table. Everything after the writes reads ONLY the index, so the
    green hash additionally proves signatures survive the parquet
    round trip.

    Idempotent per invocation: the build's static overwrite resets all
    three tables before the append lands (ivf_index_append's pattern).

    Scale shape: build is the one O(corpus) pass, amortized across
    every future batch; ingest is O(batch) signing + an append write;
    the probe shuffles only band keys (integers + 32-char digests,
    never text), and the verification join is bounded by the candidate
    set. This closes VERDICT r5 gap #3: dedup_incremental_batch's
    O(corpus)-per-run re-derivation becomes a one-time build."""
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    is_new = F.col("doc_id") % 5 == 4
    path = _dedup_index_path(sf_dir)

    # build (old corpus, one amortized pass) -> ingest (batch only).
    # r10: ONE shingle pass over the corpus, sliced per generation from
    # the checkpointed (doc_id, h) frame — the old shape re-scanned and
    # re-tokenized the documents once per slice (2 corpus scans + 2
    # checkpoint jobs; the slices are disjoint, so the shingle WORK was
    # already 1x — the scans and job barriers were the waste). Filters
    # on doc_id commute with the per-doc shingle explode, so each
    # slice's row multiset is identical to the old per-slice derivation.
    shd = _shingle_hashes_of(docs).localCheckpoint(eager=True)
    _build_signature_index(shd.where(~is_new), path)
    _append_signature_index(shd.where(is_new), path)

    return _probe_signature_index(spark, path, is_new)


# ---------------------------------------------------------------------------
# Right-to-be-forgotten for the signature index: purge requested doc_ids
# from bands/shd/sizes, rewriting ONLY affected partitions — the
# dedup-family twin of ivf_index_delete's tombstone compaction.
# ---------------------------------------------------------------------------

PURGE_PRED_SQL = "doc_id % 17 = 3"  # the forget-request set (old docs)


def _purge_signature_index(spark: SparkSession, path: str, purged: DataFrame) -> None:
    """Remove ``purged`` doc_ids from all three index tables: the two
    partitioned ones through the shared affected-partition rewrite
    (sources/parquet_lake.py rewrite_affected_partitions — cost
    bounded by the forget request's partition footprint), the
    unpartitioned sizes table (one small row per doc) rewritten
    through a checkpoint."""
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        rewrite_affected_partitions,
        rewrite_table_atomic,
    )

    purged = purged.localCheckpoint(eager=True)
    for table, part_col in (("bands", "bucket"), ("shd", "dbucket")):
        rewrite_affected_partitions(
            spark, _os.path.join(path, table), part_col, purged, "doc_id"
        )
    # one job, swap-published (r10): the checkpoint-then-overwrite
    # shape cost two jobs and could strand a truncated sizes table on a
    # mid-write crash
    rewrite_table_atomic(
        _read_idx(spark, _os.path.join(path, "sizes")).join(
            F.broadcast(purged), "doc_id", "left_anti"
        ),
        _os.path.join(path, "sizes"),
    )


def _purge_oracle() -> str:
    base = _incremental_oracle()
    anchor = f"WHERE n.{INCR_NEW_PRED_SQL} AND NOT (o.{INCR_NEW_PRED_SQL})"
    assert anchor in base, "incremental oracle shape changed"
    return base.replace(anchor, anchor + f" AND NOT (o.{PURGE_PRED_SQL})")


@_register("dedup_index_purge", _purge_oracle())
def dedup_index_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR purge for the persisted dedup-signature index: build +
    ingest (the dedup_incremental_index lifecycle), then erase the
    forget-request set ({PURGE_PRED_SQL} among already-ingested docs)
    from bands, shingle digests, and sizes — rewriting only affected
    bucket partitions — and re-run the standing new-vs-old probe. The
    oracle recomputes the probe from the raw corpus WITH the purged
    docs excluded from the old side, so surviving signature rows, a
    missed band, or a stale size all break the hash. Completes the
    forget story across the index families (ivf_index_delete /
    gdpr_purge_report / this)."""
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    is_new = F.col("doc_id") % 5 == 4
    path = _dedup_index_path(sf_dir) + "_purge"

    # one shingle pass, sliced per generation (see dedup_incremental_index)
    shd = _shingle_hashes_of(docs).localCheckpoint(eager=True)
    _build_signature_index(shd.where(~is_new), path)
    _append_signature_index(shd.where(is_new), path)

    purged = docs.where(~is_new & F.expr(PURGE_PRED_SQL)).select("doc_id")
    _purge_signature_index(spark, path, purged)
    return _probe_signature_index(spark, path, is_new)


def _dedup_index_stats_oracle() -> str:
    return f"""
    WITH {_lsh_cand_sql_prefix()},
    per_bucket AS (
      SELECT band_id, band_key, COUNT(*) AS c
      FROM bandkeys GROUP BY band_id, band_key
    )
    SELECT CAST(band_id AS INT) AS band_id,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(MAX(c) AS BIGINT) AS max_bucket
    FROM per_bucket GROUP BY band_id ORDER BY band_id
    """


@_register("dedup_index_stats", _dedup_index_stats_oracle())
def dedup_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monitoring verb for the persisted signature index — the
    ivf_index_stats twin the dedup family lacked: per-band occupancy
    (distinct band keys, total rows, LARGEST bucket) read from the
    stored bands table. max_bucket is the skew signal that drives
    maintenance: the banded probe's cost is bounded by the largest
    (band_id, band_key) bucket (the LSH_BUCKET_CAP gate in
    dedup_minhash_lsh exists precisely because one hot bucket turns
    the self-join quadratic), so a drifting max_bucket says 'cap or
    re-shingle' the way ivf skew says 're-cluster'. The oracle
    recomputes the banding from the raw corpus, so the row doubles as
    an anti-entropy check of the persisted band keys themselves."""
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    path = _dedup_index_path(sf_dir) + "_statsq"
    shd = _shingle_hashes_of(docs).localCheckpoint(eager=True)
    _build_signature_index(shd, path, tables=("bands",))  # stats reads only bands
    bands = _read_idx(spark, _os.path.join(path, "bands"))
    per_bucket = bands.groupBy("band_id", "band_key").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_bucket.groupBy("band_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("c").cast("bigint").alias("n_rows"),
            F.max("c").cast("bigint").alias("max_bucket"),
        )
        .select(F.col("band_id").cast("int").alias("band_id"), "n_keys", "n_rows", "max_bucket")
        .orderBy("band_id")
    )


@_register("dedup_index_purge_mor", _purge_oracle())
def dedup_index_purge_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGE-ON-READ phase of the signature-index forget story —
    the two-phase design text_index_delete_mor / ivf_index_delete pin
    for the other families, completed for the dedup index: the request
    path writes ONLY the K-row tombstone table (deletes visible
    immediately, no bucket rewrite on the request path), and the probe
    anti-joins tombstones against every index table at read time, so
    the pre-compaction answer already equals the post-compaction one
    (dedup_index_purge — same oracle). Compaction
    (_purge_signature_index) then runs on maintenance schedule, not
    request latency. With this, all three persisted index families
    expose BOTH forget phases."""
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    is_new = F.col("doc_id") % 5 == 4
    path = _dedup_index_path(sf_dir) + "_mor"

    # one shingle pass, sliced per generation (see dedup_incremental_index)
    shd = _shingle_hashes_of(docs).localCheckpoint(eager=True)
    _build_signature_index(shd.where(~is_new), path)
    _append_signature_index(shd.where(is_new), path)

    # the forget request: tombstones only — no index table is touched
    docs.where(~is_new & F.expr(PURGE_PRED_SQL)).select("doc_id").write.mode(
        "overwrite"
    ).parquet(_os.path.join(path, "tombstones"))
    return _probe_signature_index(spark, path, is_new, merge_tombstones=True)


@_register("dedup_index_crud_lifecycle", _purge_oracle())
def dedup_index_crud_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verb COMPOSITION for the signature index (the
    text/ivf_index_crud_lifecycle twin): the old corpus is ingested in
    TWO generations (build + append), the forget request is purged
    BEFORE the new batch arrives, and only then is the new batch
    appended and the standing new-vs-old probe run. Final index state
    equals dedup_index_purge's (same oracle), but the verb ORDER is the
    production one — the forget request lands mid-ingest — so a purge
    that poisons later appends (stale tombstone state, an emptied
    bucket directory the next append cannot recreate) breaks the
    hash."""
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    is_new = F.col("doc_id") % 5 == 4
    path = _dedup_index_path(sf_dir) + "_crud"

    old = docs.where(~is_new)
    gen = F.col("doc_id") % 2
    # one shingle pass for all three generations (see
    # dedup_incremental_index) — the verb ORDER below is unchanged;
    # only the (doc_id, h) derivation is shared
    shd = _shingle_hashes_of(docs).localCheckpoint(eager=True)
    _build_signature_index(shd.where(~is_new & (gen == 0)), path)
    _append_signature_index(shd.where(~is_new & (gen == 1)), path)

    purged = old.where(F.expr(PURGE_PRED_SQL)).select("doc_id")
    _purge_signature_index(spark, path, purged)

    _append_signature_index(shd.where(is_new), path)
    return _probe_signature_index(spark, path, is_new)
