"""Training-data curation at corpus scale: benchmark-contamination
detection, sequence packing, stratified sampling, and embedding-column
maintenance (centroids, int8 quantization).

These extend the reference's keyword-scoring / dedup surface
(`src/enhanced_selenium_scraper.py:641-679`, `:112-120`) to the
operations a 100 TB LLM data pipeline runs between cleaning and
tokenization. Everything here is built-in-function Spark (zero Python
UDFs) so the whole module stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.operators.dedup import shingles_col
from automated_dow30_earnings_reports_spark.operators.textstats import tokens_col
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


# word n-gram shingling is dedup.shingles_col — ONE shingling contract
# shared by the dedup tiers and contamination_ngram, so a fix to the
# short-document guard cannot leave the two computing different sets


def split_bucket(key: Column) -> Column:
    """0-99 content-addressed bucket (same construction as
    textstats.deterministic_split): stable across runs/partitioning."""
    h = F.md5(key.cast("string"))
    return (F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))) % 100


# DuckDB twins of the helpers above (kept adjacent so drift is obvious).
_SQL_TOKS = "string_split_regex(trim(text), '\\s+')"
# Parameterized form (key expression substituted) — _SQL_BUCKET is the
# doc_id instance every earlier query uses.
_SQL_BUCKET_OF = (
    "(ascii(substr(md5(CAST({k} AS VARCHAR)), 1, 1)) * 256"
    " + ascii(substr(md5(CAST({k} AS VARCHAR)), 2, 1))) % 100"
)
_SQL_BUCKET = _SQL_BUCKET_OF.format(k="doc_id")


@_register(
    "contamination_ngram",
    f"""
    WITH sh AS (
      SELECT doc_id,
             {_SQL_BUCKET} AS bucket,
             CASE WHEN len({_SQL_TOKS}) >= 5
                  THEN [array_to_string({_SQL_TOKS}[i:i+4], ' ')
                        FOR i IN range(1, len({_SQL_TOKS}) - 3)]
                  ELSE CAST([] AS VARCHAR[]) END AS s
      FROM documents
    ),
    bench AS (
      SELECT DISTINCT unnest(s) AS g FROM sh WHERE bucket >= 90
    ),
    train AS (
      SELECT doc_id, unnest(s) AS g FROM sh WHERE bucket < 80
    )
    SELECT t.doc_id,
           CAST(COUNT(DISTINCT t.g) AS BIGINT) AS n_hit_shingles
    FROM train t JOIN bench b ON t.g = b.g
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: train-split documents sharing any
    word 5-gram with the held-out test split, with the count of
    distinct leaked shingles. The test-side distinct shingle set is
    orders of magnitude smaller than the corpus, so Catalyst/AQE
    broadcasts it and the scan side never shuffles its text."""
    # spread(): 5-gram shingling is compute-bound and the local scan is a
    # single split — no-op at scale (see tables.spread)
    d = spread(load_table(spark, sf_dir, "documents"))
    # Shingle arrays feed both the bench-side distinct and the train-side
    # explode; persist() tokenizes the corpus once, not twice.
    sh = d.select(
        "doc_id",
        split_bucket(F.col("doc_id")).alias("bucket"),
        shingles_col(F.col("text"), 5).alias("s"),
    ).localCheckpoint(eager=True)
    bench = (
        sh.where(F.col("bucket") >= 90)
        .select(F.explode("s").alias("g"))
        .distinct()
    )
    train = sh.where(F.col("bucket") < 80).select(
        "doc_id", F.explode("s").alias("g")
    )
    return (
        train.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").cast("bigint").alias("n_hit_shingles"))
        .orderBy("doc_id")
    )


@_register(
    "sequence_packing",
    f"""
    WITH t AS (
      SELECT doc_id, lang, len({_SQL_TOKS}) AS n_tok FROM documents
    ),
    c AS (
      SELECT lang, n_tok,
             SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT lang,
           CAST(floor((cum - n_tok) / 2048) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT)  AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM c
    GROUP BY lang, bin
    ORDER BY lang, bin
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequence packing: documents are laid out in a
    deterministic order and cut into 2048-token training bins by
    running-offset division — the streaming-friendly packing strategy
    (vs. first-fit, which is inherently sequential). Partitioned by
    lang so the ordering window parallelizes per shard instead of
    collapsing to one partition."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", F.size(tokens_col(F.col("text"))).alias("n_tok"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = t.withColumn("cum", F.sum("n_tok").over(w))
    return (
        c.select(
            "lang",
            F.floor((F.col("cum") - F.col("n_tok")) / 2048).cast("bigint").alias("bin"),
            "n_tok",
        )
        .groupBy("lang", "bin")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
        .orderBy("lang", "bin")
    )


@_register(
    "stratified_sample",
    f"""
    WITH b AS (
      SELECT lang, source, {_SQL_BUCKET} AS bucket FROM documents
    ),
    r AS (
      SELECT lang, source, bucket,
             CASE TRY_CAST(substr(source, 4) AS INTEGER) % 3
                  WHEN 0 THEN 25
                  WHEN 1 THEN 50
                  ELSE 100 END AS rate
      FROM b
    )
    SELECT lang,
           source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (bucket < rate) AS BIGINT) AS n_sampled
    FROM r GROUP BY lang, source ORDER BY lang, source
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic downsampling (domain mixing): each
    source gets its own keep-rate, membership is content-addressed
    (md5 bucket < rate), so the sample is reproducible under
    re-partitioning and incremental appends — no rand() seeds. Single
    map-side pass + one tiny aggregate shuffle.

    The per-source rates key off the ACTUAL source strata (srcN mod 3
    → 25/50/100%): the earlier 'web'/'pdf' literals matched no real
    source value, so every stratum fell through to 100% and the
    bucket<rate gating — the operator's entire point — was dead code a
    regression could not break."""
    d = load_table(spark, sf_dir, "documents")
    # try_cast: a source value that is not 'src<digits>' must fall
    # through to the 100% default, not throw CAST_INVALID_INPUT under
    # the session's ANSI mode (NULL % 3 matches no branch -> otherwise).
    # 2-arg substring (to end of string), matching the oracle's
    # substr(source, 4): a length cap would parse a different suffix
    # than the oracle for sources with >cap digits
    suffix_mod = F.expr("substring(source, 4)").try_cast("int") % 3
    rate = F.when(suffix_mod == 0, 25).when(suffix_mod == 1, 50).otherwise(100)
    b = d.select(
        "lang",
        "source",
        split_bucket(F.col("doc_id")).alias("bucket"),
        rate.alias("rate"),
    )
    return (
        b.groupBy("lang", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_total"),
            F.sum(F.when(F.col("bucket") < F.col("rate"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_sampled"),
        )
        .orderBy("lang", "source")
    )


@_register(
    "embedding_centroid",
    """
    SELECT label,
           i AS dim,
           ROUND(AVG(embedding[i]), 6) AS c
    FROM embeddings, range(1, 65) t(i)
    GROUP BY label, i
    ORDER BY label, dim
    """,
)
def embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column (the reduce step of
    k-means / class prototypes). posexplode + groupBy(label, dim) keeps
    the aggregation map-side-combinable and never materializes a
    per-label vector list — the formulation that survives labels with
    billions of members."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select("label", F.posexplode("embedding").alias("pos", "x"))
    return (
        ex.groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(F.round(F.avg("x"), 6).alias("c"))
        .orderBy("label", "dim")
    )


@_register(
    "embedding_quantize_int8",
    """
    WITH q AS (
      SELECT label,
             list_transform(embedding,
               x -> CASE WHEN m > 0
                         THEN CAST(floor(x * 127.0 / m + 0.5) AS BIGINT)
                         ELSE CAST(0 AS BIGINT) END) AS qv
      FROM (
        SELECT label, embedding,
               list_max(list_transform(embedding, x -> abs(x))) AS m
        FROM embeddings
      )
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT)          AS n_vecs,
           CAST(SUM(list_sum(qv)) AS BIGINT) AS sum_q,
           CAST(MAX(list_max(qv)) AS BIGINT) AS max_q
    FROM q GROUP BY label ORDER BY label
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (max-abs scaling, the
    standard ANN-index compression): array-local transform, zero
    shuffles until the audit aggregate. floor(x+0.5) rounding is used
    on both engines because round()'s half-tie rule differs between
    them. An all-zero vector (padding/null embeddings are routine in
    real corpora) has max-abs 0 and quantizes to all zeros — the
    unguarded division crashed with DIVIDE_BY_ZERO under the session's
    ANSI default, mirrored as a CASE in the oracle."""
    e = load_table(spark, sf_dir, "embeddings")
    m = F.array_max(F.transform("embedding", lambda x: F.abs(x)))
    qv = F.transform(
        "embedding",
        lambda x: F.when(
            F.col("m") > 0,
            F.floor(x * F.lit(127.0) / F.col("m") + F.lit(0.5)).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint")),
    )
    q = e.select("label", m.alias("m"), "embedding").select(
        "label", qv.alias("qv")
    )
    return (
        q.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.sum(F.aggregate("qv", F.lit(0).cast("bigint"), lambda a, x: a + x))
            .cast("bigint")
            .alias("sum_q"),
            F.max(F.array_max("qv")).cast("bigint").alias("max_q"),
        )
        .orderBy("label")
    )


@_register(
    "pii_redact",
    """
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
           regexp_replace(c_name, '#\\d{7}', '#*******') AS masked_name,
           substr(md5(c_name), 1, 12) AS pseudonym,
           CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS acctbal_band
    FROM customer ORDER BY c_custkey
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing triple over an identity-bearing table: mask (regex
    blanks all but the last 2 digits of the customer id embedded in the
    name), pseudonymize (md5-derived stable token, so joins across
    scrubbed datasets still line up), generalize (account balance into
    1000-unit bands, k-anonymity style). All three are row-local builtin
    expressions — a pure map stage with zero shuffles, so the scrub pass
    streams through 100 TB at scan speed."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"),
        F.regexp_replace("c_name", r"#\d{7}", "#*******").alias("masked_name"),
        F.substring(F.md5(F.col("c_name").cast("binary")), 1, 12).alias("pseudonym"),
        (F.floor(F.col("c_acctbal") / 1000) * 1000)
        .cast("bigint")
        .alias("acctbal_band"),
    ).orderBy("c_custkey")


@_register(
    "domain_mixture_weights",
    f"""
    WITH t AS (
      SELECT source, len({_SQL_TOKS}) AS ntok FROM documents
    ),
    per AS (
      SELECT source,
             CAST(count(*) AS BIGINT)  AS n_docs,
             CAST(sum(ntok) AS BIGINT) AS n_tokens
      FROM t GROUP BY source
    )
    SELECT source, n_docs, n_tokens,
           ROUND((SELECT 1.0 * sum(n_tokens) FROM per)
                 / (SELECT count(*) FROM per) / n_tokens, 6) AS weight
    FROM per ORDER BY source
    """,
)
def domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing weights: per-source token counts and the sampling
    weight that would equalize every source's token share (weight =
    uniform target share / actual share). The per-source aggregate is
    one map-side-combined shuffle; the corpus totals are a one-row
    aggregate broadcast back — the scalar-subquery-as-broadcast-join
    pattern, no second pass over the corpus."""
    d = load_table(spark, sf_dir, "documents")
    per = (
        d.select("source", F.size(tokens_col(F.col("text"))).alias("ntok"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("ntok").cast("bigint").alias("n_tokens"),
        )
    )
    tot = per.agg(
        F.sum("n_tokens").alias("corpus_tokens"), F.count("*").alias("n_sources")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(
                F.col("corpus_tokens") / F.col("n_sources") / F.col("n_tokens"), 6
            ).alias("weight"),
        )
        .orderBy("source")
    )


N_SHARDS = 16


@_register(
    "shard_assignment",
    f"""
    WITH t AS (
      SELECT doc_id,
             CAST((
               (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 +
               (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
             ) % {N_SHARDS} AS BIGINT) AS shard,
             len({_SQL_TOKS}) AS n_tok
      FROM documents
    ),
    p AS (
      SELECT doc_id, shard, n_tok,
             row_number() OVER w                        AS pos,
             SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tok AS token_offset
      FROM t WINDOW w AS (PARTITION BY shard ORDER BY doc_id)
    )
    SELECT doc_id, shard, CAST(pos AS BIGINT) AS pos,
           CAST(token_offset AS BIGINT) AS token_offset
    FROM p ORDER BY doc_id
    """,
)
def shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard layout: shard = content-addressed
    hash of the doc key (md5 byte, portable across engines and runs —
    never Spark's partition-dependent hash()), position and cumulative
    token offset within the shard via ordered windows. This is the
    manifest a dataloader needs to seek straight to a document. One
    shuffle on shard; writing then uses
    df.repartition("shard").write.partitionBy("shard")."""
    d = load_table(spark, sf_dir, "documents")
    byte0 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2), 16, 10)
    t = d.select(
        "doc_id",
        (byte0.cast("bigint") % N_SHARDS).alias("shard"),
        F.size(tokens_col(F.col("text"))).alias("n_tok"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    cum = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        t.select(
            "doc_id",
            "shard",
            F.row_number().over(w).cast("bigint").alias("pos"),
            (F.sum("n_tok").over(cum) - F.col("n_tok"))
            .cast("bigint")
            .alias("token_offset"),
        )
        .orderBy("doc_id")
    )


def write_training_shards(manifest: DataFrame, docs: DataFrame, path: str) -> None:
    """Emit the packed training corpus: join the shard manifest
    (shard_assignment's output) back to the documents and write one
    parquet directory per shard, rows ordered by in-shard position.

    repartition("shard") puts each shard's rows in exactly one task
    (write-side shuffle = the only shuffle), sortWithinPartitions keeps
    the dataloader's seek order physical, and partitionBy layers the
    shard=N directory layout a 100 TB corpus needs for per-shard
    reads. mode=overwrite is idempotent under task retries because the
    committer swaps the whole directory."""
    (
        manifest.join(docs, "doc_id")
        .repartition("shard")
        .sortWithinPartitions("pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Temperature-flattened mixture resampling (the sampling counterpart
# of domain_mixture_weights): heavy sources are downsampled toward a
# tau=0.5-tempered share by a DETERMINISTIC hash gate, so any two runs
# — or any two engines — keep exactly the same documents. Acceptance
# for source s with byte-mass m_s is p_s = sqrt(min_mass / m_s)
# (lightest source keeps everything; a 100x heavier source keeps
# 1/10th). A doc is kept iff its 28-bit md5 digest < floor(p_s * 2^28)
# — IEEE sqrt/division are correctly rounded, so the integer
# threshold, and therefore the kept set, is bit-identical cross-engine.
# ---------------------------------------------------------------------------

# Shared 28-bit digest contract — the same family the sketch operators
# gate on; importing (not copying) keeps the cross-engine bit-identity
# guarantee in one place.
from automated_dow30_earnings_reports_spark.operators.sketches import (  # noqa: E402
    _DIGEST_SQL as _RS_DIGEST_SQL,
    _digest_col as _rs_digest_col,
)

_RS_SPACE = 16**7  # 28-bit digest space (matches sketches.KMV_SPACE)


def _temperature_oracle() -> str:
    dg = _RS_DIGEST_SQL.format(t="CAST(doc_id AS VARCHAR)")
    return f"""
    WITH mass AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS m, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    lo AS (SELECT MIN(m) AS min_m FROM mass),
    th AS (
      SELECT source, m, n_docs,
             CAST(FLOOR({_RS_SPACE} * sqrt(CAST(min_m AS DOUBLE) / m)) AS BIGINT) AS threshold
      FROM mass CROSS JOIN lo
    ),
    kept AS (
      SELECT d.source, COUNT(*) AS n_kept
      FROM documents d JOIN th USING (source)
      WHERE {dg} < threshold
      GROUP BY d.source
    )
    SELECT th.source, th.n_docs, th.threshold,
           CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept
    FROM th LEFT JOIN kept ON th.source = kept.source
    ORDER BY th.source
    """


@_register("temperature_resample", _temperature_oracle())
def temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic temperature (tau=0.5) mixture resampling: per-
    source byte mass -> acceptance threshold -> hash-gated keep set,
    reported as per-source (n_docs, threshold, n_kept).

    Scale shape: the mass aggregate is one map-side-combined shuffle
    with one row per source; thresholds are a source-cardinality frame
    broadcast back over the corpus (genuinely bounded — unlike a
    fact-derived side, the source dimension does not grow with docs);
    the keep gate is then a stateless map-side filter, so resampling a
    100 TB corpus is one aggregate + one scan. Replaying the same gate
    on a later batch keeps selection consistent across incremental
    ingests — no stored sample membership table needed."""
    d = load_table(spark, sf_dir, "documents")
    mass = d.groupBy("source").agg(
        F.sum("n_chars").cast("bigint").alias("m"),
        F.count("*").cast("bigint").alias("n_docs"),
    )
    lo = mass.agg(F.min("m").alias("min_m"))
    th = (
        mass.crossJoin(F.broadcast(lo))
        .select(
            "source",
            "n_docs",
            F.floor(
                _RS_SPACE * F.sqrt(F.col("min_m").cast("double") / F.col("m"))
            )
            .cast("bigint")
            .alias("threshold"),
        )
        # source-cardinality frame referenced by BOTH the keep gate and
        # the final report — checkpoint so the corpus mass aggregate
        # (and the min-mass aggregate under it) run once, not once per
        # consumer (the bounded-frame convention)
        .localCheckpoint(eager=True)
    )
    dg = _rs_digest_col(F.col("doc_id").cast("string"))
    kept = (
        d.join(F.broadcast(th), "source")
        .where(dg < F.col("threshold"))
        .groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_kept"))
    )
    return (
        th.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            "threshold",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        )
        .orderBy("source")
    )


def _funnel_oracle() -> str:
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        QUALITY_PASS_SQL,
    )

    dg = _RS_DIGEST_SQL.format(t="CAST(doc_id AS VARCHAR)")
    return f"""
    WITH canon AS (
      SELECT doc_id, source, text,
             md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    keepers AS (
      SELECT doc_id, source, text
      FROM canon
      QUALIFY ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1
    ),
    quality AS (
      SELECT doc_id, source, text
      FROM (SELECT doc_id, source, text,
                   string_split_regex(trim(text), '\\s+') AS toks
            FROM keepers)
      WHERE {QUALITY_PASS_SQL}
    ),
    mass AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS m FROM documents GROUP BY source
    ),
    lo AS (SELECT MIN(m) AS min_m FROM mass),
    th AS (
      SELECT source,
             CAST(FLOOR({_RS_SPACE} * sqrt(CAST(min_m AS DOUBLE) / m)) AS BIGINT)
               AS threshold
      FROM mass CROSS JOIN lo
    ),
    sampled AS (
      SELECT q.doc_id, q.text
      FROM quality q JOIN th USING (source)
      WHERE {dg} < threshold
    )
    SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_raw,
           CAST((SELECT COUNT(*) FROM keepers)  AS BIGINT)  AS n_after_exact,
           CAST((SELECT COUNT(*) FROM quality)  AS BIGINT)  AS n_after_quality,
           CAST((SELECT COUNT(*) FROM sampled)  AS BIGINT)  AS n_after_resample,
           CAST((SELECT COALESCE(SUM(len(string_split_regex(trim(text), '\\s+'))), 0)
                 FROM sampled) AS BIGINT)                   AS final_tokens
    """


@_register("corpus_curation_funnel", _funnel_oracle())
def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation composition: raw corpus -> exact-dedup
    keepers (canonical-hash min-doc_id survivor, the dedup_exact
    contract) -> Gopher quality gates (textstats.quality_pass_col, the
    SHARED keep/drop expression) -> deterministic temperature resample
    (the temperature_resample hash gate, thresholds from raw per-source
    mass so the gate is stable across pipeline re-orderings) -> final
    doc and token counts. One row a pipeline owner reads as the
    retention funnel.

    Scale shape: each stage is the already-audited shape of its
    standalone operator — one window on the content hash (dedup), a
    stateless gate map (quality), a broadcast threshold join + map
    filter (resample), one aggregate. Nothing quadratic, nothing
    collected; stages chain as narrow/one-shuffle steps exactly as the
    production pipeline would run them nightly."""
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        quality_pass_col,
    )

    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.regexp_replace("text", r"\s+", " ")).cast("binary"))
    w = Window.partitionBy("fp").orderBy("doc_id")
    mass = (
        d.groupBy("source")
        .agg(F.sum("n_chars").cast("bigint").alias("m"))
        .localCheckpoint(eager=True)  # source-cardinality; feeds lo AND th
    )
    lo = mass.agg(F.min("m").alias("min_m"))
    th = mass.crossJoin(F.broadcast(lo)).select(
        "source",
        F.floor(_RS_SPACE * F.sqrt(F.col("min_m").cast("double") / F.col("m")))
        .cast("bigint")
        .alias("threshold"),
    )
    # SINGLE-PASS funnel (the funnel_conversion_onepass trick): every
    # stage becomes a per-row boolean over ONE scan + ONE dedup window
    # + ONE broadcast threshold join, and the four stage counts are
    # conditional sums of one aggregate — the stage-per-aggregate form
    # re-ran the dedup window three times and scanned documents six
    # times to produce the same row.
    is_keeper = F.row_number().over(w) == 1
    staged = (
        d.select("doc_id", "source", "text", fp.alias("fp"))
        .join(F.broadcast(th), "source")
        .select(
            "doc_id",
            "text",
            is_keeper.alias("is_keeper"),
            (_rs_digest_col(F.col("doc_id").cast("string")) < F.col("threshold")).alias(
                "in_sample"
            ),
        )
        .select(
            "is_keeper",
            (F.col("is_keeper") & quality_pass_col(F.col("text"))).alias("is_q"),
            "in_sample",
            "text",
        )
    )
    one = F.lit(1)
    return staged.agg(
        F.count("*").cast("bigint").alias("n_raw"),
        F.sum(F.when(F.col("is_keeper"), one).otherwise(0))
        .cast("bigint")
        .alias("n_after_exact"),
        F.sum(F.when(F.col("is_q"), one).otherwise(0))
        .cast("bigint")
        .alias("n_after_quality"),
        F.sum(F.when(F.col("is_q") & F.col("in_sample"), one).otherwise(0))
        .cast("bigint")
        .alias("n_after_resample"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("is_q") & F.col("in_sample"),
                    F.size(tokens_col(F.col("text"))),
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("final_tokens"),
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis 2006):
# each record draws u ~ U(0,1] from a hash of its key and scores
# ln(u)/w; the k LARGEST scores are a weight-proportional sample
# without replacement. One pass, no global sort (top-k = per-partition
# heaps merged on the driver), fully deterministic under the md5 draw
# — the sampling primitive behind quality-weighted corpus mixing.
# ---------------------------------------------------------------------------

ES_SAMPLE_K = 25


def _es_oracle() -> str:
    from automated_dow30_earnings_reports_spark.operators.sketches import (
        KMV_SPACE,
        _DIGEST_SQL,
    )

    digest = _DIGEST_SQL.format(t="CAST(doc_id AS VARCHAR)")
    return f"""
    WITH scored AS (
      SELECT doc_id, n_chars,
             ln(({digest} + 1.0) / {KMV_SPACE + 1}.0) / n_chars AS score
      FROM documents
      WHERE n_chars > 0
    )
    SELECT doc_id, n_chars, ROUND(score, 6) AS es_score
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT {ES_SAMPLE_K}
    """


@_register("weighted_sample_topk", _es_oracle())
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis weighted sample of ES_SAMPLE_K docs with
    weight = n_chars (longer docs proportionally likelier — the usual
    token-weighted corpus draw). u comes from the 28-bit md5 digest of
    the doc key, so the draw is reproducible and the oracle recomputes
    it bit-for-bit; comparing on ln(u)/w instead of u^(1/w) keeps the
    double spread numerically safe for large weights.

    Scale shape: scoring is map-side arithmetic on the scan; the top-k
    is orderBy+limit = TakeOrdered per-partition heaps merged on the
    driver — k rows of driver state however large the corpus, no
    global sort, no shuffle. Repeatable: same corpus, same k, same
    sample."""
    from automated_dow30_earnings_reports_spark.operators.sketches import (
        KMV_SPACE,
        _digest_col,
    )

    d = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = (_digest_col(F.col("doc_id").cast("string")) + 1.0) / float(KMV_SPACE + 1)
    score = F.log(u) / F.col("n_chars")
    return (
        d.select("doc_id", "n_chars", score.alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(ES_SAMPLE_K)
        .select("doc_id", "n_chars", F.round("score", 6).alias("es_score"))
    )


# ---------------------------------------------------------------------------
# Cluster-aware train/val/test split: assignment is a function of the
# DUPLICATE CLUSTER (content digest), not the document, so exact dups
# can never straddle splits — the eval-set leakage that per-doc
# hashing permits. Reports how many docs the cluster rule re-routed
# vs naive per-doc splitting (the would-have-leaked volume).
# ---------------------------------------------------------------------------

def _split_col(key: Column) -> Column:
    p = split_bucket(key)
    return F.when(p < 80, "train").when(p < 90, "val").otherwise("test")


@_register(
    "cluster_aware_split",
    f"""
    WITH docs AS (
      SELECT doc_id, md5(text) AS digest FROM documents
    ),
    clusters AS (
      SELECT digest, MIN(doc_id) AS canonical, COUNT(*) AS sz
      FROM docs GROUP BY digest
    ),
    assigned AS (
      SELECT d.doc_id,
             c.digest,
             CASE WHEN {_SQL_BUCKET_OF.format(k="c.canonical")} < 80 THEN 'train'
                  WHEN {_SQL_BUCKET_OF.format(k="c.canonical")} < 90 THEN 'val'
                  ELSE 'test' END AS split,
             CASE WHEN {_SQL_BUCKET_OF.format(k="d.doc_id")} < 80 THEN 'train'
                  WHEN {_SQL_BUCKET_OF.format(k="d.doc_id")} < 90 THEN 'val'
                  ELSE 'test' END AS naive_split
      FROM docs d JOIN clusters c USING (digest)
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT digest) AS BIGINT) AS n_clusters,
           CAST(COUNT(*) FILTER (naive_split <> split) AS BIGINT) AS n_rerouted
    FROM assigned
    GROUP BY split
    ORDER BY split
    """,
)
def cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split by cluster canonical id (min doc_id per content digest):
    every member of a duplicate cluster lands in the SAME split by
    construction — the fix for near-dup eval contamination that
    per-document hashing (deterministic_split) cannot give.
    `n_rerouted` counts docs whose naive per-doc split disagrees with
    their cluster's split — exactly the volume that would have leaked.

    Scale shape: one digest groupBy (map-side combinable) + one join
    back on digest (both sides hash-partition on the digest — the
    shuffle key production MinHash dedup already uses); zero windows,
    zero driver state. The same pattern extends to near-dup clusters
    by swapping the digest for dedup_clusters' cluster_id."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("digest")
    )
    clusters = d.groupBy("digest").agg(F.min("doc_id").alias("canonical"))
    assigned = d.join(clusters, "digest").select(
        "digest",
        _split_col(F.col("canonical")).alias("split"),
        _split_col(F.col("doc_id")).alias("naive_split"),
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count_distinct("digest").cast("bigint").alias("n_clusters"),
            F.sum(F.when(F.col("naive_split") != F.col("split"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_rerouted"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# k-anonymity audit — the release-gate counterpart to pii_redact
# (masking) and gdpr_purge_report (erasure): before publishing a
# "de-identified" extract, verify every quasi-identifier combination
# is shared by at least K individuals, and quantify what generalizing
# the noisiest attribute buys.
# ---------------------------------------------------------------------------

K_ANON = 5
ACCTBAL_BAND = 1000.0  # generalization: account balance → $1000 bands


@_register(
    "k_anonymity_audit",
    f"""
    WITH q AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / {ACCTBAL_BAND}) AS BIGINT) AS bal_band
      FROM customer
    ),
    sizes AS (
      SELECT c_nationkey, c_mktsegment, bal_band, COUNT(*) AS sz
      FROM q
      GROUP BY GROUPING SETS ((c_nationkey, c_mktsegment, bal_band),
                              (c_nationkey, c_mktsegment))
    )
    SELECT CASE WHEN bal_band IS NULL THEN 'nation+segment'
                ELSE 'nation+segment+balband' END AS qi_level,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(COUNT(*) FILTER (sz < {K_ANON}) AS BIGINT) AS n_below_k,
           CAST(SUM(CASE WHEN sz < {K_ANON} THEN sz ELSE 0 END) AS BIGINT)
             AS n_rows_at_risk,
           CAST(MIN(sz) AS BIGINT) AS min_group
    FROM sizes
    GROUP BY qi_level
    ORDER BY qi_level
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-size audit over two quasi-identifier granularities: the
    fine QI tuple (nation, segment, $1000 balance band) and the
    generalized one (drop the band). A release is k-anonymous at a
    level iff n_below_k = 0; n_rows_at_risk is the re-identifiable
    population the generalization rescues.

    Scale shape: ONE fact scan — both granularities come out of a
    single grouping-sets aggregate (rollup over (nation, segment,
    band) filtered to the two wanted levels by grouping_id, Expand
    before the shuffle), then a 2-key re-aggregate over group COUNTS;
    individuals never leave the first map-side combine. The level tag
    derives from band-NULLness, which is unambiguous because real
    bands are never NULL (c_acctbal is non-null)."""
    c = load_table(spark, sf_dir, "customer")
    q = c.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / ACCTBAL_BAND).cast("bigint").alias("bal_band"),
    )
    sizes = (
        q.rollup("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count("*").alias("sz"), F.grouping_id().alias("gid"))
        # rollup emits (n,s,band)=0, (n,s)=1, (n)=3, ()=7 — keep the
        # two audited levels.
        .where(F.col("gid").isin(0, 1))
    )
    qi_level = (
        F.when(F.col("bal_band").isNull(), "nation+segment")
        .otherwise("nation+segment+balband")
        .alias("qi_level")
    )
    return (
        sizes.groupBy(qi_level)
        .agg(
            F.count("*").cast("bigint").alias("n_groups"),
            F.sum(F.when(F.col("sz") < K_ANON, 1).otherwise(0))
            .cast("bigint")
            .alias("n_below_k"),
            F.sum(F.when(F.col("sz") < K_ANON, F.col("sz")).otherwise(0))
            .cast("bigint")
            .alias("n_rows_at_risk"),
            F.min("sz").cast("bigint").alias("min_group"),
        )
        .orderBy("qi_level")
    )


# ---------------------------------------------------------------------------
# Exact-size stratified draw — the eval-set construction rule
# ("exactly K docs per language"), complementing stratified_sample's
# RATE-based gate: ranks within each stratum by the content-addressed
# md5 digest (so the draw is reproducible and ingest-order-free) and
# keeps the first EVAL_PER_STRATUM.
# ---------------------------------------------------------------------------

EVAL_PER_STRATUM = 40


@_register(
    "stratified_fixed_k",
    f"""
    WITH h AS (
      SELECT doc_id, lang, n_chars,
             md5(CAST(doc_id AS VARCHAR)) AS hk
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rk
      FROM h
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_drawn,
           CAST(SUM(n_chars) AS BIGINT) AS drawn_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM ranked WHERE rk <= {EVAL_PER_STRATUM}
    GROUP BY lang
    ORDER BY lang
    """,
)
def stratified_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly EVAL_PER_STRATUM docs per language, drawn by ranking on
    the md5 of the doc key: content-addressed (same corpus → same
    draw, regardless of partitioning, ingest order, or cluster size),
    uniform within the stratum (hash order is unrelated to any data
    attribute), and tie-broken by doc_id for byte-stable cuts.

    Scale shape: one window PARTITIONED by the stratum key — parallel
    across strata, state per task bounded by stratum size (a
    production variant with billion-row strata switches to the
    per-partition-top-K + merge pattern, same as TakeOrdered, keyed
    per stratum). Contrast stratified_sample: rate-based gate, no
    exact size guarantee; this is the exact-K form eval sets need."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "lang", "n_chars", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= EVAL_PER_STRATUM)
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_drawn"),
            F.sum("n_chars").cast("bigint").alias("drawn_chars"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Winsorization — outlier capping for model features: per-event-type
# exact p01/p99 fences (broadcast) clip the value column, and the
# report quantifies what clipping moved. The two-pass broadcast shape
# (tiny aggregate → map-side clip) is the alternative to a per-row
# percent_rank window over the full fact table.
# ---------------------------------------------------------------------------

WINSOR_LO = 0.01
WINSOR_HI = 0.99


@_register(
    "winsorize_values",
    f"""
    WITH fences AS (
      SELECT event_type,
             quantile_cont(value, {WINSOR_LO}) AS lo,
             quantile_cont(value, {WINSOR_HI}) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (e.value < f.lo) AS BIGINT) AS n_clipped_lo,
           CAST(COUNT(*) FILTER (e.value > f.hi) AS BIGINT) AS n_clipped_hi,
           ROUND(AVG(e.value), 6) AS mean_raw,
           ROUND(AVG(LEAST(GREATEST(e.value, f.lo), f.hi)), 6) AS mean_winsorized
    FROM events e JOIN fences f USING (event_type)
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type winsorized feature stats: exact percentile fences from
    one bounded-cardinality aggregate, broadcast back onto the fact
    scan, clip as pure codegen (least/greatest), report raw vs
    winsorized means plus clip counts.

    Scale shape: fences are |event_type| rows — the fact table never
    sorts, never windows; `percentile` is Spark's exact interpolated
    percentile matching DuckDB quantile_cont (the value_percentiles
    parity). At 100 TB the exact percentile's per-group sort can be
    swapped for percentile_approx without touching the clip side."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    fences = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(WINSOR_LO)).alias("lo"),
        F.percentile("value", F.lit(WINSOR_HI)).alias("hi"),
    )
    j = e.join(F.broadcast(fences), "event_type")
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        j.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_lo"),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_hi"),
            F.round(F.avg("value"), 6).alias("mean_raw"),
            F.round(F.avg(clipped), 6).alias("mean_winsorized"),
        )
        .orderBy("event_type")
    )
