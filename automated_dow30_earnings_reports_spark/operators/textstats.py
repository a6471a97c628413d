"""Text-analysis operators (SURVEY.md §2.11; generalizes A7/A8 keyword
scoring, ref find_IR_pgs_v1.py:98-112 and enhanced_selenium_scraper.py:641-679).

Everything is built from JVM builtins over the token array — no Python
in the hot path. At 100 TB each of these is a single narrow scan with
map-side aggregation: no shuffles except the final small groupBy.

The curation rules at the bottom follow the public LLM-data-pipeline
literature: repetition and hard quality gates per Gopher (Rae et al.
2021, "Scaling Language Models", §A1.1) and C4-style heuristics
(Raffel et al. 2020); content-addressed splits are the standard
hash-mod-100 scheme.
"""

from __future__ import annotations

import pandas as pd

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


# Stopword indicator sets per language (n-gram-heuristic lang-ID).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to"],
    "de": ["der", "die", "das", "und", "nicht"],
    "es": ["el", "la", "los", "que", "y"],
    "fr": ["le", "les", "des", "et", "une"],
}

EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is"]


def tokens_col(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def marker_score(toks: Column, markers: list[str]) -> Column:
    """A7-style boolean-indicator sum: how many marker words appear."""
    score = F.lit(0)
    for m in markers:
        score = score + F.when(F.array_contains(toks, m), 1).otherwise(0)
    return score


def _marker_score_sql(markers: list[str]) -> str:
    return " + ".join(
        f"(CASE WHEN list_contains(toks, '{m}') THEN 1 ELSE 0 END)" for m in markers
    )


@_register(
    "text_lang_id",
    f"""
    WITH t AS (
      SELECT lang, string_split_regex(trim(text), '\\s+') AS toks FROM documents
    ),
    scored AS (
      SELECT lang,
             {_marker_score_sql(LANG_MARKERS["en"])} AS s_en,
             {_marker_score_sql(LANG_MARKERS["de"])} AS s_de,
             {_marker_score_sql(LANG_MARKERS["es"])} AS s_es,
             {_marker_score_sql(LANG_MARKERS["fr"])} AS s_fr
      FROM t
    ),
    pred AS (
      SELECT lang,
             CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'unknown'
                  WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                  WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                  WHEN s_es >= s_fr THEN 'es'
                  ELSE 'fr' END AS predicted
      FROM scored
    )
    SELECT lang, predicted, COUNT(*) AS n
    FROM pred GROUP BY lang, predicted ORDER BY lang, predicted
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: per-language stopword-indicator scores,
    argmax with a fixed tie-break order, confusion matrix vs the label."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    scored = d.select(
        "lang",
        marker_score(toks, LANG_MARKERS["en"]).alias("s_en"),
        marker_score(toks, LANG_MARKERS["de"]).alias("s_de"),
        marker_score(toks, LANG_MARKERS["es"]).alias("s_es"),
        marker_score(toks, LANG_MARKERS["fr"]).alias("s_fr"),
    )
    predicted = (
        F.when(F.greatest("s_en", "s_de", "s_es", "s_fr") == 0, "unknown")
        .when(
            (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_fr")),
            "en",
        )
        .when((F.col("s_de") >= F.col("s_es")) & (F.col("s_de") >= F.col("s_fr")), "de")
        .when(F.col("s_es") >= F.col("s_fr"), "es")
        .otherwise("fr")
    )
    return (
        scored.select("lang", predicted.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "predicted")
    )


@_register(
    "text_quality_score",
    f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks, length(text) AS n_chars
      FROM documents
    ),
    feat AS (
      SELECT doc_id,
             len(toks) AS n_words,
             1.0 * ({_marker_score_sql(EN_STOPWORDS)}) / {len(EN_STOPWORDS)} AS stop_frac,
             1.0 * n_chars / len(toks) AS avg_word_len
      FROM t
    ),
    scored AS (
      SELECT CAST(least(floor(
               (0.5 * least(n_words / 50.0, 1.0)
                + 0.3 * stop_frac
                + 0.2 * least(avg_word_len / 8.0, 1.0)) * 10), 9) AS INT) AS decile
      FROM feat
    )
    SELECT decile, COUNT(*) AS n FROM scored GROUP BY decile ORDER BY decile
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, stopword coverage, and mean word length
    folded into a [0,1) score, bucketed into deciles."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    feat = d.select(
        F.size(toks).alias("n_words"),
        (marker_score(toks, EN_STOPWORDS) / F.lit(len(EN_STOPWORDS))).alias("stop_frac"),
        (F.length("text") / F.size(toks)).alias("avg_word_len"),
    )
    score = (
        0.5 * F.least(F.col("n_words") / 50.0, F.lit(1.0))
        + 0.3 * F.col("stop_frac")
        + 0.2 * F.least(F.col("avg_word_len") / 8.0, F.lit(1.0))
    )
    return (
        feat.select(F.least(F.floor(score * 10), F.lit(9)).cast("int").alias("decile"))
        .groupBy("decile")
        .agg(F.count("*").alias("n"))
        .orderBy("decile")
    )


@_register(
    "text_token_count",
    """
    SELECT source,
           CAST(SUM(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))) AS BIGINT)
             AS total_tokens,
           ROUND(AVG(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))), 4)
             AS avg_tokens
    FROM documents GROUP BY source ORDER BY source
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish regex (letter runs / digit runs /
    single symbols) — the budget estimator for LLM-pipeline inputs."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.regexp_extract_all("text", F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0))
    return (
        d.select("source", n_tok.alias("n_tok"))
        .groupBy("source")
        .agg(
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
        )
        .orderBy("source")
    )


@_register(
    "text_fingerprint",
    """
    SELECT md5(array_to_string(list_sort(list_distinct(
             string_split_regex(trim(text), '\\s+'))), ' ')) AS fingerprint,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY 1 ORDER BY keeper_doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words document fingerprint: md5 over the sorted distinct
    token set — catches token-order-shuffled duplicates that exact
    hashing misses."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(
        F.array_join(F.array_sort(F.array_distinct(tokens_col(F.col("text")))), " ").cast(
            "binary"
        )
    )
    return (
        d.select(fp.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_docs"))
        .orderBy("keeper_doc_id")
    )


KEYWORDS = ["spark", "query", "join", "table"]


@_register(
    "keyword_score",
    f"""
    WITH t AS (
      SELECT lang, string_split_regex(trim(text), '\\s+') AS toks FROM documents
    ),
    scored AS (
      SELECT lang, {_marker_score_sql(KEYWORDS)} AS score FROM t
    )
    SELECT lang, CAST(score AS INT) AS score, COUNT(*) AS n
    FROM scored GROUP BY lang, score ORDER BY lang, score
    """,
)
def keyword_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 keyword scoring (ref enhanced_selenium_scraper.py:668-672):
    indicator sum over a keyword list, histogrammed per language."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    return (
        d.select("lang", marker_score(toks, KEYWORDS).cast("int").alias("score"))
        .groupBy("lang", "score")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "score")
    )


# ---------------------------------------------------------------------------
# Training-data curation operators: repetition detection, rule-based
# quality gates (Gopher-style), deterministic dataset splits. These are
# the filters an LLM data pipeline runs between dedup and tokenization.
# ---------------------------------------------------------------------------


def shingles3(text: Column) -> Column:
    """Word 3-shingles — dedup.shingles_col(k=3): ONE shingling
    contract across the dedup tiers, contamination_ngram, and the
    repetition rule (the curation.py convention), so a fix to the
    short-document guard cannot leave them computing different sets."""
    from automated_dow30_earnings_reports_spark.operators.dedup import shingles_col

    return shingles_col(text, 3)


@_register(
    "text_repetition",
    """
    WITH sh AS (
      SELECT doc_id,
             CASE WHEN len(string_split_regex(trim(text), '\\s+')) >= 3
                  THEN [array_to_string(string_split_regex(trim(text), '\\s+')[i:i+2], ' ')
                        FOR i IN range(1, len(string_split_regex(trim(text), '\\s+')) - 1)]
                  ELSE CAST([] AS VARCHAR[]) END AS s
      FROM documents
    )
    SELECT doc_id,
           CAST(len(s) AS BIGINT)                                   AS n_shingles,
           ROUND(1.0 - 1.0 * len(list_distinct(s)) / len(s), 4)     AS dup_frac
    FROM sh WHERE len(s) > 0
    ORDER BY doc_id
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition: fraction of duplicate 3-shingles —
    the repetition quality rule (high dup_frac = boilerplate/spam).
    Array-local computation: zero shuffles, zero explodes."""
    d = load_table(spark, sf_dir, "documents")
    sh = shingles3(F.col("text"))
    out = d.select(
        "doc_id",
        F.size(sh).cast("bigint").alias("n_shingles"),
        F.round(
            1.0 - F.size(F.array_distinct(sh)) / F.size(sh), 4
        ).alias("dup_frac"),
    )
    return out.where(F.col("n_shingles") > 0).orderBy("doc_id")


_STOP_SQL = _marker_score_sql(EN_STOPWORDS)  # ONE marker-score SQL shape


def quality_pass_col(text: Column) -> Column:
    """The Gopher-gate conjunction as one reusable boolean expression
    (length band, mean word length, stopword floor, symbol ceiling) —
    the keep/drop contract consumed by the composed curation funnel;
    quality_filter_rules reports the same gates individually (its
    per-gate breakdown and this conjunction are pinned against each
    other in tests/test_curation_dedup_ops.py)."""
    toks = tokens_col(text)
    n_words = F.size(toks)
    avg_wlen = F.length(text) / n_words
    n_stop = marker_score(toks, EN_STOPWORDS)
    # empty text has symbol fraction DEFINED as 1.0 (a definite gate
    # fail): the raw 0/0 threw DIVIDE_BY_ZERO under the session's ANSI
    # default, and a NULL would ripple three-valued logic into every
    # consumer of the conjunction; the SQL twins mirror the CASE
    sym_frac = F.when(
        F.length(text) > 0,
        F.length(F.regexp_replace(text, "[a-zA-Z0-9 ]", "")) / F.length(text),
    ).otherwise(F.lit(1.0))
    return (
        n_words.between(20, 100000)
        & avg_wlen.between(2, 12)
        & (n_stop >= 2)
        & (sym_frac < 0.1)
    )


# DuckDB twin of quality_pass_col over a relation exposing (text, toks).
QUALITY_PASS_SQL = f"""(
    len(toks) BETWEEN 20 AND 100000
    AND (1.0 * length(text) / len(toks)) BETWEEN 2 AND 12
    AND ({_STOP_SQL}) >= 2
    AND (CASE WHEN length(text) > 0
              THEN 1.0 * length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                   / length(text)
              ELSE 1.0 END) < 0.1
)"""


@_register(
    "quality_filter_rules",
    f"""
    WITH t AS (
      SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents
    ),
    feat AS (
      SELECT doc_id,
             len(toks) AS n_words,
             1.0 * length(text) / len(toks) AS avg_wlen,
             {_STOP_SQL} AS n_stop,
             CASE WHEN length(text) > 0
                  THEN 1.0 * length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                       / length(text)
                  ELSE 1.0 END AS sym_frac
      FROM t
    ),
    rules AS (
      SELECT doc_id,
             (n_words BETWEEN 20 AND 100000)  AS pass_len,
             (avg_wlen BETWEEN 2 AND 12)      AS pass_avg_wlen,
             (n_stop >= 2)                    AS pass_stopwords,
             (sym_frac < 0.1)                 AS pass_symbols
      FROM feat
    )
    SELECT CAST(COUNT(*) AS BIGINT)                                   AS n_docs,
           CAST(COUNT(*) FILTER (pass_len) AS BIGINT)                 AS n_pass_len,
           CAST(COUNT(*) FILTER (pass_avg_wlen) AS BIGINT)            AS n_pass_avg_wlen,
           CAST(COUNT(*) FILTER (pass_stopwords) AS BIGINT)           AS n_pass_stopwords,
           CAST(COUNT(*) FILTER (pass_symbols) AS BIGINT)             AS n_pass_symbols,
           CAST(COUNT(*) FILTER (pass_len AND pass_avg_wlen AND pass_stopwords
                                 AND pass_symbols) AS BIGINT)         AS n_pass_all
    FROM rules
    """,
)
def quality_filter_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style hard quality gates (length band, mean word length,
    stopword floor, symbol ceiling) + the conjunction — the keep/drop
    decision a curation pipeline applies per document."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    feat = d.select(
        F.size(toks).alias("n_words"),
        (F.length("text") / F.size(toks)).alias("avg_wlen"),
        marker_score(toks, EN_STOPWORDS).alias("n_stop"),
        F.when(
            F.length("text") > 0,
            F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")) / F.length("text"),
        ).otherwise(F.lit(1.0)).alias("sym_frac"),
    )
    rules = feat.select(
        F.col("n_words").between(20, 100000).alias("pass_len"),
        F.col("avg_wlen").between(2, 12).alias("pass_avg_wlen"),
        (F.col("n_stop") >= 2).alias("pass_stopwords"),
        (F.col("sym_frac") < 0.1).alias("pass_symbols"),
    )
    cnt = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0)).cast("bigint")
    return rules.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        cnt("pass_len").alias("n_pass_len"),
        cnt("pass_avg_wlen").alias("n_pass_avg_wlen"),
        cnt("pass_stopwords").alias("n_pass_stopwords"),
        cnt("pass_symbols").alias("n_pass_symbols"),
        F.sum(
            F.when(
                F.col("pass_len")
                & F.col("pass_avg_wlen")
                & F.col("pass_stopwords")
                & F.col("pass_symbols"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_pass_all"),
    )


@_register(
    "deterministic_split",
    """
    WITH h AS (
      SELECT lang,
             (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256
              + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100 AS p
      FROM documents
    )
    SELECT lang,
           CASE WHEN p < 80 THEN 'train' WHEN p < 90 THEN 'val' ELSE 'test' END AS split,
           COUNT(*) AS n
    FROM h GROUP BY lang, split ORDER BY lang, split
    """,
)
def deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed train/val/test assignment: the split is a pure
    function of the document id (md5-derived), so it is stable across
    runs, machines, and data re-partitioning — no rand(), no seed
    drift. 80/10/10 by construction."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    p = (
        F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))
    ) % 100
    split = (
        F.when(p < 80, "train").when(p < 90, "val").otherwise("test").alias("split")
    )
    return (
        d.select("lang", split)
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "split")
    )


@_register(
    "vocab_topk",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    )
    SELECT term,
           CAST(COUNT(*) AS BIGINT)               AS tf,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM tok GROUP BY term
    ORDER BY tf DESC, term ASC LIMIT 50
    """,
)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction: the 50 most frequent corpus terms with
    document frequency — the seed step of tokenizer training (BPE's
    initial unigram table). One explode + one map-side-combined
    aggregate; the top-k is TakeOrderedAndProject, so only 50 rows per
    partition ever reach the driver-side merge."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("term"))
    return (
        tok.groupBy("term")
        .agg(
            F.count("*").cast("bigint").alias("tf"),
            F.count_distinct("doc_id").cast("bigint").alias("df"),
        )
        .orderBy(F.desc("tf"), F.asc("term"))
        .limit(50)
    )


@_register(
    "tfidf_top_terms",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    idf AS (
      SELECT term,
             ln((SELECT COUNT(*) FROM documents) * 1.0 / COUNT(DISTINCT doc_id)) AS idf
      FROM tok GROUP BY term
    ),
    ranked AS (
      SELECT tf.doc_id, tf.term,
             CAST(tf.tf AS BIGINT) AS tf,
             ROUND(tf.tf * idf.idf, 4) AS tfidf,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf * idf.idf DESC, tf.term ASC) AS rn
      FROM tf JOIN idf USING (term)
    )
    SELECT doc_id, term, tf, tfidf FROM ranked WHERE rn <= 3
    ORDER BY doc_id, tfidf DESC, term
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 terms by tf-idf (the classic keyword
    extractor). ONE tokenize pass: tf is the (doc, term) aggregate of
    the exploded scan, checkpointed — it IS the postings-lite frame a
    text index stores — and df is then count(*) per term OVER tf (one
    row per (doc, term) by construction), so the expensive
    count_distinct expand over raw tokens never runs and the second
    explode disappears. N comes from a metadata-only count of the raw
    table (tf can't see token-less documents) as a one-row broadcast;
    the per-doc top-3 is a window over doc_id — also the natural
    partitioning at 100 TB, so the rank never concentrates on one
    executor."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("term"))
    tf = (
        tok.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    n_docs = d.select(F.count("*").alias("n"))
    idf = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select("term", F.log(F.col("n") * 1.0 / F.col("df")).alias("idf"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.col("tf") * F.col("idf")), F.asc("term")
    )
    return (
        tf.join(idf, "term")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.round(F.col("tf") * F.col("idf"), 4).alias("tfidf"),
        )
        .orderBy("doc_id", F.desc("tfidf"), "term")
    )


@_register(
    "length_mad_udaf",
    """
    WITH m AS (
      SELECT source, median(n_chars) AS med FROM documents GROUP BY source
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT)                  AS n_docs,
           ROUND(median(abs(d.n_chars - m.med)), 1)  AS mad_chars
    FROM documents d JOIN m USING (source)
    GROUP BY d.source ORDER BY d.source
    """,
)
def length_mad_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation of document length per source — the
    robust spread statistic quality pipelines use for outlier gates.
    Implemented as a TRUE Pandas UDAF (grouped-agg pandas_udf): medians
    are holistic (not partial-aggregatable), so Spark ships each
    group's column to Python as one Arrow batch and the UDAF reduces it
    with numpy. This completes the §2.10 surface: scalar pandas UDFs,
    mapInPandas UDTFs, applyInPandas blocks, and a grouped-agg UDAF.
    At 100 TB the same query bounds per-group batch size by
    pre-bucketing or switches to approx_percentile — the tolerance
    pattern pinned in tests/test_scale_features.py."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def mad(v: pd.Series) -> float:
        import numpy as np

        a = v.to_numpy(dtype="float64")
        return float(np.median(np.abs(a - np.median(a))))

    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").cast("bigint").alias("n_docs"))
    mads = d.groupBy("source").agg(
        F.round(mad(F.col("n_chars")), 1).alias("mad_chars")
    )
    return counts.join(mads, "source").orderBy("source")


@_register(
    "doc_length_histogram",
    """
    SELECT CAST(floor(log2(n_chars)) AS BIGINT) AS log2_bucket,
           CAST(COUNT(*) AS BIGINT)             AS n_docs,
           ROUND(AVG(n_chars), 2)               AS avg_chars
    FROM documents WHERE n_chars > 0
    GROUP BY log2_bucket ORDER BY log2_bucket
    """,
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed document-length histogram — the corpus-shape
    diagnostic run before choosing packing/truncation lengths. Pure
    map-side arithmetic plus one tiny aggregate."""
    d = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    return (
        d.groupBy(F.floor(F.log2("n_chars")).cast("bigint").alias("log2_bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy("log2_bucket")
    )


PMI_TOP_N = 20


def _pmi_oracle() -> str:
    return rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    uni AS (SELECT unnest(t) AS tok FROM toks),
    big AS (
      SELECT (u).w1 AS w1, (u).w2 AS w2 FROM (
        SELECT unnest([{{'w1': t[i], 'w2': t[i + 1]}}
                       FOR i IN range(1, len(t))]) AS u
        FROM toks WHERE len(t) >= 2
      )
    ),
    uc AS (SELECT tok, COUNT(*) AS cu FROM uni GROUP BY tok),
    nu AS (SELECT COUNT(*) AS total_uni FROM uni),
    bc AS (SELECT w1, w2, COUNT(*) AS cb FROM big GROUP BY w1, w2),
    nb AS (SELECT COUNT(*) AS total_big FROM big)
    SELECT w1, w2, CAST(cb AS BIGINT) AS n_pairs,
           ROUND(ln((1.0 * cb / total_big) /
                    ((1.0 * a.cu / total_uni) * (1.0 * b.cu / total_uni))), 3)
             AS pmi
    FROM bc
    JOIN uc a ON a.tok = w1
    JOIN uc b ON b.tok = w2
    CROSS JOIN nu CROSS JOIN nb
    QUALIFY row_number() OVER (ORDER BY cb DESC, w1, w2) <= {PMI_TOP_N}
    ORDER BY n_pairs DESC, w1, w2
    """


def _doc_bigrams(d: DataFrame) -> DataFrame:
    """Map-side tail-zip (w1, w2) bigrams over whitespace tokens —
    shared by pmi_bigrams (statistics) and phrase_search_postings
    (probe-phrase selection), so the two operators cannot drift on
    tokenization or the size>=2 guard."""
    t = F.split(F.trim(F.col("text")), r"\s+")
    pairs = F.arrays_zip(
        F.slice(t, 1, F.size(t) - 1).alias("w1"),
        F.slice(t, 2, F.size(t) - 1).alias("w2"),
    )
    return (
        d.where(F.size(t) >= 2)
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


@_register("pmi_bigrams", _pmi_oracle())
def pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: pointwise mutual information of the corpus's
    top bigrams (phrase discovery for tokenizer/vocab induction).
    Bigrams are built MAP-SIDE by zipping each token array with its
    own tail — no window, no per-doc shuffle; the only shuffles are
    the two count aggregates. Unigram totals ride in as broadcast
    scalars. Top-N is tie-broken on (count, w1, w2) so the cutoff is
    deterministic across engines."""
    d = load_table(spark, sf_dir, "documents")
    big = _doc_bigrams(d)
    uni = d.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"))
    # count aggregates checkpointed at vocabulary grain: each feeds the
    # PMI join AND its own total, and the totals are exact integer SUMs
    # over the counts — deriving them from the aggregates instead of
    # re-scanning the corpus cuts the documents scans from 5 to 2
    uc = uni.groupBy("tok").agg(F.count("*").alias("cu")).localCheckpoint(
        eager=True
    )
    bc = big.groupBy("w1", "w2").agg(F.count("*").alias("cb")).localCheckpoint(
        eager=True
    )
    total_uni = uc.agg(F.sum("cu").alias("total_uni"))
    total_big = bc.agg(F.sum("cb").alias("total_big"))
    pmi = F.round(
        F.log(
            (F.col("cb") / F.col("total_big"))
            / ((F.col("a.cu") / F.col("total_uni")) * (F.col("b.cu") / F.col("total_uni")))
        ),
        3,
    )
    # NO hard broadcast hint on the unigram side: uc is VOCABULARY
    # grain, which at 100 TB does not fit a driver (the unigram_logprob
    # scorer's lookup join makes the same call) — AQE broadcasts it
    # while it fits and falls back to a hash join on tok beyond that.
    # Only the 1-row totals carry the hint.
    return (
        bc.join(uc.alias("a"), F.col("w1") == F.col("a.tok"))
        .join(uc.alias("b"), F.col("w2") == F.col("b.tok"))
        .crossJoin(F.broadcast(total_uni))
        .crossJoin(F.broadcast(total_big))
        .select(
            "w1",
            "w2",
            F.col("cb").cast("bigint").alias("n_pairs"),
            pmi.alias("pmi"),
        )
        .orderBy(F.desc("n_pairs"), "w1", "w2")
        .limit(PMI_TOP_N)
    )


# ---------------------------------------------------------------------------
# Unigram LM quality scoring — the perplexity-filter shape (CCNet /
# Wenzek et al. 2020 score documents with a KenLM model and drop the
# high-perplexity tail; Gopher and many pretraining pipelines keep a
# variant). The unigram model IS trained in-query: token frequencies
# over the corpus become log-probabilities, and each document is scored
# by its mean token log-prob. Cross-engine exact because both engines
# compute ln(count/total) on identical integer counts; the mean rounds
# to 6 decimals to absorb summation order.
#
# Scale shape: ONE materialized token-explode scan feeds (a) the vocab
# aggregate and (b) the scoring join; the total-token denominator is
# SUM(c) over the vocab (vocabulary-sized input, no extra corpus
# pass). The vocab is bounded by vocabulary size, not corpus size —
# Zipf guarantees it collapses; the scoring join shuffles on the token
# key (or broadcasts when the vocab fits). No per-row Python anywhere.
# ---------------------------------------------------------------------------


@_register(
    "unigram_logprob_score",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ),
    vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM toks),
    scored AS (
      SELECT t.doc_id, ln(v.c / tot.n) AS lp
      FROM toks t JOIN vocab v USING (tok) CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(lp), 6)        AS avg_logprob
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
)
def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean unigram log-probability per document (the self-trained
    perplexity filter): low scores flag unnatural token distributions
    (boilerplate, garbled decodes) for the drop list."""
    d = load_table(spark, sf_dir, "documents")
    # materialized: the explode feeds both the vocab aggregate and the
    # scoring join's probe side — without this the corpus tokenizes
    # twice; the total-token count comes from the (vocabulary-sized)
    # vocab aggregate as SUM(c), never from a third corpus scan
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
    ).localCheckpoint(eager=True)
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c"))
    tot = vocab.agg(F.sum("c").cast("double").alias("n"))
    scored = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", F.log(F.col("c") / F.col("n")).alias("lp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# BM25 retrieval — the IR scoring primitive between tf-idf keyword
# extraction (tfidf_top_terms, per-doc) and embedding ANN (semantic):
# score the corpus against a fixed query, top-k.
# ---------------------------------------------------------------------------

BM25_QUERY = ("join", "scan", "window", "vector")  # fixed query terms
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10


def bm25_sql_parts() -> dict[str, str]:
    """The DuckDB-side BM25 building blocks: CTE column lists and the
    fixed-order score expression. Shared by _bm25_oracle and the
    hybrid-RRF oracle (operators/evaluation.py), mirroring how
    bm25_scored_input/_bm25_score_col are shared Spark-side."""
    toks = "string_split_regex(trim(text), '\\s+')"
    tf_cols = ", ".join(
        f"CAST(len(list_filter({toks}, x -> x = '{t}')) AS BIGINT) AS tf_{i}"
        for i, t in enumerate(BM25_QUERY)
    )
    df_cols = ", ".join(
        f"CAST(COUNT(*) FILTER (tf_{i} > 0) AS BIGINT) AS df_{i}"
        for i in range(len(BM25_QUERY))
    )
    # Fixed-order expression tree: term 0 + term 1 + ... — identical
    # double arithmetic in both engines, no aggregate over doubles.
    score_terms = " + ".join(
        f"(ln((s.n_docs - s.df_{i} + 0.5) / (s.df_{i} + 0.5) + 1.0)"
        f" * (d.tf_{i} * ({BM25_K1} + 1.0))"
        f" / (d.tf_{i} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * d.dl / s.avgdl)))"
        for i in range(len(BM25_QUERY))
    )
    any_tf = " + ".join(f"d.tf_{i}" for i in range(len(BM25_QUERY)))
    return {
        "toks": toks,
        "tf_cols": tf_cols,
        "df_cols": df_cols,
        "score": score_terms,
        "any_tf": any_tf,
    }


def _bm25_oracle(where: str = "") -> str:
    """Scan-side BM25 oracle. ``where`` (e.g. the delete predicate's
    complement) restricts the corpus; the default empty string keeps
    the text byte-identical to the long-attested full-corpus form."""
    p = bm25_sql_parts()
    return f"""
    WITH per_doc AS (
      SELECT doc_id, CAST(len({p["toks"]}) AS BIGINT) AS dl, {p["tf_cols"]}
      FROM documents{where}
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
             {p["df_cols"]}
      FROM per_doc
    )
    SELECT d.doc_id, d.dl, ROUND({p["score"]}, 6) AS bm25
    FROM per_doc d CROSS JOIN stats s
    WHERE {p["any_tf"]} > 0
    ORDER BY {p["score"]} DESC, d.doc_id
    LIMIT {BM25_TOPK}
    """


def _bm25_score_col() -> Column:
    """The BM25 score as ONE fixed-order expression tree over integer
    columns (tf_i, df_i, dl, n_docs) + the avgdl scalar — shared by the
    scan-side retrieval and the persisted-index retrieval so the two
    paths cannot drift arithmetically."""
    score = None
    for i in range(len(BM25_QUERY)):
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5) + 1.0
        )
        term = (
            idf
            * (F.col(f"tf_{i}") * (BM25_K1 + 1.0))
            / (
                F.col(f"tf_{i}")
                + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
            )
        )
        score = term if score is None else score + term
    return score


def bm25_scored_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The checkpointed per-document integer frame (doc_id, dl, tf_*)
    crossJoined with the broadcast global-stats row (n_docs, avgdl,
    df_*) — _bm25_score_col() evaluates directly on top of it. Shared
    by bm25_retrieval and the hybrid RRF fusion
    (operators/evaluation.py) so the lexical leg cannot drift."""
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = tokens_col(F.col("text"))
    def _eq(term: str):
        # single-arg lambda: a two-arg one would hit F.filter's
        # (element, index) overload and compare tokens to positions
        return lambda x: x == F.lit(term)

    tf_exprs = [
        F.size(F.filter(toks, _eq(t))).cast("bigint").alias(f"tf_{i}")
        for i, t in enumerate(BM25_QUERY)
    ]
    # The narrow (doc_id, dl, tf_*) frame feeds both the global stats
    # aggregate and the scoring pass; localCheckpoint materializes the
    # tokenization ONCE (plan audit showed two full documents scans
    # re-running the regex split without it — ~48 bytes/doc vs
    # re-reading the text corpus, the same aggregate-feeds-its-own-
    # global-stat shape q15 pins).
    per_doc = d.select(
        "doc_id", F.size(toks).cast("bigint").alias("dl"), *tf_exprs
    ).localCheckpoint(eager=True)
    stats = per_doc.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias(f"df_{i}")
            for i in range(len(BM25_QUERY))
        ],
    )
    return per_doc.crossJoin(F.broadcast(stats))


def bm25_any_tf_col() -> Column:
    """tf_0 + tf_1 + ... — the 'document matches at least one query
    term' predicate over bm25_scored_input's columns."""
    any_tf = None
    for i in range(len(BM25_QUERY)):
        any_tf = (
            F.col(f"tf_{i}")
            if any_tf is None
            else any_tf + F.col(f"tf_{i}")
        )
    return any_tf


@_register("bm25_retrieval", _bm25_oracle())
def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 retrieval for a fixed query (Robertson/Sparck Jones
    idf with the +1 floor, k1=1.2, b=0.75 — see the module constants).

    Determinism: every aggregate is INTEGER (per-doc term frequencies,
    doc lengths, document frequencies, N) — the floating-point score
    is ONE fixed-order expression tree over those integers plus the
    avgdl scalar, so both engines compute bit-identical doubles and
    the top-k cut (score DESC, doc_id) is exact — no double SUM whose
    fold order could differ.

    Scale shape: term frequencies are map-side array arithmetic on
    the scan (no explode — the query is a fixed literal list, so tf
    per term is a filter-count inside the tokens array), materialized
    once as a narrow int frame that feeds both the global stats row
    (broadcast back over it) and the scoring pass; top-k is
    TakeOrdered. Query-at-a-time over 100 TB in one text scan — the
    inverted-index upgrade only pays when queries vastly outnumber
    scans."""
    score = _bm25_score_col()
    return (
        bm25_scored_input(spark, sf_dir)
        .where(bm25_any_tf_col() > 0)
        .select("doc_id", "dl", score.alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOPK)
        .select("doc_id", "dl", F.round("score", 6).alias("bm25"))
    )


# ---------------------------------------------------------------------------
# Positional-postings phrase search: build (token, doc, position)
# postings, pick the corpus's top bigram as the probe phrase, and
# answer "which documents contain the phrase, how often" by
# intersecting the two words' postings on position adjacency — the
# boolean/phrase half of an IR stack (bm25_retrieval is the ranked
# half). The production property: once postings exist, a phrase query
# touches ONLY the query words' posting lists, never the corpus.
# ---------------------------------------------------------------------------

PHRASE_TOP_DOCS = 10


def _phrase_oracle() -> str:
    return rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    big AS (
      SELECT (u).w1 AS w1, (u).w2 AS w2 FROM (
        SELECT unnest([{{'w1': t[i], 'w2': t[i + 1]}}
                       FOR i IN range(1, len(t))]) AS u
        FROM toks WHERE len(t) >= 2
      )
    ),
    phrase AS (
      SELECT w1, w2 FROM (
        SELECT w1, w2, COUNT(*) AS cb FROM big GROUP BY w1, w2
      ) QUALIFY row_number() OVER (ORDER BY cb DESC, w1, w2) = 1
    ),
    postings AS (
      SELECT doc_id, (u).tok AS tok, (u).pos AS pos FROM (
        SELECT doc_id,
               unnest([{{'tok': t[i], 'pos': i}} FOR i IN range(1, len(t) + 1)]) AS u
        FROM toks
      )
    ),
    hits AS (
      SELECT p1.doc_id, COUNT(*) AS n_occurrences
      FROM phrase ph
      JOIN postings p1 ON p1.tok = ph.w1
      JOIN postings p2 ON p2.doc_id = p1.doc_id
                      AND p2.pos = p1.pos + 1
                      AND p2.tok = ph.w2
      GROUP BY p1.doc_id
    )
    SELECT ph.w1, ph.w2,
           CAST(h.doc_id AS BIGINT) AS doc_id,
           CAST(h.n_occurrences AS BIGINT) AS n_occurrences
    FROM hits h CROSS JOIN phrase ph
    QUALIFY row_number() OVER (ORDER BY h.n_occurrences DESC, h.doc_id)
            <= {PHRASE_TOP_DOCS}
    ORDER BY n_occurrences DESC, doc_id
    """


@_register("phrase_search_postings", _phrase_oracle())
def phrase_search_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top documents for the corpus's most frequent bigram, answered
    through positional postings. Two stages: (1) the probe phrase is
    the top (count, w1, w2)-tie-broken bigram from the same map-side
    tail-zip pmi_bigrams uses — a 1-row frame, broadcast; (2) postings
    are FILTERED to the two query words by that broadcast semi-probe
    BEFORE the adjacency self-join, so the position intersection runs
    over two posting lists, not the corpus — the inverted-index
    contract that keeps phrase queries per-term-frequency-sized at
    100 TB (the full postings build is the one corpus-sized pass,
    amortized across every query in a real deployment).

    Tie and duplicate semantics: occurrences count at the position
    grain (overlapping repeats each count); the top-doc cut is
    (n_occurrences DESC, doc_id) — deterministic both engines."""
    d = load_table(spark, sf_dir, "documents")
    # The 1-row probe phrase is referenced three times (two semi-probes
    # + the output join); cut the corpus-sized bigram pipeline behind
    # it so it runs once (the bounded-frame-referenced->1x rule).
    phrase = (
        _doc_bigrams(d)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cb"))
        .orderBy(F.desc("cb"), "w1", "w2")
        .limit(1)
        .select("w1", "w2")
        .localCheckpoint(eager=True)
    )
    t = F.split(F.trim(F.col("text")), r"\s+")
    postings = d.select(
        "doc_id", F.posexplode(t).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    # ONE broadcast filter pass for both query terms, checkpointed:
    # two separate semi-joins each re-ran the corpus tokenize+posexplode
    # (the docstring's one-corpus-pass claim was false by 2x at the most
    # expensive stage). The checkpointed frame holds only the two terms'
    # posting lists — per-term-frequency-sized, never the corpus.
    qpost = postings.join(
        F.broadcast(phrase),
        (postings.tok == phrase.w1) | (postings.tok == phrase.w2),
    ).localCheckpoint(eager=True)
    p1 = qpost.where(F.col("tok") == F.col("w1")).select(
        "doc_id", F.col("pos").alias("pos1")
    )
    p2 = qpost.where(F.col("tok") == F.col("w2")).select(
        F.col("doc_id").alias("doc_id2"), F.col("pos").alias("pos2")
    )
    hits = (
        p1.join(
            p2,
            (F.col("doc_id2") == F.col("doc_id")) & (F.col("pos2") == F.col("pos1") + 1),
        )
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_occurrences"))
    )
    return (
        hits.orderBy(F.desc("n_occurrences"), "doc_id")
        .limit(PHRASE_TOP_DOCS)
        .crossJoin(F.broadcast(phrase))
        .select(
            "w1",
            "w2",
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "n_occurrences",
        )
        # Terminal sort AFTER the crossJoin: the pre-limit orderBy only
        # survives by the current physical plan (TakeOrdered), not by
        # contract — every registered query must end in an orderBy.
        .orderBy(F.desc("n_occurrences"), "doc_id")
    )


# ---------------------------------------------------------------------------
# Quality tier 3 — linear classifier (the fastText/CCNet/DCLM shape).
# The quality stack so far has hard rules (quality_filter_rules,
# Gopher) and a unigram LM (unigram_logprob_score, CCNet); modern
# corpus pipelines add a learned linear gate: hash each token bigram
# into a D-dim feature space, dot the (sparse) feature counts against
# a weight vector, squash with a sigmoid, keep score >= 0.5. The
# weight vector here is a deterministic literal — w[j] derives from j
# by exact integer arithmetic — i.e. the degenerate form of the
# broadcast weights dim (no table needed at all; a trained model would
# broadcast its D floats the way ir_candidate_urls broadcasts its
# dims).
#
# Cross-engine exactness: per-document we sum INTEGER weights
# ((fid*37+11) % 97 - 48, exact bigint in both engines, products
# < 2^42), divide ONCE by 97*n, and sigmoid — so the only FP
# divergence surface is exp(), collapsed by the 6-dp rounding that
# also drives the keep gate (both engines gate on the ROUNDED score,
# so a green hash implies identical gates).
# ---------------------------------------------------------------------------

QC_DIM = 256  # hashed feature-space width


def _qc_fid(s: Column) -> Column:
    """bigram string -> feature id: 28-bit md5 digest mod QC_DIM (the
    dedup family's digest contract, operators/dedup.py doc_shingle_hashes)."""
    return (
        F.conv(F.substring(F.md5(s.cast("binary")), 1, 7), 16, 10).cast("bigint")
        % QC_DIM
    )


def quality_classifier_cols(text: Column) -> tuple[Column, Column]:
    """(score, keep) columns for an arbitrary text column — the shared
    gate expression, composable with the curation funnel the same way
    quality_pass_col is."""
    t = tokens_col(text)
    ws = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: (_qc_fid(F.array_join(F.slice(t, i, 2), " ")) * 37 + 11) % 97
            - 48,
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    sum_k = F.aggregate(ws, F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    n = F.size(ws)
    x = F.when(n > 0, sum_k / (F.lit(97.0) * n)).otherwise(F.lit(0.0))
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-x)), 6)
    return score, score >= F.lit(0.5)


def _qc_oracle() -> str:
    from automated_dow30_earnings_reports_spark.operators.dedup import _h_of

    h_bigram = _h_of("toks[i] || ' ' || toks[i+1]")
    w_of = f"((({h_bigram}) % {QC_DIM}) * 37 + 11) % 97 - 48"
    return f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
    ),
    feats AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 2
                  THEN [{w_of} FOR i IN range(1, len(toks))]
                  ELSE CAST([] AS BIGINT[]) END AS ws
      FROM t
    ),
    scored AS (
      SELECT doc_id,
             ROUND(1.0 / (1.0 + exp(-(CASE WHEN len(ws) > 0
                    THEN list_aggregate(ws, 'sum') / (97.0 * len(ws))
                    ELSE 0.0 END))), 6) AS qc_score,
             CAST(len(ws) AS BIGINT) AS n_feats
      FROM feats
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, qc_score,
           (qc_score >= 0.5) AS keep, n_feats
    FROM scored ORDER BY doc_id
    """


@_register("quality_classifier_linear", _qc_oracle())
def quality_classifier_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document linear quality score + keep gate. One corpus scan,
    entirely map-side codegen (the feature hash, the integer weight
    sum, and the sigmoid are all per-row array expressions — no
    explode, no shuffle, no Python); the terminal orderBy is the only
    exchange. At 100 TB this is the cheapest operator in the quality
    stack: a wide map over the text column."""
    d = spread(load_table(spark, sf_dir, "documents"))
    t = tokens_col(F.col("text"))
    score, keep = quality_classifier_cols(F.col("text"))
    n_feats = F.when(F.size(t) >= 2, F.size(t) - 1).otherwise(0).cast("bigint")
    return d.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        score.alias("qc_score"),
        keep.alias("keep"),
        n_feats.alias("n_feats"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# BPE merge training (Sennrich et al. 2016) — the tokenizer-training
# operator of an LLM data pipeline. Works on the word-frequency table
# (the fast-BPE formulation: pair statistics weighted by word freq, so
# corpus size only enters through one groupBy; the working set is the
# Heaps-law-bounded vocabulary). BPE_ROUNDS top merges are learned by
# the pagerank/kmeans unroll technique: each round = (1) adjacent-pair
# statistics over the symbol arrays, (2) global argmax with a
# deterministic (count DESC, pair ASC) tie-break — a 1-row broadcast,
# (3) greedy left-to-right non-overlapping merge of that pair in every
# word. The merge is a map-side array fold in Spark; the oracle
# reproduces the identical greedy semantics positionally (occurrence
# islands, alternate selection) since DuckDB lambdas can't build
# lists — two independent constructions of the same contract, which is
# exactly what the hash check is for.
# ---------------------------------------------------------------------------

BPE_ROUNDS = 3
BPE_TOP_WORDS = 2000  # frequency-threshold vocabulary (production practice)


def _bpe_merge_fold(syms: Column, px: Column, py: Column) -> Column:
    """Greedy left-to-right non-overlapping merge of (px, py) in one
    symbol array: fold each symbol onto an accumulator, merging when
    the accumulator's tail is px and the incoming symbol is py. A
    merged symbol (px||py) can never re-match px (py is non-empty), so
    the fold is exactly the non-overlapping scan."""
    merged = F.concat(px, py)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == px) & (s == py),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _bpe_chain_sql() -> str:
    """Shared WITH-body: vocabulary build + BPE_ROUNDS unrolled merge
    rounds (top{r} = round r's learned merge, vocab{r} = the vocabulary
    after applying it). Consumed by the trainer oracle (reads the
    top{r} rows) and the encode-stats oracle (reads vocab0 vs
    vocab{BPE_ROUNDS})."""
    rounds = []
    for r in range(1, BPE_ROUNDS + 1):
        prev = f"vocab{r - 1}"
        rounds.append(
            f"""
    idx{r} AS (
      SELECT word, freq, syms, unnest(range(1, len(syms))) AS i FROM {prev}
    ),
    pairs{r} AS (
      SELECT syms[i] AS px, syms[i+1] AS py, SUM(freq) AS c
      FROM idx{r} GROUP BY 1, 2
    ),
    top{r} AS (SELECT px, py, c FROM pairs{r} ORDER BY c DESC, px, py LIMIT 1),
    occ{r} AS (
      SELECT x.word, x.i,
             x.i - ROW_NUMBER() OVER (PARTITION BY x.word ORDER BY x.i) AS isl
      FROM idx{r} x CROSS JOIN top{r} t
      WHERE x.syms[x.i] = t.px AND x.syms[x.i+1] = t.py
    ),
    sel{r} AS (
      SELECT word, i FROM (
        SELECT word, i, MIN(i) OVER (PARTITION BY word, isl) AS i0 FROM occ{r}
      ) WHERE (i - i0) % 2 = 0
    ),
    posn{r} AS (
      SELECT word, freq, syms, unnest(range(1, len(syms) + 1)) AS i FROM {prev}
    ),
    vocab{r} AS (
      SELECT p.word, p.freq,
             list(CASE WHEN s.i IS NOT NULL THEN p.syms[p.i] || p.syms[p.i+1]
                       ELSE p.syms[p.i] END ORDER BY p.i) AS syms
      FROM posn{r} p
      LEFT JOIN sel{r} s ON s.word = p.word AND s.i = p.i
      LEFT JOIN sel{r} cons ON cons.word = p.word AND cons.i = p.i - 1
      WHERE cons.i IS NULL
      GROUP BY p.word, p.freq
    )"""
        )
    return f"""toks AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word FROM documents
    ),
    wfreq AS (SELECT word, COUNT(*) AS freq FROM toks GROUP BY word),
    topw AS (SELECT word, freq FROM wfreq ORDER BY freq DESC, word LIMIT {BPE_TOP_WORDS}),
    vocab0 AS (
      SELECT word, freq, regexp_extract_all(word, '.') AS syms FROM topw
      WHERE len(regexp_extract_all(word, '.')) >= 2
    ),
    {",".join(rounds)}"""


def _bpe_oracle() -> str:
    tops = " UNION ALL ".join(
        f"SELECT {r} AS merge_round, px AS left_sym, py AS right_sym, "
        f"CAST(c AS BIGINT) AS pair_freq FROM top{r}"
        for r in range(1, BPE_ROUNDS + 1)
    )
    return f"""
    WITH {_bpe_chain_sql()}
    {tops}
    ORDER BY merge_round
    """


def _bpe_train(spark: SparkSession, sf_dir: str):
    """Shared trainer: returns (merge DataFrames, initial vocab, vocab
    after ALL learned merges are applied). One corpus pass; each round
    one vocab-sized aggregate + 1-row broadcast argmax + map-side
    merge fold; localCheckpoint keeps the loop lineage flat."""
    d = spread(load_table(spark, sf_dir, "documents"))
    words = d.select(F.explode(tokens_col(F.col("text"))).alias("word"))
    topw = (
        words.groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "word")
        .limit(BPE_TOP_WORDS)
    )
    syms0 = F.regexp_extract_all(F.col("word"), F.lit("."), 0)
    vocab0 = (
        topw.select("word", "freq", syms0.alias("syms"))
        .where(F.size("syms") >= 2)
        .localCheckpoint(eager=True)
    )

    merges = []
    vocab = vocab0
    for r in range(1, BPE_ROUNDS + 1):
        # Guarded sequence (the shingles_col convention): a word whose
        # symbols fully merged in an earlier round has size(syms) == 1,
        # and unguarded sequence(1, 0) yields [1, 0] (Spark steps -1
        # when start > stop), crashing element_at under ANSI.
        prs = F.when(
            F.size("syms") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("syms"), i).alias("px"),
                    F.element_at(F.col("syms"), i + 1).alias("py"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<px:string,py:string>>"))
        stats = (
            vocab.select("freq", F.explode(prs).alias("p"))
            .groupBy("p.px", "p.py")
            .agg(F.sum("freq").alias("c"))
        )
        top = (
            stats.orderBy(F.desc("c"), "px", "py")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        merges.append(
            top.select(
                F.lit(r).alias("merge_round"),
                F.col("px").alias("left_sym"),
                F.col("py").alias("right_sym"),
                F.col("c").cast("bigint").alias("pair_freq"),
            )
        )
        vocab = (
            vocab.crossJoin(F.broadcast(top))
            .select(
                "word",
                "freq",
                _bpe_merge_fold(F.col("syms"), F.col("px"), F.col("py")).alias(
                    "syms"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return merges, vocab0, vocab


@_register("bpe_train_merges", _bpe_oracle())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first BPE_ROUNDS byte-pair merges from the corpus.

    Scale shape: the corpus is touched ONCE (token explode + word
    groupBy); everything after runs on the <= BPE_TOP_WORDS vocabulary
    — per round one vocab-sized pair aggregate, a 1-row broadcast
    argmax, and a map-side fold to apply the merge (no shuffle)."""
    merges, _, _ = _bpe_train(spark, sf_dir)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out.orderBy("merge_round")


@_register(
    "bpe_encode_stats",
    f"""
    WITH {_bpe_chain_sql()},
    before AS (
      SELECT CAST(SUM(freq) AS BIGINT) AS n_words,
             CAST(SUM(freq * len(syms)) AS BIGINT) AS syms_before
      FROM vocab0
    ),
    after AS (
      SELECT CAST(SUM(freq * len(syms)) AS BIGINT) AS syms_after
      FROM vocab{BPE_ROUNDS}
    )
    SELECT n_words, syms_before, syms_after,
           CAST(syms_before - syms_after AS BIGINT) AS syms_saved,
           ROUND(1.0 * syms_after / syms_before, 6) AS compression
    FROM before CROSS JOIN after
    """,
)
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned merges back to the vocabulary and measure the
    tokenizer's compression: frequency-weighted symbol counts before
    vs after — the acceptance metric a tokenizer-training pipeline
    gates on (covers the trainable >= 2-char vocabulary, like the
    trainer). Composes _bpe_train end-to-end, so a drift anywhere in
    the train/apply loop breaks the hash."""
    _, vocab0, vocab_n = _bpe_train(spark, sf_dir)
    before = vocab0.agg(
        F.sum("freq").cast("bigint").alias("n_words"),
        F.sum(F.col("freq") * F.size("syms")).cast("bigint").alias("syms_before"),
    )
    after = vocab_n.agg(
        F.sum(F.col("freq") * F.size("syms")).cast("bigint").alias("syms_after")
    )
    return before.crossJoin(after).select(
        "n_words",
        "syms_before",
        "syms_after",
        (F.col("syms_before") - F.col("syms_after")).cast("bigint").alias("syms_saved"),
        F.round(F.col("syms_after") / F.col("syms_before"), 6).alias("compression"),
    )


# ---------------------------------------------------------------------------
# RAG-prep chunking: overlapping token windows (size CHUNK_WIN, stride
# CHUNK_STRIDE) — the retrieval-corpus shape, distinct from
# chunk_dedup_reconstruct's disjoint chunks. Entirely map-side array
# arithmetic; the per-doc checksum (md5 over the ordered chunk md5s)
# pins the exact chunk CONTENTS cross-engine, not just the counts.
# ---------------------------------------------------------------------------

CHUNK_WIN = 64
CHUNK_STRIDE = 32


@_register(
    "chunk_overlap_windows",
    f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
    ),
    meta AS (
      SELECT doc_id, toks, len(toks) AS n,
             CASE WHEN len(toks) = 0 THEN 0
                  ELSE 1 + CAST(ceil(greatest(0, len(toks) - {CHUNK_WIN})
                                     / {CHUNK_STRIDE}.0) AS INT) END AS n_chunks
      FROM t
    ),
    chunks AS (
      SELECT doc_id, n, n_chunks, k,
             md5(array_to_string(toks[k * {CHUNK_STRIDE} + 1 :
                                      k * {CHUNK_STRIDE} + {CHUNK_WIN}], ' ')) AS cmd5
      FROM meta, unnest(range(0, n_chunks)) u(k)
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(ANY_VALUE(n) AS BIGINT) AS n_tokens,
           CAST(ANY_VALUE(n_chunks) AS BIGINT) AS n_chunks,
           md5(string_agg(cmd5, '' ORDER BY k)) AS chunks_md5
    FROM chunks GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def chunk_overlap_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document overlapping-window chunk manifest: token count,
    chunk count, and a content checksum over the ordered chunks. One
    scan, zero shuffles before the terminal sort — chunk boundaries,
    contents, and order are all pure array expressions per row."""
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = tokens_col(F.col("text"))
    n = F.size(toks)
    n_chunks = F.when(n == 0, F.lit(0)).otherwise(
        1
        + F.ceil(
            F.greatest(F.lit(0), n - CHUNK_WIN) / F.lit(float(CHUNK_STRIDE))
        ).cast("int")
    )
    # n_chunks == 0 must yield NO chunk hashes: an unguarded
    # sequence(0, -1) steps BACKWARDS ([0, -1] — two bogus chunks)
    # where the oracle's range(0, 0) is empty, so the transform gets
    # the same guard n_chunks has (the shingles_col convention)
    cmd5s = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda k: F.md5(
                F.array_join(
                    F.slice(toks, k * CHUNK_STRIDE + 1, CHUNK_WIN), " "
                ).cast("binary")
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))
    return (
        d.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            n.cast("bigint").alias("n_tokens"),
            n_chunks.cast("bigint").alias("n_chunks"),
            F.md5(F.array_join(cmd5s, "").cast("binary")).alias("chunks_md5"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Character-entropy gate — the gibberish detector of the quality stack
# (low entropy = repeated-character junk; implausibly high = random
# noise/binary-in-text). Computed as explode -> two codegen hash
# aggregates: the per-char expansion collapses MAP-SIDE to one row per
# (doc, distinct char) (~dozens per doc) before the shuffle, so the
# wire carries the histogram, never the characters — the 100 TB form.
# (A pure higher-order-function formulation was tried first and is a
# trap: HOF lambdas run interpreted with no common-subexpression
# elimination, so every element_at re-derived the extracted array —
# 163 s where this form takes under a second.) Entropy uses the
# algebraically-equivalent log2(n) - sum(k*log2 k)/n so both engines
# sum the same doubles; the `+ 0.0` after rounding normalizes IEEE
# -0.0 (a uniform document) so both engines hash the same zero.
# ---------------------------------------------------------------------------

ENTROPY_LO = 3.0  # bits/char — below: repetitive junk
ENTROPY_HI = 5.2  # above: noise (printable-ASCII uniform is ~6.6)


@_register(
    "char_entropy_filter",
    f"""
    WITH ex AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS c FROM documents
    ),
    cnt AS (
      SELECT doc_id, c, count(*) AS k FROM ex GROUP BY doc_id, c
    ),
    agg AS (
      SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_chars,
             SUM(k * 1.0 * log2(k * 1.0)) AS s
      FROM cnt GROUP BY doc_id
    ),
    scored AS (
      SELECT doc_id, n_chars,
             ROUND(log2(n_chars * 1.0) - s / n_chars, 6) + 0.0 AS char_entropy
      FROM agg
    )
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(COALESCE(s.n_chars, 0) AS BIGINT) AS n_chars,
           COALESCE(s.char_entropy, 0.0) AS char_entropy,
           (COALESCE(s.char_entropy, 0.0) >= {ENTROPY_LO}
            AND COALESCE(s.char_entropy, 0.0) <= {ENTROPY_HI}) AS keep
    FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
    ORDER BY doc_id
    """,
)
def char_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy (bits/char) + the keep band.
    Both engines gate on the 6-dp-rounded value, so a green hash
    implies identical gates (the quality_classifier_linear contract).
    The left join back to `documents` keeps chars-free documents
    (empty / newline-only text) in the result with entropy 0."""
    d = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    cnt = (
        d.select(
            "doc_id",
            F.explode(F.regexp_extract_all("text", F.lit("."), F.lit(0))).alias("c"),
        )
        .groupBy("doc_id", "c")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    kd = F.col("k").cast("double")
    scored = (
        cnt.groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_chars"),
            F.sum(kd * F.log2(kd)).alias("s"),
        )
        .select(
            "doc_id",
            "n_chars",
            (
                F.round(
                    F.log2(F.col("n_chars").cast("double"))
                    - F.col("s") / F.col("n_chars"),
                    6,
                )
                + F.lit(0.0)
            ).alias("char_entropy"),
        )
    )
    ent = F.coalesce(F.col("char_entropy"), F.lit(0.0))
    return (
        d.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.coalesce(F.col("n_chars"), F.lit(0)).cast("bigint").alias("n_chars"),
            ent.alias("char_entropy"),
            ((ent >= ENTROPY_LO) & (ent <= ENTROPY_HI)).alias("keep"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Interpolated bigram LM scoring — the tier between the unigram filter
# (unigram_logprob_score) and a real KenLM: P(w|prev) = λ·c(prev,w)/
# c(prev) + (1−λ)·c(w)/N, trained in-query, each document scored by
# its mean bigram log-prob. λ = 0.75 so 1−λ is exactly representable
# and both engines evaluate the identical double expression on
# identical integer counts; the mean rounds to 6 dp to absorb
# summation order.
# ---------------------------------------------------------------------------

BIGRAM_LAMBDA = 0.75


@_register(
    "bigram_interpolated_logprob",
    f"""
    WITH arr AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS a
      FROM documents
    ),
    toks AS (SELECT doc_id, unnest(a) AS tok FROM arr),
    uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM uni),
    pos AS (SELECT doc_id, a, unnest(range(1, len(a))) AS i FROM arr),
    bg AS (SELECT doc_id, a[i] AS w1, a[i + 1] AS w2 FROM pos),
    bgc AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY w1, w2
    ),
    scored AS (
      SELECT bg.doc_id,
             ln({BIGRAM_LAMBDA} * b.c2 / u1.c
                + {1.0 - BIGRAM_LAMBDA!r} * u2.c / tot.n) AS lp
      FROM bg
      JOIN bgc b ON bg.w1 = b.w1 AND bg.w2 = b.w2
      JOIN uni u1 ON bg.w1 = u1.tok
      JOIN uni u2 ON bg.w2 = u2.tok
      CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(lp), 6)        AS avg_logprob
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
)
def bigram_interpolated_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean interpolated-bigram log-probability per document: the
    conditional tier of the perplexity filter — catches word-salad
    documents whose unigram distribution looks natural but whose
    transitions don't (the failure mode unigram_logprob_score can't
    see).

    Scale shape: tokens and bigram instances both derive map-side from
    ONE split of the text (slice+zip, no self-join on position); the
    unigram and bigram vocabularies are Zipf-bounded aggregates with
    map-side combine; scoring joins key on the gram so the count
    shuffle partitioning is reused; the corpus-total denominator comes
    from the vocabulary, never a second corpus pass."""
    d = load_table(spark, sf_dir, "documents")
    arr = d.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("a")
    ).localCheckpoint(eager=True)
    toks = arr.select("doc_id", F.explode("a").alias("tok"))
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = uni.agg(F.sum("c").cast("double").alias("n"))
    n1 = F.size("a") - 1
    bg = arr.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("a", 1, n1),
                F.slice("a", 2, n1),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c_prev"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c_cur"))
    scored = (
        bg.join(bgc, ["w1", "w2"])
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.log(
                F.lit(BIGRAM_LAMBDA) * F.col("c2") / F.col("c_prev")
                + F.lit(1.0 - BIGRAM_LAMBDA) * F.col("c_cur") / F.col("n")
            ).alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Zipf-law fit — corpus-health diagnostic: OLS of ln(freq) on ln(rank)
# over the top-K vocabulary (natural corpora slope ≈ -1; synthetic or
# template-heavy corpora flatten). Inputs to the regression are
# rounded to 12 dp and accumulated as DECIMAL so the moment sums are
# exact and order-independent; only the closed-form slope/intercept/R²
# arithmetic runs in double (the value_trend_by_type contract).
# ---------------------------------------------------------------------------

ZIPF_TOP = 256


@_register(
    "zipf_law_fit",
    f"""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ),
    vocab AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok),
    top AS (SELECT tok, c FROM vocab ORDER BY c DESC, tok LIMIT {ZIPF_TOP}),
    ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS r FROM top
    ),
    pts AS (
      SELECT CAST(ROUND(ln(r), 12) AS DECIMAL(14,12)) AS x,
             CAST(ROUND(ln(c), 12) AS DECIMAL(14,12)) AS y
      FROM ranked
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
      FROM pts
    )
    SELECT n AS n_terms,
           ROUND(CASE WHEN n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0
                      THEN NULL
                      ELSE (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 END, 6) AS slope,
           ROUND(CASE WHEN n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0
                      THEN NULL
                      ELSE (CAST(sy AS DOUBLE)
                  - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                    * CAST(sx AS DOUBLE)) / n
                 END, 6) AS intercept,
           ROUND(CASE WHEN (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0
                      THEN NULL
                      ELSE (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                              * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                 END, 6) AS r_squared
    FROM m ORDER BY n_terms
    """,
)
def zipf_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf slope / intercept / R² of the top-{K} token frequencies.

    Scale shape: the vocabulary aggregate is one map-side-combined
    groupBy (Zipf-bounded output); the top-K cut is TakeOrdered, not a
    global sort; the only window runs over the K-row table (the
    bounded-cardinality exception, same as the quantile sketch); the
    regression is a closed-form single aggregate over K rows."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    top = vocab.orderBy(F.desc("c"), "tok").limit(ZIPF_TOP)
    ranked = top.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("c"), "tok"))
    )
    pts = ranked.select(
        F.round(F.log("r"), 12).cast("decimal(14,12)").alias("x"),
        F.round(F.log("c"), 12).cast("decimal(14,12)").alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    # a single-point fit (varx == 0) yields NULL, never DIVIDE_BY_ZERO
    # under ANSI mode — mirrored CASE guard in the oracle (the
    # roc_auc/kappa convention)
    return m.select(
        n.alias("n_terms"),
        F.round(
            F.when(varx == 0, F.lit(None)).otherwise(cov / varx), 6
        ).alias("slope"),
        F.round(
            F.when(varx == 0, F.lit(None)).otherwise(
                (sy - (cov / varx) * sx) / n
            ),
            6,
        ).alias("intercept"),
        F.round(
            F.when(varx * vary == 0, F.lit(None)).otherwise(cov * cov / (varx * vary)),
            6,
        ).alias("r_squared"),
    ).orderBy("n_terms")


# ---------------------------------------------------------------------------
# Calibration of the learned quality gate against the rules gate —
# the report a curation team reads before trusting a classifier
# threshold: per score-decile document counts, both gates' keep
# counts, and their agreement rate. Bucketing is on the 6-dp-ROUNDED
# score (already hash-identical cross-engine), so decile edges cannot
# straddle.
# ---------------------------------------------------------------------------


def _qsc_oracle() -> str:
    from automated_dow30_earnings_reports_spark.operators.dedup import _h_of

    h_bigram = _h_of("toks[i] || ' ' || toks[i+1]")
    w_of = f"((({h_bigram}) % {QC_DIM}) * 37 + 11) % 97 - 48"
    return f"""
    WITH t AS (
      SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents
    ),
    feats AS (
      SELECT doc_id, text, toks,
             CASE WHEN len(toks) >= 2
                  THEN [{w_of} FOR i IN range(1, len(toks))]
                  ELSE CAST([] AS BIGINT[]) END AS ws
      FROM t
    ),
    scored AS (
      SELECT doc_id, text, toks,
             ROUND(1.0 / (1.0 + exp(-(CASE WHEN len(ws) > 0
                    THEN list_aggregate(ws, 'sum') / (97.0 * len(ws))
                    ELSE 0.0 END))), 6) AS s
      FROM feats
    ),
    flags AS (
      SELECT LEAST(CAST(floor(s * 10) AS BIGINT), 9) AS bucket,
             (s >= 0.5) AS k,
             {QUALITY_PASS_SQL} AS r
      FROM scored
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT)                AS n_docs,
           CAST(COUNT(*) FILTER (k) AS BIGINT)     AS n_qc_keep,
           CAST(COUNT(*) FILTER (r) AS BIGINT)     AS n_rules_pass,
           CAST(COUNT(*) FILTER (k = r) AS BIGINT) AS n_agree,
           ROUND(1.0 * COUNT(*) FILTER (k = r) / COUNT(*), 4) AS agree_rate
    FROM flags GROUP BY bucket ORDER BY bucket
    """


@_register("quality_score_calibration", _qsc_oracle())
def quality_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile calibration of quality_classifier_linear against the
    Gopher rules gate (quality_pass_col): where the two disagree is
    where a threshold move changes the corpus.

    Scale shape: ONE corpus scan evaluates both gates map-side (both
    are pure array/string expressions — no explode, no Python), then a
    ≤10-key map-side-combined groupBy; the agreement ratio is a single
    exact-integer division per bucket."""
    d = spread(load_table(spark, sf_dir, "documents"))
    score, keep = quality_classifier_cols(F.col("text"))
    base = d.select(
        score.alias("s"), keep.alias("k"), quality_pass_col(F.col("text")).alias("r")
    )
    agree = F.col("k") == F.col("r")
    return (
        base.select(
            F.least(F.floor(F.col("s") * 10).cast("bigint"), F.lit(9)).alias("bucket"),
            "k",
            "r",
            agree.alias("a"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("k"), 1).otherwise(0)).cast("bigint").alias("n_qc_keep"),
            F.sum(F.when(F.col("r"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_rules_pass"),
            F.sum(F.when(F.col("a"), 1).otherwise(0)).cast("bigint").alias("n_agree"),
            F.round(
                F.sum(F.when(F.col("a"), 1).otherwise(0)) * F.lit(1.0) / F.count(F.lit(1)),
                4,
            ).alias("agree_rate"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Persisted inverted text index — the third leg of the persisted-index
# family (vector: ivf_index_roundtrip; dedup signatures:
# dedup_incremental_index; text: this). BUILD writes the index as
# three parquet tables — `postings` (term, doc_id, tf) partitioned by
# a 16-way md5 term bucket, `docstats` (doc_id, dl), `stats` (n_docs,
# avgdl) — and SEARCH answers the fixed BM25 query from the LOADED
# index only: the query terms' buckets are a directory-pruned read,
# document frequencies come from the pruned postings, and the corpus
# text is never touched. Hash-matches bm25_retrieval's scan-side
# oracle, proving the index round trip lossless.
# ---------------------------------------------------------------------------

import hashlib as _hashlib
import os as _os

TEXT_INDEX_BUCKETS = 16

_SCRATCH_TEXTIDX = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
    ".scratch",
    "text_index",
)


def _text_index_path(sf_dir: str) -> str:
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        scratch_path,
    )

    return scratch_path(_SCRATCH_TEXTIDX, sf_dir)


def _py_term_bucket(term: str) -> int:
    """Driver-side twin of the term-bucket expression (same 28-bit md5
    digest contract as _qc_fid) — lets query planning name the bucket
    directories to prune without touching the cluster."""
    return int(_hashlib.md5(term.encode()).hexdigest()[:7], 16) % TEXT_INDEX_BUCKETS


def _tokenized_docs(docs) -> DataFrame:
    """(doc_id, toks) projection of a documents frame — THE tokenize
    pass of the text-index build, split out so multi-generation
    lifecycles can run it once over the whole corpus and slice the
    cached result per generation (see _write_text_index_tokd)."""
    return docs.select("doc_id", tokens_col(F.col("text")).alias("toks"))


def _write_text_index(docs, path: str, mode: str) -> None:
    """Build ('overwrite') or ingest-append ('append') the three index
    tables from a documents frame. The stats table holds MERGEABLE
    PARTIALS — (n_docs, sum_dl) integer rows, one per build/append —
    so the search-side avgdl = SUM(sum_dl)/SUM(n_docs) is bit-identical
    to the full-corpus recompute no matter how many appends happened
    (storing avgdl itself would drift: avg1*n1 re-derives a rounded
    double, the mv_incremental_refresh lesson applied to doubles).

    ONE tokenization pass (r10 optimization): the old shape tokenized
    the corpus three times — once per output table (docstats scan,
    stats agg scan, postings scan). The tokenized frame is persisted
    for the duration of the three writes (reused 3x, recompute = a
    full regex pass — exactly the guide's cache-when-reused bar) and
    unpersisted before returning so repeated lifecycle invocations
    can't accumulate CacheManager entries. Output tables, row
    content, and file layout are bit-identical to the old shape.
    Multi-generation lifecycles should tokenize once themselves and
    call _write_text_index_tokd per generation slice instead."""
    tokd = _tokenized_docs(docs).persist()
    try:
        _write_text_index_tokd(tokd, path, mode)
    finally:
        tokd.unpersist()


def _write_text_index_tokd(tokd: DataFrame, path: str, mode: str) -> None:
    """The three index-table writes from an already-tokenized
    (doc_id, toks) frame — callers own the caching of ``tokd``.

    The STATS write overlaps the postings write (r11, guide §2.6 —
    the dedup index's shd-overlap pattern): the docstats write runs
    first and MATERIALIZES the caller's tokd cache, so the stats agg
    and the postings build are then two independent read-only
    consumers of cached blocks targeting different directories;
    submitting the tiny stats job from a one-thread pool hides its
    wall (job + driver gap) under the posting write on every build,
    append, and streaming staging. Contents and the per-table write
    semantics are identical to the sequential shape; there is no
    cross-table write-order crash contract here (lifecycles rebuild
    per invocation, and the streaming path stages + publishes
    atomically), unlike _delete_from_text_index's stats-FIRST rule
    which is unchanged."""
    from concurrent.futures import ThreadPoolExecutor

    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        write_partitioned,
    )

    per_doc = tokd.select(
        "doc_id", F.size("toks").cast("bigint").alias("dl")
    )
    per_doc.write.mode(mode).parquet(_os.path.join(path, "docstats"))

    def _write_stats() -> None:
        per_doc.agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("dl").cast("bigint").alias("sum_dl"),
        ).write.mode(mode).parquet(_os.path.join(path, "stats"))

    postings = (
        tokd.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .withColumn(
            "bucket",
            F.conv(F.substring(F.md5(F.col("term").cast("binary")), 1, 7), 16, 10)
            .cast("bigint")
            % TEXT_INDEX_BUCKETS,
        )
    )
    pool = ThreadPoolExecutor(max_workers=1)
    stats_future = pool.submit(_write_stats)
    try:
        write_partitioned(
            postings, _os.path.join(path, "postings"), ["bucket"],
            mode=mode, dynamic=False,
        )
        stats_future.result()  # surface any stats-write failure loudly
    finally:
        pool.shutdown(wait=True)
        if stats_future.exception() is not None:
            # the postings write raised FIRST and is propagating: don't
            # let the overlapped stats write's own failure vanish
            import logging

            logging.getLogger(__name__).warning(
                "overlapped stats write failed: %r", stats_future.exception()
            )


def _tombstone_request_id(tombs: DataFrame) -> str:
    """Content-hash id for a tombstone set: md5 over the sorted victim
    ids. Deterministic, so a crashed tombstone compaction retries under
    the SAME id (its negative stats partial is written once, the
    retry-safety contract of _delete_from_text_index), and
    generation-scoped, so the MOR read's double-fold guard matches a
    persisted partial only against the exact victim set it covers.
    Driver-side collect of K victim ids — request-footprint-sized, the
    same bound as the delete itself."""
    import hashlib

    ids = sorted(r[0] for r in tombs.select("doc_id").distinct().collect())
    return hashlib.md5(",".join(map(str, ids)).encode()).hexdigest()[:12]


def _write_tombstone_set(victims: DataFrame, path: str) -> None:
    """Publish a MOR tombstone set: the K-row table plus a
    ``_request_id.txt`` sidecar holding its content-hash id, INSIDE the
    tombstone directory so Spark's reader ignores it (underscore
    convention) and any overwrite of the set atomically retires the old
    sidecar with the old rows — a stale id can never describe a newer
    set. Persisting the id at write time keeps the derivation's
    driver-side collect on the REQUEST path; without it every MOR
    search re-collected the whole tombstone table just to compute the
    double-fold guard's filename (an extra eager job per query on the
    hot read path). A missing sidecar (pre-sidecar index, or a crash
    between the two writes) degrades to deriving from the table."""
    tdir = _os.path.join(path, "tombstones")
    victims.write.mode("overwrite").parquet(tdir)
    rid = _tombstone_request_id(victims)
    with open(_os.path.join(tdir, "_request_id.txt"), "w") as fh:
        fh.write(rid)


def _tombstone_set_request_id(path: str, tombs: DataFrame) -> str:
    """The standing tombstone set's request id: sidecar if persisted
    (one driver-side file read), else derived from the table."""
    sidecar = _os.path.join(path, "tombstones", "_request_id.txt")
    if _os.path.exists(sidecar):
        with open(sidecar) as fh:
            return fh.read().strip()
    return _tombstone_request_id(tombs)


def _search_text_index(
    spark: SparkSession, path: str, merge_tombstones: bool = False
) -> DataFrame:
    """Answer the fixed BM25 query from the LOADED index only:
    directory-pruned bucket read, df/tf from the postings, global stats
    merged from the partials table, docstats join for dl.

    ``merge_tombstones`` is the MERGE-ON-READ delete path: postings and
    docstats anti-join the ``tombstones`` table and the stats partials
    are adjusted at read time by the victims' exact (count, sum_dl)
    integers — every score term (tf, df, dl, n_docs, avgdl) then equals
    the post-compaction (and from-scratch-rebuild) value, so deletes
    are visible immediately while the request path has written only K
    tombstone rows."""
    q_terms = list(BM25_QUERY)
    q_buckets = sorted({_py_term_bucket(t) for t in q_terms})
    post = (
        _read_idx(spark, _os.path.join(path, "postings"))
        .where(F.col("bucket").isin(q_buckets) & F.col("term").isin(q_terms))
    )
    tombs = None
    if merge_tombstones:
        tombs = _read_idx(spark, _os.path.join(path, "tombstones")).select(
            "doc_id"
        )
        post = post.join(F.broadcast(tombs), "doc_id", "left_anti")
    # r10 optimization: the old shape checkpointed the RAW filtered
    # postings and ran two separate aggregations over them (df counts,
    # tf pivot). The tf pivot subsumes the df information — a doc
    # contributes 1 to df_i iff its summed tf_i > 0 (posting rows carry
    # tf >= 1 and (term, doc_id) is unique across appends: generations
    # partition doc_ids) — so checkpoint the already-aggregated pivot
    # (<= one row per matching doc, smaller than the posting rows) and
    # fold the dfs from it: postings are now read/aggregated ONCE.
    tfp = post.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("term") == t, F.col("tf")).otherwise(0))
            .cast("bigint")
            .alias(f"tf_{i}")
            for i, t in enumerate(q_terms)
        ]
    ).localCheckpoint(eager=True)
    dfs = tfp.agg(
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint"))
            .cast("bigint")
            .alias(f"df_{i}")
            for i in range(len(q_terms))
        ]
    )
    docstats = _read_idx(spark, _os.path.join(path, "docstats"))
    stats_partials = _read_idx(spark, _os.path.join(path, "stats"))
    if tombs is not None:
        # fold the victims' exact integers into the partial sums at
        # read time — the same arithmetic the compaction persists.
        # UNLESS the compaction's own negative partial for THIS
        # tombstone set is already on disk: _compact_text_tombstones
        # writes it FIRST (under the set's content-hash request id),
        # and a crash before its docstats rewrite leaves partial +
        # tombstones + victims' docstats rows all live — folding here
        # on top of that partial would subtract the same victims
        # twice. The partial existing means the subtraction is
        # persisted; the anti-joins above and below still mask the
        # victims' rows themselves. The content-hash id is what scopes
        # the check to the CURRENT tombstone generation — a partial
        # retired with an earlier, different victim set never
        # suppresses a later set's fold.
        compact_partial = _os.path.join(
            path, "stats", f"forget-{_tombstone_set_request_id(path, tombs)}.parquet"
        )
        if not _os.path.exists(compact_partial):
            stats_partials = stats_partials.unionByName(
                docstats.join(F.broadcast(tombs), "doc_id").agg(
                    (-F.count(F.lit(1))).cast("bigint").alias("n_docs"),
                    (-F.coalesce(F.sum("dl"), F.lit(0)))
                    .cast("bigint")
                    .alias("sum_dl"),
                )
            )
        docstats = docstats.join(F.broadcast(tombs), "doc_id", "left_anti")
    stats = stats_partials.agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        (F.sum("sum_dl").cast("double") / F.sum("n_docs")).alias("avgdl"),
    )
    return (
        tfp.join(docstats, "doc_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(dfs))
        .select("doc_id", "dl", _bm25_score_col().alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOPK)
        .select("doc_id", "dl", F.round("score", 6).alias("bm25"))
    )


@_register("text_index_roundtrip", _bm25_oracle())
def text_index_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bm25_retrieval's exact semantics through a persisted inverted
    index: build once, then score the fixed query from the stored
    postings alone. A dropped posting, a tf off by one, or stats drift
    breaks the hash against the scan-side oracle.

    Scale shape: the build is one tokenize+groupBy pass (the postings
    table is the corpus's (term, doc) histogram — Zipf-collapsed
    map-side); the search reads <=|query| term buckets
    (directory-pruned), so query cost tracks posting-list length, not
    corpus size — the inverted-index upgrade bm25_retrieval's
    docstring promises once queries outnumber scans."""
    d = spread(load_table(spark, sf_dir, "documents"))
    path = _text_index_path(sf_dir)
    _write_text_index(d, path, "overwrite")
    return _search_text_index(spark, path)


TEXT_APPEND_MOD = 5  # doc_id % 5 == 0 is the "new ingest" batch


@_register("text_index_append", _bm25_oracle())
def text_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-only maintenance for the inverted text index — the third
    index family gets the same lifecycle verbs as the vector store
    (ivf_index_append) and the dedup signatures (dedup_incremental_index):
    build from the initial corpus slice, ingest the new batch by
    tokenizing ONLY the batch and appending its postings/docstats/stats
    partials, then answer the standing query from the merged index —
    hash-matched against the full-corpus scan oracle, so a dropped
    posting, a double-counted document, or stats drift from the
    partial merge all break the gate.

    Ingest cost is O(batch), independent of index size: new doc_ids
    are new postings rows (no rewrite of existing buckets' content —
    parquet append), and the stats merge is algebraic over integer
    partials. The un-handled tail is term-bucket file growth across
    many appends — the compaction story lake_compaction pins for data
    files applies verbatim to posting buckets."""
    d = spread(load_table(spark, sf_dir, "documents"))
    path = _text_index_path(sf_dir) + "_append"
    # r10: tokenize the corpus ONCE and slice the cached (doc_id, toks)
    # per generation — the old/batch slices are disjoint, so the two
    # _write_text_index calls re-scanned the documents for no new work
    is_batch = F.col("doc_id") % TEXT_APPEND_MOD == 0
    tokd = _tokenized_docs(d).persist()
    try:
        _write_text_index_tokd(tokd.where(~is_batch), path, "overwrite")
        _write_text_index_tokd(tokd.where(is_batch), path, "append")
    finally:
        tokd.unpersist()
    return _search_text_index(spark, path)


# ---------------------------------------------------------------------------
# Pseudo-relevance feedback (RM3-shape): expand the fixed query with the
# top terms of its own top-ranked documents, re-score, re-rank — the
# recall-boosting second pass that completes the IR stack (BM25 ranked,
# phrase boolean, persisted index, hybrid fusion, and now PRF).
# ---------------------------------------------------------------------------

PRF_DOCS = 5  # feedback depth
PRF_TERMS = 3  # expansion terms
PRF_WEIGHT = 0.5  # expansion-term weight (exact in binary)
PRF_TOPK = 10


def _prf_oracle() -> str:
    p = bm25_sql_parts()
    toks = p["toks"]
    stop = ", ".join(f"'{t}'" for t in (*BM25_QUERY, *EN_STOPWORDS))
    orig_rows = " UNION ALL ".join(
        f"SELECT '{t}' AS term, CAST(1 AS DOUBLE) AS w" for t in BM25_QUERY
    )
    partial = (
        "tq.w * ln((s.n_docs - df.df_t + 0.5) / (df.df_t + 0.5) + 1.0)"
        f" * (tf.tf * ({BM25_K1} + 1.0))"
        f" / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * d.dl / s.avgdl))"
    )
    return f"""
    WITH per_doc AS (
      SELECT doc_id, CAST(len({toks}) AS BIGINT) AS dl, {p["tf_cols"]}
      FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
             {p["df_cols"]}
      FROM per_doc
    ),
    fb AS (
      SELECT d.doc_id FROM per_doc d CROSS JOIN stats s
      WHERE {p["any_tf"]} > 0
      ORDER BY {p["score"]} DESC, d.doc_id LIMIT {PRF_DOCS}
    ),
    fb_toks AS (
      SELECT unnest({toks}) AS term
      FROM documents JOIN fb USING (doc_id)
    ),
    expansion AS (
      SELECT term, CAST({PRF_WEIGHT} AS DOUBLE) AS w
      FROM fb_toks
      WHERE term NOT IN ({stop})
      GROUP BY term
      ORDER BY COUNT(*) DESC, term LIMIT {PRF_TERMS}
    ),
    terms AS ({orig_rows} UNION ALL SELECT term, w FROM expansion),
    corpus_toks AS (
      SELECT doc_id, unnest({toks}) AS term FROM documents
    ),
    tfs AS (
      SELECT c.doc_id, c.term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM corpus_toks c JOIN terms USING (term)
      GROUP BY c.doc_id, c.term
    ),
    dfq AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df_t FROM tfs GROUP BY term
    ),
    partials AS (
      SELECT tf.doc_id,
             CAST(ROUND({partial}, 12) AS DECIMAL(26,12)) AS part
      FROM tfs tf
      JOIN terms tq USING (term)
      JOIN dfq df USING (term)
      JOIN per_doc d ON d.doc_id = tf.doc_id
      CROSS JOIN stats s
    ),
    prf AS (
      SELECT doc_id, SUM(part) AS score_dec,
             CAST(COUNT(*) AS BIGINT) AS n_terms_matched
      FROM partials GROUP BY doc_id
    )
    SELECT doc_id, n_terms_matched,
           ROUND(CAST(score_dec AS DOUBLE), 6) AS prf_score
    FROM prf
    ORDER BY score_dec DESC, doc_id
    LIMIT {PRF_TOPK}
    """


@_register("prf_query_expansion", _prf_oracle())
def prf_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RM3-shape pseudo-relevance feedback: BM25's top-{PRF_DOCS}
    documents nominate {PRF_TERMS} expansion terms (highest total term
    frequency in the feedback set, stopwords and the original query
    excluded, ties broken alphabetically — an exact integer selection),
    the query becomes {{original terms w=1.0}} ∪ {{expansion terms
    w={PRF_WEIGHT}}}, and the corpus is re-scored with weighted BM25.

    Determinism: expansion selection is integer; per-(doc, term)
    partial scores are single fixed-order double expressions; the
    per-document sum folds 12-dp-rounded partials through DECIMAL
    (order-free — the query is now DYNAMIC, so the static
    one-expression-tree trick bm25_retrieval uses can't apply), and
    the final rank orders on the exact DECIMAL score.

    Scale shape: the feedback pass is the attested BM25 plan; the
    re-score pass is explode → broadcast semi-join on the ≤7-term
    query → (doc, term) count — the postings-probe shape
    phrase_search_postings uses, touching only matching tokens after
    the join; stats ride the same broadcast row as bm25_scored_input."""
    scored_in = bm25_scored_input(spark, sf_dir)
    fb = (
        scored_in.where(bm25_any_tf_col() > 0)
        .select("doc_id", _bm25_score_col().alias("sc"))
        .orderBy(F.desc("sc"), "doc_id")
        .limit(PRF_DOCS)
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    d = spread(load_table(spark, sf_dir, "documents"))
    stop = [*BM25_QUERY, *EN_STOPWORDS]
    fb_terms = (
        d.join(F.broadcast(fb), "doc_id")
        .select(F.explode(tokens_col(F.col("text"))).alias("term"))
        .where(~F.col("term").isin(stop))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "term")
        .limit(PRF_TERMS)
        .select("term", F.lit(PRF_WEIGHT).cast("double").alias("w"))
    )
    orig = spark.createDataFrame(
        [(t, 1.0) for t in BM25_QUERY], "term string, w double"
    )
    terms = orig.unionByName(fb_terms).localCheckpoint(eager=True)
    tfs = (
        d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("term"))
        .join(F.broadcast(terms), "term")
        .groupBy("doc_id", "term", "w")
        .agg(F.count("*").cast("bigint").alias("tf"))
        # (matching-doc, <=7-term) grain, consumed by BOTH the df
        # aggregate and the scoring join — lazy, each re-ran the
        # corpus tokenize + postings probe
        .localCheckpoint(eager=True)
    )
    dfq = tfs.groupBy("term").agg(F.count("*").cast("bigint").alias("df_t"))
    dls = scored_in.select("doc_id", "dl", "n_docs", "avgdl")
    partial = (
        F.col("w")
        * F.log(
            (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5) + 1.0
        )
        * (F.col("tf") * (BM25_K1 + 1.0))
        / (
            F.col("tf")
            + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    prf = (
        tfs.join(F.broadcast(dfq), "term")
        .join(dls, "doc_id")
        .select(
            "doc_id", F.round(partial, 12).cast("decimal(26,12)").alias("part")
        )
        .groupBy("doc_id")
        .agg(
            F.sum("part").alias("score_dec"),
            F.count("*").cast("bigint").alias("n_terms_matched"),
        )
    )
    return (
        prf.orderBy(F.desc("score_dec"), "doc_id")
        .limit(PRF_TOPK)
        .select(
            "doc_id",
            "n_terms_matched",
            F.round(F.col("score_dec").cast("double"), 6).alias("prf_score"),
        )
    )


TEXT_COMPACT_MOD = 3  # three write generations -> a fragmented index


def _compact_text_index(spark: SparkSession, path: str) -> None:
    """Compact a many-appends index in place: posting buckets rewritten
    to one file each, the stats partials folded into ONE integer row
    (their merge is exact addition, so compaction cannot change any
    score), docstats re-laid-out. Reads are localCheckpointed before
    each overwrite so the rewrite never races its own source — the
    lake_compaction contract applied to the index's own tables.

    While a TOMBSTONE SET IS STANDING, the ``forget-<id>.parquet``
    negative partials are kept as separate files instead of being
    folded anonymously: each one doubles as the marker telling the MOR
    read path its subtraction is already persisted
    (_search_text_index's compact_partial check). Folding it into the
    single stats row is numerically identical but ERASES the marker —
    a MOR reader would then re-fold the still-live victims' docstats
    on top of the already-applied negative, double-subtracting
    n_docs/sum_dl (the exact window _compact_text_tombstones closed).
    Once no tombstones stand, the markers are spent and fold like any
    other partial. Pinned in tests/test_round8_ops.py."""
    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        rewrite_table_atomic,
    )

    import shutil as _shutil

    stats_dir = _os.path.join(path, "stats")
    stage = _os.path.join(path, ".stats-compact-stage")
    # recovery from a crashed previous compaction swap: _SWAP_READY is
    # written only after the folded row AND every kept marker are in
    # the stage, so a READY STAGE ALWAYS WINS — same rule as
    # enforce_ttl's boundary swap: a crash PARTWAY through the live
    # dir's rmtree leaves a truncated stats_dir, and refolding from
    # that remnant would silently corrupt n_docs/sum_dl (or drop a
    # standing forget marker, re-opening the double-fold window). An
    # un-ready stage is discarded (the live dir is then still intact,
    # because the unlink is sequenced after the sentinel write).
    # Quiesce contract (same as enforce_ttl): a crashed compaction is
    # retried before any new append lands — a ready stage predating an
    # append would be stale by exactly that append's partial.
    if _os.path.isdir(stage):
        if _os.path.exists(_os.path.join(stage, "_SWAP_READY")):
            if _os.path.isdir(stats_dir):
                _shutil.rmtree(stats_dir)  # possibly-truncated remnant
            _os.replace(stage, stats_dir)
        else:
            _shutil.rmtree(stage, ignore_errors=True)

    # one job per table, swap-published (r10): the old
    # checkpoint-then-overwrite cost two jobs per table and left the
    # live directory torn if the in-place rewrite crashed mid-write
    rewrite_table_atomic(
        _read_idx(spark, _os.path.join(path, "postings")),
        _os.path.join(path, "postings"),
        partition_cols=["bucket"],
    )
    rewrite_table_atomic(
        _read_idx(spark, _os.path.join(path, "docstats")),
        _os.path.join(path, "docstats"),
    )
    tombstones_standing = _os.path.isdir(_os.path.join(path, "tombstones"))
    keep = (
        sorted(
            f
            for f in _os.listdir(stats_dir)
            if f.startswith("forget-") and f.endswith(".parquet")
        )
        if tombstones_standing
        else []
    )
    fold_files = [
        _os.path.join(stats_dir, f)
        for f in _os.listdir(stats_dir)
        if f.endswith(".parquet") and f not in keep
    ]
    stats = spark.read.parquet(*fold_files).agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("sum_dl").cast("bigint").alias("sum_dl"),
    )
    # stage the fold, then swap folded (+ any kept markers) back in —
    # ONE job either way (r10: the old no-marker branch checkpointed
    # the fold and overwrote stats_dir in place — a second job, and a
    # crash mid-overwrite tore the live dir; the marker branch staged
    # but still paid the checkpoint). Writing the fold DIRECTLY to the
    # stage never races its parquet sources (they live in stats_dir),
    # and the _SWAP_READY-gated swap covers both branches.
    stats.write.mode("overwrite").parquet(stage)
    for f in keep:
        # markers swap back in with the fold — mode("overwrite") on
        # stats_dir would briefly delete them (and a crash there would
        # orphan them permanently)
        _os.link(_os.path.join(stats_dir, f), _os.path.join(stage, f))
    with open(_os.path.join(stage, "_SWAP_READY"), "w"):
        pass
    _shutil.rmtree(stats_dir)
    _os.replace(stage, stats_dir)


@_register("text_index_compact", _bm25_oracle())
def text_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compaction verb for the text index — the growth tail
    text_index_append's docstring leaves open: every append adds files
    to each touched posting bucket and one more stats partial, so a
    long-running ingest degrades the directory-pruned read. This
    lifecycle builds + appends twice (three write generations), then
    compacts — posting buckets to one file each, stats partials folded
    into one row (exact integer addition — compaction CANNOT change a
    score) — and answers the standing query from the compacted index,
    hash-matched to the scan-side oracle. File-count and
    single-partial-row assertions are pinned in tests.

    Scale shape: compaction reads and rewrites only the index tables
    (corpus-independent given bounded vocabulary growth), and in
    production runs per-bucket so only fragmented buckets pay — the
    same argument as lake_compaction."""
    d = spread(load_table(spark, sf_dir, "documents"))
    path = _text_index_path(sf_dir) + "_compact"
    gen = F.col("doc_id") % TEXT_COMPACT_MOD
    # one tokenize pass for the three generations (text_index_append's
    # r10 slice pattern)
    tokd = _tokenized_docs(d).persist()
    try:
        _write_text_index_tokd(tokd.where(gen == 0), path, "overwrite")
        _write_text_index_tokd(tokd.where(gen == 1), path, "append")
        _write_text_index_tokd(tokd.where(gen == 2), path, "append")
    finally:
        tokd.unpersist()
    _compact_text_index(spark, path)
    return _search_text_index(spark, path)


# ---------------------------------------------------------------------------
# Right-to-be-forgotten for the text index — the forget verb that
# completes the third index family's lifecycle (the vector store has
# ivf_index_delete, the dedup signatures dedup_index_purge; until now
# a GDPR request against the text index meant a full rebuild).
# ---------------------------------------------------------------------------

TEXT_DELETE_PRED = "doc_id % 13 = 5"  # the forget-request set


def _delete_from_text_index(
    spark: SparkSession, path: str, victims: DataFrame, request_id: str = "0"
) -> None:
    """Erase ``victims`` doc_ids from all three index tables:

    - stats FIRST: a NEGATIVE partial (-n_docs, -sum_dl) computed from
      the victims' stored docstats rows is appended, so the merged
      SUM(n_docs)/SUM(sum_dl) equal the from-scratch rebuild's
      integers exactly (the partials are integers, subtraction is
      exact — storing or adjusting avgdl itself would drift);
    - postings through the shared affected-partition rewrite
      (sources/parquet_lake.py rewrite_affected_partitions): only
      md5-term-bucket partitions holding a victim's postings are
      rewritten, emptied buckets are dropped at the directory level;
    - docstats (unpartitioned, one small row per doc) rewritten
      through a checkpoint, the dedup-purge sizes-table pattern.

    The whole verb is RETRY-SAFE per (path, request_id): the negative
    partial lands under the deterministic file name
    ``stats/forget-<request_id>.parquet`` (staged then os.replace'd,
    so existing implies complete), and an existing partial for the
    request is never recomputed — a crash-and-retry at any step
    re-runs only idempotent work (the naive mode("append") wrote a
    SECOND negative partial on retry, and a retry arriving after the
    docstats rewrite would re-derive zeros from the already-erased
    rows: both permanently corrupt n_docs/sum_dl). The two rewrites
    are anti-joins — replaying them over already-clean tables is a
    no-op. Distinct forget requests must carry distinct request_ids.

    Cost is bounded by the forget request's bucket footprint plus the
    per-doc tables — never the corpus."""
    import shutil as _shutil

    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        rewrite_affected_partitions,
        rewrite_table_atomic,
    )

    victims = victims.localCheckpoint(eager=True)
    # negative stats partial BEFORE docstats loses the victims' rows;
    # skipped if this request already recorded it (retry after a crash
    # later in the sequence — the victims' docstats rows may be gone)
    partial = _os.path.join(path, "stats", f"forget-{request_id}.parquet")
    if not _os.path.exists(partial):
        stage = _os.path.join(path, f".forget-stage-{request_id}")
        _shutil.rmtree(stage, ignore_errors=True)
        (
            _read_idx(spark, _os.path.join(path, "docstats"))
            .join(F.broadcast(victims), "doc_id")
            .agg(
                (-F.count(F.lit(1))).cast("bigint").alias("n_docs"),
                (-F.coalesce(F.sum("dl"), F.lit(0))).cast("bigint").alias("sum_dl"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        staged = [f for f in _os.listdir(stage) if f.endswith(".parquet")]
        _os.replace(_os.path.join(stage, staged[0]), partial)
        _shutil.rmtree(stage, ignore_errors=True)
    rewrite_affected_partitions(
        spark, _os.path.join(path, "postings"), "bucket", victims, "doc_id"
    )
    # one job, swap-published (r10): checkpoint-then-overwrite cost two
    # jobs and could strand a truncated docstats on a mid-write crash
    rewrite_table_atomic(
        _read_idx(spark, _os.path.join(path, "docstats")).join(
            F.broadcast(victims), "doc_id", "left_anti"
        ),
        _os.path.join(path, "docstats"),
    )


@_register("text_index_delete", _bm25_oracle(f" WHERE NOT ({TEXT_DELETE_PRED})"))
def text_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR delete for the persisted text index: build on the full
    corpus, erase the forget-request set ({TEXT_DELETE_PRED}) —
    negative stats partial, affected-bucket-only postings rewrite,
    docstats anti-join — then answer the standing BM25 query from the
    maintained index. The oracle recomputes scan-side BM25 over the
    SURVIVING corpus only, so a lingering posting, a stale df, an
    unadjusted avgdl, or a dropped survivor all break the hash
    (post-delete scores must equal a from-scratch rebuild's — the
    df/avgdl terms shift for EVERY document when any document leaves,
    which is exactly why the naive fix was a full rebuild).

    Scale shape: the request path touches the victims' bucket
    partitions + two small per-doc/1-row-per-write tables; untouched
    buckets are never listed. Affected-bucket-only rewrite is pinned
    in tests with a synthetic corpus whose victim terms hit a known
    bucket subset."""
    d = spread(load_table(spark, sf_dir, "documents"))
    path = _text_index_path(sf_dir) + "_delete"
    _write_text_index(d, path, "overwrite")
    victims = d.where(F.expr(TEXT_DELETE_PRED)).select("doc_id")
    _delete_from_text_index(spark, path, victims)
    return _search_text_index(spark, path)


@_register(
    "text_index_delete_mor", _bm25_oracle(f" WHERE NOT ({TEXT_DELETE_PRED})")
)
def text_index_delete_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGE-ON-READ phase of the text-index forget story — the
    two-phase design ivf_index_delete pins for the vector store,
    completed for the text index: the request path writes ONLY the
    K-row tombstone table (deletes become visible immediately, no
    index rewrite on the request path), and the read path anti-joins
    tombstones and folds the victims' exact (count, sum_dl) integers
    into the stats partials at read time, so the pre-compaction search
    already equals the post-compaction one (text_index_delete) AND the
    from-scratch rebuild — all three share this oracle. Compaction
    (the rewrite) then runs on maintenance schedule, not request
    latency. Equality of the two read paths is pinned in
    tests/test_round7_ops.py."""
    d = spread(load_table(spark, sf_dir, "documents"))
    path = _text_index_path(sf_dir) + "_mor"
    _write_text_index(d, path, "overwrite")
    _write_tombstone_set(d.where(F.expr(TEXT_DELETE_PRED)).select("doc_id"), path)
    return _search_text_index(spark, path, merge_tombstones=True)


def _text_index_stats_oracle() -> str:
    from automated_dow30_earnings_reports_spark.operators.dedup import _h_of

    return f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ),
    terms AS (SELECT doc_id, unnest(t) AS term FROM toks),
    tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM terms GROUP BY term, doc_id),
    b AS (SELECT ({_h_of("term")}) % {TEXT_INDEX_BUCKETS} AS bucket, term, tf FROM tf)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms,
           CAST(COUNT(*) AS BIGINT) AS n_postings,
           CAST(SUM(tf) AS BIGINT) AS sum_tf
    FROM b GROUP BY bucket ORDER BY bucket
    """


@_register("text_index_stats", _text_index_stats_oracle())
def text_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monitoring verb for the persisted text index — the
    ivf_index_stats twin (dedup_index_stats completes the trio): per
    md5-term-bucket occupancy (distinct terms, posting rows, summed
    term frequency) read from the STORED postings. Bucket skew here is
    the text index's maintenance signal the way cell skew drives
    ivf_index_recluster: the search's directory-pruned read pays for
    exactly the query terms' buckets, so one hot bucket sets the
    latency floor of every query whose term hashes into it. The oracle
    recomputes the bucketing from the raw corpus (the shared 28-bit
    md5 digest contract), so a green hash is also an anti-entropy
    check that the persisted postings match a from-scratch build
    row-for-row."""
    d = spread(load_table(spark, sf_dir, "documents"))
    path = _text_index_path(sf_dir) + "_statsq"
    _write_text_index(d, path, "overwrite")
    post = _read_idx(spark, _os.path.join(path, "postings"))
    return (
        post.groupBy("bucket")
        .agg(
            F.countDistinct("term").cast("bigint").alias("n_terms"),
            F.count(F.lit(1)).cast("bigint").alias("n_postings"),
            F.sum("tf").cast("bigint").alias("sum_tf"),
        )
        .select(F.col("bucket").cast("bigint").alias("bucket"), "n_terms", "n_postings", "sum_tf")
        .orderBy("bucket")
    )


@_register("text_index_vacuum", _bm25_oracle(f" WHERE NOT ({TEXT_DELETE_PRED})"))
def text_index_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vacuum/rollback verb for a quiesced index: a publish that
    crashed MID-MOVE leaves a manifest, a staged delta, and a partial
    set of ``ingest-<id>-*`` files — state the exactly-once protocol
    keeps correct only as long as the batch eventually replays. When
    the stream is retired instead, rollback_orphan_publishes
    (sources/parquet_lake.py) scrubs exactly the manifest-listed
    partition directories, retires the manifest, and reclaims every
    scratch tree. This query CONSTRUCTS that crash state
    deterministically (base index on the survivors; the victims' delta
    staged, its manifest written, exactly one postings file moved in —
    the worst case: a partial file that silently inflates df for its
    terms), vacuums, and answers the standing BM25 query. The shared
    survivors-rebuild oracle breaks if the vacuum misses the partial
    file (df inflation shifts every score), scrubs too much, or leaves
    the manifest directing a future scrub at nothing. Quiesced here
    (min_age=0); for a vacuum racing LIVE ingest, the r10
    ``min_age_seconds`` retention window spares a fresh in-flight
    batch (tests/test_round10_ops.py; driver-attested by
    ivf_vacuum_retention on the vector twin)."""
    import shutil as _shutil

    from automated_dow30_earnings_reports_spark.sources.parquet_lake import (
        rollback_orphan_publishes,
        write_publish_manifest,
    )

    d = spread(load_table(spark, sf_dir, "documents"))
    path = _text_index_path(sf_dir) + "_vacuum"
    # one tokenize pass shared by the survivor build and the victims'
    # staged delta (disjoint slices of the same corpus)
    tokd = _tokenized_docs(d).persist()
    try:
        _write_text_index_tokd(
            tokd.where(~F.expr(TEXT_DELETE_PRED)), path, "overwrite"
        )

        # --- construct the crashed publish: stage, manifest, one moved file ---
        staging = _os.path.join(path, ".staging", "batch-99")
        _shutil.rmtree(staging, ignore_errors=True)
        _write_text_index_tokd(
            tokd.where(F.expr(TEXT_DELETE_PRED)), staging, "overwrite"
        )
    finally:
        tokd.unpersist()
    touched = write_publish_manifest(
        path, staging, ("postings", "docstats", "stats"), 99
    )
    rel0 = sorted(touched["postings"])[0]
    src_dir = _os.path.join(staging, "postings", rel0)
    src = sorted(f for f in _os.listdir(src_dir) if f.endswith(".parquet"))[0]
    dest_dir = _os.path.join(path, "postings", rel0)
    _os.makedirs(dest_dir, exist_ok=True)
    _os.replace(
        _os.path.join(src_dir, src), _os.path.join(dest_dir, "ingest-99-0.parquet")
    )

    report = rollback_orphan_publishes(path)
    if report["rolled_back_batches"] != 1 or report["scrubbed_files"] != 1:
        raise RuntimeError(f"vacuum did not roll back the crashed batch: {report}")
    return _search_text_index(spark, path)


def _compact_text_tombstones(
    spark: SparkSession, path: str, request_id: str | None = None
) -> None:
    """Retire a standing merge-on-read tombstone set by folding it into
    the index — the maintenance half text_index_delete_mor's docstring
    promises: victims are read FROM the tombstone table, erased through
    the retry-safe _delete_from_text_index (negative stats partial +
    affected-bucket rewrite + docstats anti-join), and the tombstone
    table is dropped LAST, so a crash at any point leaves either a
    still-consistent MOR index (tombstones standing, delete replayable
    under the same request id) or the fully-compacted one.

    The request id defaults to the tombstone set's content hash
    (_tombstone_request_id) — shared with the MOR read path, which
    skips its read-time stats fold whenever this compaction's negative
    partial is already persisted. That closes the one crash window
    where both adjustments were live at once (partial written, docstats
    rewrite not yet done, tombstones standing): a MOR reader in that
    state previously subtracted the victims' (count, sum_dl) twice;
    double-fold-free readback from exactly that state is pinned in
    tests/test_round8_ops.py."""
    import shutil as _shutil

    victims = _read_idx(spark, _os.path.join(path, "tombstones")).select(
        "doc_id"
    )
    if request_id is None:
        request_id = _tombstone_set_request_id(path, victims)
    _delete_from_text_index(spark, path, victims, request_id=request_id)
    _shutil.rmtree(_os.path.join(path, "tombstones"))


@_register("text_index_mor_compact", _bm25_oracle(f" WHERE NOT ({TEXT_DELETE_PRED})"))
def text_index_mor_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The forget story's third act: build → merge-on-read delete
    (tombstones only, the text_index_delete_mor request path) →
    COMPACTION that consumes the tombstones (_compact_text_tombstones:
    fold into a negative stats partial + affected-bucket rewrite, then
    retire the tombstone table) → answer the standing query from the
    PLAIN read path (merge_tombstones=False). The oracle is the shared
    survivors-rebuild BM25, so a compaction that loses a tombstone,
    double-applies the stats fold, or leaves the read path dependent on
    the retired table breaks the hash. Closes the loop the MOR query
    leaves open: deletes are visible immediately AND the read-time
    anti-join cost is eventually reclaimed on maintenance schedule."""
    d = spread(load_table(spark, sf_dir, "documents"))
    path = _text_index_path(sf_dir) + "_morcompact"
    _write_text_index(d, path, "overwrite")
    _write_tombstone_set(d.where(F.expr(TEXT_DELETE_PRED)).select("doc_id"), path)
    _compact_text_tombstones(spark, path)
    return _search_text_index(spark, path)


@_register(
    "text_index_crud_lifecycle",
    _bm25_oracle(f" WHERE NOT ({TEXT_DELETE_PRED} AND doc_id % 3 < 2)"),
)
def text_index_crud_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verb COMPOSITION for the text index — the sequence no single
    lifecycle query exercises: build (gen 0) → append (gen 1) →
    DELETE while fragmented (two stats partials live; the victims are
    the forget predicate restricted to gens 0-1) → append gen 2 →
    search. The final corpus (gens 0-2 minus gen-0/1 victims, with
    gen-2 docs matching the forget predicate RETAINED) cannot be
    produced by any one verb, so the oracle catches verb-order bugs:
    a delete that tombstones future appends, a negative stats partial
    that double-applies across appends, or an append that resurrects
    purged postings would each break the hash. Four stats partials
    (build + append + negative + append) must fold to the rebuild's
    exact integers."""
    d = spread(load_table(spark, sf_dir, "documents"))
    path = _text_index_path(sf_dir) + "_crud"
    gen = F.col("doc_id") % 3
    # one tokenize pass for the three generations (text_index_append's
    # r10 slice pattern); the verb ORDER — delete lands between the
    # gen-1 and gen-2 appends — is unchanged
    tokd = _tokenized_docs(d).persist()
    try:
        _write_text_index_tokd(tokd.where(gen == 0), path, "overwrite")
        _write_text_index_tokd(tokd.where(gen == 1), path, "append")
        victims = d.where(F.expr(TEXT_DELETE_PRED) & (gen < 2)).select("doc_id")
        _delete_from_text_index(spark, path, victims)
        _write_text_index_tokd(tokd.where(gen == 2), path, "append")
    finally:
        tokd.unpersist()
    return _search_text_index(spark, path)
