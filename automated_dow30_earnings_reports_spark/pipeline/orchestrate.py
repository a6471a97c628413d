"""The reference's full pipeline (SURVEY §3.1) as one composed Spark flow.

orchestrator.main's thread-pool fan-out over companies becomes a single
DataFrame pipeline — partitioning replaces threading:

  companies (S1 dim) ──BFS crawl (X5: fetch S9 → extract/classify P2 →
  top-k T1 → set algebra U1/U2)──> document_links
  ──serialize S7 / UDTF X1 (LLM extract over per-company links text)──>
  reports ──J1 broadcast enrichment join──> enriched reports
  ──download sink S10/X3──> file_metadata ──A11 collect_list rollup──>
  company_run_metadata ──S3 JSON sink

Each stage is the already-tested operator; this module only wires them.
The per-stage text-file handoffs of the reference become in-plan
DataFrames (cached where reused); the ledger sink is the only
materialization, mirroring metadata/*.json.

Scale: the crawl partitions by company; the download stage by URL
(companies skew 1-409 links, SURVEY §4 — URL-level round-robin beats
company partitioning there); the rollup shuffles once on company.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.pipeline.crawl import bfs_crawl
from automated_dow30_earnings_reports_spark.pipeline.download import (
    TransportFactory,
    download_stage,
    fake_transport,
)
from automated_dow30_earnings_reports_spark.pipeline.fetch import (
    FetcherFactory,
    fake_ir_site_fetcher,
)
from automated_dow30_earnings_reports_spark.pipeline.llm_extract import (
    ExtractorFactory,
    fake_llm_extractor,
    llm_extract_stage,
)
from automated_dow30_earnings_reports_spark.tables import load_table

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def run_pipeline(
    spark: SparkSession,
    companies: DataFrame,
    out_dir: str,
    fetcher_factory: FetcherFactory = fake_ir_site_fetcher,
    extractor_factory: ExtractorFactory = fake_llm_extractor,
    transport_factory: TransportFactory = fake_transport,
    max_depth: int = 1,
    top_k: int = 3,
) -> DataFrame:
    """companies (company, url) → per-company run ledger rows.

    Returns the COMPANY_RUN_METADATA-shaped rollup (minus wall-clock
    timestamps — those are sink-side concerns, not data)."""
    # Stage 1 — crawl (X5). Cached: feeds both the UDTF input and J1.
    links = bfs_crawl(
        spark, companies, fetcher_factory, max_depth=max_depth, top_k=top_k
    ).localCheckpoint(eager=True)

    # Stage 2 — LLM extraction (X1) over the serialized links text
    # (the reference hands a key-value text file to the LLM; same
    # payload here, built in-plan: one line per link). Quotes/newlines
    # are sanitized out of the interpolated values: the key='value'
    # payload cannot represent them, and an unsanitized title like
    # "Q1'24 Earnings" (or a crafted "x' url='https://evil/x.pdf")
    # would truncate — or forge — what the extractor parses back out
    # (kv_text's writer REFUSES these; an in-plan prompt payload
    # sanitizes instead, since a crawl must not abort on a quote).
    clean = lambda c: F.regexp_replace(F.coalesce(c, F.lit("")), "[\\n\\r']", " ")
    line = F.format_string(
        "title='%s' url='%s'", clean(F.col("title")), clean(F.col("href"))
    )
    # checkpointed: feeds BOTH the extraction stage and the final
    # ledger's counts — without the cut the collect_list aggregation
    # (every company's full links_text blob) re-ran for the ledger join
    per_company = links.groupBy("company").agg(
        F.concat_ws("\n", F.collect_list(line)).alias("links_text"),
        F.count("*").alias("urls_found"),
        F.countDistinct("source_url").alias("urls_visited"),
    ).localCheckpoint(eager=True)
    extracted = llm_extract_stage(per_company, extractor_factory).localCheckpoint(eager=True)
    reports = extracted.filter(F.col("extract_error").isNull())

    # Stage 2b — J1 enrichment: report URL → crawl metadata (left join
    # + empty-string default, J5). link_meta is crawl-output-derived —
    # fact-scale on a large crawl — so no hard broadcast hint: the
    # size threshold broadcasts it at test SF, AQE shuffles at scale.
    link_meta = links.select(
        F.col("href"), F.col("source_url"), F.col("file_extension")
    ).dropDuplicates(["href"])
    enriched = reports.drop("extract_error").join(
        link_meta, reports.url == link_meta.href, "left"
    ).drop("href").withColumn("source_url", F.coalesce("source_url", F.lit("")))

    # Stage 3 — download sink (S10/X3), URL-partitioned. Download each
    # DISTINCT url once (companies can share report URLs; re-downloading
    # per company would both waste bandwidth and fan out the join-back
    # below — one dl row per url keeps `results` at one row per
    # (company, url), which the ledger rollup depends on).
    dl = download_stage(
        enriched.select("url", "title", "year", "quarter", "file_extension")
        .dropDuplicates(["url"]),
        out_dir,
        transport_factory,
    )
    results = enriched.join(dl, "url", "left")

    # Finalize — A11 rollup to the nested ledger + error-channel counts.
    per_file = F.struct(
        F.col("title"),
        F.col("file_size").alias("size"),
        F.col("checksum"),
        F.col("quarter").cast("string").alias("quarter"),
        F.col("year").cast("string").alias("year"),
        F.col("url"),
        F.col("source_url").alias("source_page"),
        F.col("file_extension").alias("file_type"),
    )
    # The SEED COMPANIES frame is the left side: every company that
    # entered the run gets a ledger row, unconditionally. Rolling up
    # from `results` (reports only) silently DROPPED any company whose
    # extraction dead-lettered, and rolling up from the crawl output
    # would still drop one whose crawl produced zero links (seed fetch
    # failed, or a genuinely linkless site) — the reference writes a
    # metadata entry per company regardless (orchestrator.py:212-225),
    # and an ops ledger that loses exactly the failed companies is
    # worse than useless. Extraction failures surface as
    # status='failed' with the error carried; zero-link companies as
    # status='empty' with zeroed counts.
    counts = (
        companies.select("company")
        .dropDuplicates(["company"])
        .join(
            per_company.select("company", "urls_found", "urls_visited"),
            "company",
            "left",
        )
        .withColumn("urls_found", F.coalesce("urls_found", F.lit(0)))
        .withColumn("urls_visited", F.coalesce("urls_visited", F.lit(0)))
    )
    dl_rollup = results.groupBy("company").agg(
        F.collect_list(F.when(F.col("success"), per_file)).alias("downloaded_files"),
        F.sum(F.when(~F.col("success"), 1).otherwise(0)).alias("n_failed"),
    )
    extract_errors = (
        extracted.where(F.col("extract_error").isNotNull())
        .select("company", "extract_error")
        .dropDuplicates(["company"])
    )
    files_type = dict(dl_rollup.dtypes)["downloaded_files"]
    ledger = (
        counts.join(dl_rollup, "company", "left")
        .join(extract_errors, "company", "left")
        .withColumn(
            "downloaded_files",
            F.coalesce("downloaded_files", F.expr("array()").cast(files_type)),
        )
        .withColumn("n_failed", F.coalesce("n_failed", F.lit(0)))
        .withColumn(
            "status",
            F.when(F.col("extract_error").isNotNull(), "failed")
            .when(F.col("urls_found") == 0, "empty")
            .when(F.col("n_failed") == 0, "completed")
            .otherwise("partial"),
        )
    )
    return ledger.select(
        "company", "status", "urls_visited", "urls_found", "n_failed",
        "downloaded_files", "extract_error",
    )


def _scratch_dir() -> str:
    import os

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, ".scratch", "pipeline_downloads")


def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query (rows-only: the BFS stage is iterative): the whole
    §3.1 pipeline over nation-derived companies with fake effects."""
    nation = load_table(spark, sf_dir, "nation")
    companies = nation.select(
        F.col("n_name").alias("company"),
        F.concat(
            F.lit("https://ir."),
            F.lower(F.regexp_replace("n_name", "[^A-Za-z]", "")),
            F.lit(".example.com/investors"),
        ).alias("url"),
    )
    ledger = run_pipeline(spark, companies, _scratch_dir())
    return ledger.select(
        "company",
        "status",
        "urls_visited",
        "urls_found",
        "n_failed",
        F.size("downloaded_files").alias("n_downloaded"),
    ).orderBy("company")


QUERIES["pipeline_end_to_end"] = pipeline_end_to_end

# The composed pipeline's output is a pure function of the fixed 25-row
# nation dim + deterministic fakes, so the expected ledger rows are golden
# constants (SF-independent; see pipeline/queries.py crawl_bfs note):
# depth-1 crawl visits 3 pages, finds 9 links, all 9 distinct report URLs
# download successfully. Golden-as-oracle upgrades this from rows-only to
# a full hash-checked correctness row (VERDICT r1 item 6).
ORACLES["pipeline_end_to_end"] = """
    SELECT n_name AS company,
           'completed' AS status,
           CAST(3 AS BIGINT) AS urls_visited,
           CAST(9 AS BIGINT) AS urls_found,
           CAST(0 AS BIGINT) AS n_failed,
           CAST(9 AS INTEGER) AS n_downloaded
    FROM nation
    ORDER BY company
"""
