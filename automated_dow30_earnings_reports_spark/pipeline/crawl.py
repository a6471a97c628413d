"""X5 — BFS crawl as a driver-side loop over Spark stages.

The reference crawls each company's IR site breadth-first to depth 2
(src/enhanced_selenium_scraper.py:710-754): pop frontier → render →
extract/classify links (:698-708, :509-543) → score quarterly-looking
internal links and keep the top 5 (:634-696) → enqueue unvisited,
then finally keep documents with year >= 2023 or no year (:756-777).

Spark shape (SURVEY §2.10 X5): the frontier loop stays on the driver
(3 iterations, trivially cheap); everything per-iteration is a
DataFrame stage:

  frontier --fetch_stage--> html --regexp_extract_all + transform-->
  anchors (JVM-side, no Python in the parse) --resolve/classify-->
  links --union+dropDuplicates--> accumulated (U1/A4)
  next frontier = top-k promising internal (T1/A8) ∖ visited (U2/P10)

Scale notes: each iteration ends in ``localCheckpoint`` so lineage
does not grow across depths (the classic iterative-algorithm trap);
dedup shuffles on (company, href) which is the natural key; the
anchor parse is whole-stage-codegen'd regexp work, not a UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.functions.scalars import (
    DOCUMENT_EXTENSIONS,
    classify_link,
    document_type,
    extract_year,
    file_extension,
    resolve_url,
    url_host,
)
from automated_dow30_earnings_reports_spark.pipeline.fetch import FetcherFactory, fetch_stage

# A8 keyword score terms (ref src/enhanced_selenium_scraper.py:641-679).
PROMISING_KEYWORDS = ("quarterly", "earnings", "results", "financial", "report", "investor")

# P4 domain exclusions (ref :139-150, :555-571).
EXCLUDED_DOMAINS = (
    "facebook.com", "twitter.com", "linkedin.com", "youtube.com",
    "instagram.com", "businesswire.com", "prnewswire.com", "globenewswire.com",
)

_ANCHOR_PAT = r"(?s)(<a\s[^>]*>.*?</a>)"


def extract_links(pages: DataFrame) -> DataFrame:
    """Fetched pages (company, url, html, ...) → one row per anchor with
    resolved href, text, title, link_type, extension, document_type.

    All parsing is builtin regexp work inside codegen: anchors via
    ``regexp_extract_all``, attributes via ``transform`` lambdas —
    the F21 HTML extraction without a Python UDF in the hot path.
    """
    anchors = pages.select(
        "company",
        F.col("url").alias("source_url"),
        F.explode(F.regexp_extract_all("html", F.lit(_ANCHOR_PAT), 1)).alias("anchor"),
    )
    parsed = anchors.select(
        "company",
        "source_url",
        F.regexp_extract("anchor", r'href="([^"]+)"', 1).alias("raw_href"),
        F.regexp_extract("anchor", r'title="([^"]+)"', 1).alias("title"),
        # (?s) matches the anchor-capture regex's dotall: a pretty-printed
        # anchor whose text spans newlines otherwise extracted as '' and
        # zeroed the page's keyword score
        F.trim(F.regexp_replace(F.regexp_extract("anchor", r"(?s)>(.*)</a>", 1), r"<[^>]*>", "")).alias(
            "text"
        ),
    ).filter(F.col("raw_href") != "")
    resolved = parsed.select(
        "company",
        "source_url",
        resolve_url(F.col("source_url"), F.col("raw_href")).alias("href"),
        "text",
        "title",
    )
    return resolved.select(
        "company",
        "href",
        "text",
        "title",
        classify_link(F.col("href"), url_host(F.col("source_url"))).alias("link_type"),
        file_extension(F.col("href")),
        document_type(file_extension(F.col("href"))).alias("document_type"),
        "source_url",
    )


def keyword_score(*cols) -> F.Column:
    """A8: Σ keyword-presence over the given string columns (ref :668-672)."""
    terms = []
    for c in cols:
        low = F.lower(F.coalesce(c, F.lit("")))
        terms.extend(F.when(low.contains(k), 1).otherwise(0) for k in PROMISING_KEYWORDS)
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return total.alias("score")


def bfs_crawl(
    spark: SparkSession,
    seeds: DataFrame,
    fetcher_factory: FetcherFactory,
    max_depth: int = 2,
    top_k: int = 5,
    min_year: int = 2023,
) -> DataFrame:
    """Depth-limited BFS from ``seeds`` (company, url) → document links.

    Returns the reference's final result surface (:756-777): unique
    document links per company, min-year filtered with null-keeping
    semantics (P5).
    """
    frontier = seeds.select("company", "url").localCheckpoint(eager=True)
    visited = frontier
    per_depth_links: list[DataFrame] = []

    for depth in range(max_depth + 1):
        pages = fetch_stage(frontier, fetcher_factory).filter(F.col("html").isNotNull())
        # Eager checkpoint on the per-depth links, NOT on `accumulated`:
        # links feeds BOTH the accumulation and the next-frontier scoring,
        # and without the cut the scoring branch would re-run fetch_stage —
        # a second round of side effects per depth (and double fetch cost).
        # `accumulated` needs no checkpoint of its own: it is a union of
        # already-checkpointed per-depth RDDs, so its lineage is bounded by
        # max_depth and its dedup shuffles run once, lazily, at the end.
        links = (
            extract_links(pages)
            .dropDuplicates(["company", "href"])  # A4
            .localCheckpoint(eager=True)
        )
        per_depth_links.append(links)
        if depth == max_depth:
            break

        promising = (
            links.filter(F.col("link_type") == "internal")
            .filter(~url_host(F.col("href")).isin(*EXCLUDED_DOMAINS))  # P4
            .withColumn("score", keyword_score(F.col("text"), F.col("title"), F.col("href")))
            .filter(F.col("score") > 0)
        )
        ranked = promising.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("company").orderBy(F.desc("score"), F.asc("href"))
            ),
        ).filter(F.col("rn") <= top_k)  # T1 per-company top-k
        frontier = (
            ranked.select("company", F.col("href").alias("url"))
            .join(visited, ["company", "url"], "left_anti")  # U2/P10
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        # no checkpoint needed: visited is a union of ALREADY-checkpointed
        # frontiers and its lineage depth is bounded by max_depth (2-3) —
        # an eager checkpoint here is one extra job per depth for nothing
        visited = visited.unionByName(frontier)

    # U1/A4 across depths: ONE union + ONE dedup shuffle over the
    # checkpointed per-depth link sets (an incremental per-depth dedup
    # would re-shuffle the whole accumulation every depth).
    accumulated = per_depth_links[0]
    for more in per_depth_links[1:]:
        accumulated = accumulated.unionByName(more)
    accumulated = accumulated.dropDuplicates(["company", "href"])

    # final document-only + null-keeping min-year filter (P3/P5)
    docs = accumulated.filter(F.col("link_type") == "document")
    year = extract_year(F.col("href"))
    return docs.withColumn("year", year).filter(
        (F.col("file_extension") != "pdf") | F.col("year").isNull() | (F.col("year") >= min_year)
    )
