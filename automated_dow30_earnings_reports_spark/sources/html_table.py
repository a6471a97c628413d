"""S8 HTML-table scan + X4 HTML cleaning — JVM-regexp HTML operators.

The reference scans a Wikipedia wikitable into rows with BeautifulSoup
on the driver (get30DowTickers.py:7-143) and strips decorative HTML
(svg/img/style/script and junk classes) before LLM input
(enhanced_selenium_scraper.py:573-596). Both become declarative column
pipelines over an html string column:

  - table scan: regexp_extract_all rows → explode → per-cell
    regexp_extract_all → tag-strip/trim. At scale this runs over a
    DataFrame of fetched pages (one row per page) — the parse is
    whole-stage-codegen'd, no Python;
  - cleaning: an ordered regexp_replace chain (block elements with
    content first, then void elements, then remaining tags).

The reference's one-page driver-side fetch (S8) generalizes to the
fetch_stage (pipeline/fetch.py) feeding these parsers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
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


# (?i): real pages use <TR>/<TD>/<SCRIPT> freely (HTML tag names are
# case-insensitive; the reference's BeautifulSoup path is too) — a
# case-sensitive scan silently returned zero rows for uppercase tables
# and LEAKED script/style contents through the cleaner
_ROW_PAT = r"(?si)<tr[^>]*>(.*?)</tr>"
_CELL_PAT = r"(?si)<t[dh][^>]*>(.*?)</t[dh]>"


def parse_html_tables(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """html documents → one row per <tr> with a ``cells`` array of
    tag-stripped, trimmed cell texts (header rows included — callers
    filter, as the reference does by skipping row 0)."""
    rows = pages.withColumn("row_html", F.explode(F.regexp_extract_all(html_col, F.lit(_ROW_PAT), 1)))
    cells = F.transform(
        F.regexp_extract_all("row_html", F.lit(_CELL_PAT), 1),
        lambda c: F.trim(F.regexp_replace(c, r"<[^>]*>", "")),
    )
    return rows.withColumn("cells", cells).drop("row_html")


def clean_html(html: Column) -> Column:
    """X4: drop script/style/svg blocks (with content), void img tags,
    then every remaining tag; collapse whitespace. Per-tag patterns
    (no backreference) so the same regexes run under DuckDB's RE2."""
    c = html
    for tag in ("script", "style", "svg"):
        c = F.regexp_replace(c, rf"(?si)<{tag}[^>]*>.*?</{tag}>", " ")
    c = F.regexp_replace(c, r"(?i)<img[^>]*/?>", " ")
    c = F.regexp_replace(c, r"<[^>]*>", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " ")).alias("clean_text")


# ---------------------------------------------------------------------------
# Queries — synthetic pages built with pure SQL expressions so DuckDB
# can state the expected *output* directly.
# ---------------------------------------------------------------------------


@_register(
    "html_table_scan",
    """
    SELECT n.n_regionkey                 AS region_key,
           n.n_name                      AS company,
           substring(n.n_name, 1, 3)     AS ticker
    FROM nation n
    WHERE substring(n.n_name, 1, 3) ~ '^[A-Z]{1,5}$'
    ORDER BY region_key, company
    """,
)
def html_table_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8+F14: one wikitable page per region (nations as rows) → parse
    rows/cells → ticker-regex filter. The full build→parse→filter round
    trip runs in Spark; the oracle states the expected output."""
    n = load_table(spark, sf_dir, "nation")
    tr = F.format_string(
        "<tr><td>%s</td><td>%s</td></tr>", F.col("n_name"), F.substring("n_name", 1, 3)
    )
    pages = (
        n.groupBy("n_regionkey")
        .agg(F.concat_ws("", F.collect_list(tr)).alias("body"))
        .select(
            F.col("n_regionkey").alias("region_key"),
            F.concat(
                F.lit('<table class="wikitable"><tr><th>Company</th><th>Ticker</th></tr>'),
                F.col("body"),
                F.lit("</table>"),
            ).alias("html"),
        )
    )
    parsed = parse_html_tables(pages)
    data_rows = parsed.filter(F.size("cells") == 2)  # header row has <th> cells too; shape-filter
    out = data_rows.select(
        "region_key",
        F.element_at("cells", 1).alias("company"),
        F.element_at("cells", 2).alias("ticker"),
    )
    # header row ("Company","Ticker") is dropped by the ticker regex (F14)
    return out.filter(F.col("ticker").rlike("^[A-Z]{1,5}$")).orderBy("region_key", "company")


@_register(
    "html_clean",
    """
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       '<div class="doc"><script>var x=1;</script><style>.a{}</style>'
                         || '<svg><path d="M0"/></svg><img src="x.png"/><p>' || text || '</p></div>',
                       '(?si)<script[^>]*>.*?</script>', ' ', 'g'),
                     '(?si)<style[^>]*>.*?</style>', ' ', 'g'),
                   '(?si)<svg[^>]*>.*?</svg>', ' ', 'g'),
                 '(?i)<img[^>]*/?>', ' ', 'g'),
               '<[^>]*>', ' ', 'g'),
             '\\s+', ' ', 'g')) AS clean_text
    FROM documents
    ORDER BY doc_id
    """,
)
def html_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 over synthetic noisy HTML wrapping documents.text — the clean
    output must equal the original text (both engines run the same
    regexp chain; the oracle rebuilds the same noisy input)."""
    d = load_table(spark, sf_dir, "documents")
    noisy = F.concat(
        F.lit('<div class="doc"><script>var x=1;</script><style>.a{}</style>'),
        F.lit('<svg><path d="M0"/></svg><img src="x.png"/><p>'),
        F.col("text"),
        F.lit("</p></div>"),
    )
    return d.select("doc_id", clean_html(noisy)).orderBy("doc_id")
