"""Scalar column-expression library (SURVEY.md §2.7, F1-F20).

Every function returns a pure ``pyspark.sql.Column`` built from JVM
builtins — no Python UDFs — so all of them inline into whole-stage
codegen and survive any data scale. Reference citations mark the
behavior each re-expresses; where the reference's regex logic has
bugs (SURVEY §7 "what's hard" (b)), we implement the *intended*
semantics and note the divergence.

The QUERIES/ORACLES at the bottom exercise each function over the
driver testdata with DuckDB equivalents (regex semantics verified
identical: no-match regexp_extract -> '' in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.tables import load_table

# ---------------------------------------------------------------------------
# F1 — key='value' record-line capture (ref src/download_reports.py:313-327,
# src/orchestrator.py:116-125)
# ---------------------------------------------------------------------------


def extract_kv(line: Column | str, key: str) -> Column:
    """Extract the value of ``key='...'`` from a serialized record line.

    NULL (not '') when the key is absent, normalizing Spark's
    empty-string-on-no-match regexp_extract semantics.
    """
    pat = rf"{key}='([^']*)'"
    return F.nullif(F.regexp_extract(line, pat, 1), F.lit(""))


# ---------------------------------------------------------------------------
# F2 — multi-pattern year/quarter extraction
# (ref src/enhanced_selenium_scraper.py:299-371 — the reference rebuilds its
# 2-digit patterns inside a loop due to an indentation bug; we implement the
# intended priority: 4-digit year > FY-2-digit > {q}Q{yy}.)
# ---------------------------------------------------------------------------

_Y4 = r"(19[0-9]{2}|20[0-9]{2})"
_FY2 = r"(?i)fy\s*-?\s*([0-9]{2})"
_QY2 = r"(?i)([1-4])q([0-9]{2})"
_Q = r"(?i)q\s*-?\s*([1-4])"


def _century(two_digit: Column) -> Column:
    """Two-digit year → four-digit (>=70 → 19xx else 20xx)."""
    return F.when(two_digit >= 70, two_digit + 1900).otherwise(two_digit + 2000)


def extract_year(s: Column | str) -> Column:
    """First year found: 4-digit (1900-2099), else FY-2-digit, else {q}Q{yy}."""
    y4 = F.nullif(F.regexp_extract(s, _Y4, 1), F.lit("")).cast("int")
    fy = _century(F.nullif(F.regexp_extract(s, _FY2, 1), F.lit("")).cast("int"))
    qy = _century(F.nullif(F.regexp_extract(s, _QY2, 2), F.lit("")).cast("int"))
    return F.coalesce(y4, fy, qy).alias("year")


def extract_quarter(s: Column | str) -> Column:
    """Quarter 1-4: {q}Q{yy} form wins (its digit precedes the Q), else Q{q}."""
    qy = F.nullif(F.regexp_extract(s, _QY2, 1), F.lit("")).cast("int")
    q = F.nullif(F.regexp_extract(s, _Q, 1), F.lit("")).cast("int")
    return F.coalesce(qy, q).alias("quarter")


# ---------------------------------------------------------------------------
# F4/F5 — file extension + document type
# (ref src/enhanced_selenium_scraper.py:54-58 takes href.split('.')[-1],
# which yields junk like 'com/page' for extension-less URLs; intended
# semantics: extension only when the URL *path* ends in one.)
# ---------------------------------------------------------------------------

_EXT_PAT = r"\.([A-Za-z0-9]{1,5})(?:[?#].*)?$"

# 18-entry extension→label map (ref src/enhanced_selenium_scraper.py:60-86).
DOCUMENT_TYPE_MAP = {
    "pdf": "PDF Document",
    "doc": "Word Document",
    "docx": "Word Document",
    "xls": "Excel Spreadsheet",
    "xlsx": "Excel Spreadsheet",
    "ppt": "PowerPoint Presentation",
    "pptx": "PowerPoint Presentation",
    "zip": "Archive",
    "rar": "Archive",
    "csv": "CSV Data",
    "txt": "Text Document",
    "rtf": "Rich Text Document",
    "xml": "XML Document",
    "json": "JSON Data",
    "htm": "Web Page",
    "html": "Web Page",
    "aspx": "Web Page",
    "php": "Web Page",
}

DOCUMENT_EXTENSIONS = frozenset(
    {"pdf", "doc", "docx", "xls", "xlsx", "ppt", "pptx", "zip", "rar", "csv", "txt", "rtf"}
)


def file_extension(href: Column | str) -> Column:
    """Lowercased extension of the URL's last path segment ('' if none)."""
    return F.lower(F.regexp_extract(href, _EXT_PAT, 1)).alias("file_extension")


def document_type(ext: Column) -> Column:
    """Extension → human label via the 18-entry reference map."""
    expr = None
    for k, v in DOCUMENT_TYPE_MAP.items():
        expr = F.when(ext == k, v) if expr is None else expr.when(ext == k, v)
    return expr.otherwise("Unknown").alias("document_type")


def classify_link(href: Column, source_host: Column) -> Column:
    """P2 link classification CASE (ref src/enhanced_selenium_scraper.py:509-543):
    document / invalid / internal / external by extension, scheme, and domain."""
    ext = file_extension(href)
    host = url_host(href)
    return (
        F.when(ext.isin(*DOCUMENT_EXTENSIONS), "document")
        .when(
            href.startswith("javascript:") | href.startswith("mailto:") | href.startswith("#"),
            "invalid",
        )
        .when(host == source_host, "internal")
        .otherwise("external")
        .alias("link_type")
    )


# ---------------------------------------------------------------------------
# F6/F7 — URL parse + resolve (ref src/enhanced_selenium_scraper.py:489-507,
# :545-553; src/download_reports.py:451-456)
# ---------------------------------------------------------------------------


def url_host(url: Column | str) -> Column:
    return F.parse_url(url, F.lit("HOST")).alias("host")


def url_path(url: Column | str) -> Column:
    return F.parse_url(url, F.lit("PATH")).alias("path")


def url_protocol(url: Column | str) -> Column:
    return F.parse_url(url, F.lit("PROTOCOL")).alias("protocol")


def resolve_url(base: Column, href: Column) -> Column:
    """urljoin for the crawl's common cases, builtin-only (F7):
    scheme-prefixed stays (http://…, mailto:, javascript: — urljoin
    keeps non-relative refs intact); '//h/p' inherits scheme; '/p' is
    host-rooted; '#frag' appends to base; otherwise resolve against
    the base's directory."""
    scheme = url_protocol(base)
    host = url_host(base)
    # a path-less base (https://x.com) resolves relative refs against
    # the host root, not against a stripped "https://" prefix
    base_dir = F.when(
        base.rlike(r"(?i)^[a-z][a-z0-9+.-]*://[^/]*$"), F.concat(base, F.lit("/"))
    ).otherwise(F.regexp_replace(base, r"[^/]*$", ""))
    return (
        F.when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*:"), href)
        .when(href.startswith("/"), F.concat(scheme, F.lit("://"), host, href))
        .when(href.startswith("#"), F.concat(base, href))
        .when(href.startswith("?"), F.concat(F.regexp_replace(base, r"\?.*$", ""), href))
        .otherwise(F.concat(base_dir, href))
        .alias("resolved_url")
    )


# ---------------------------------------------------------------------------
# F8-F11 — filename derivation pipeline (ref src/download_reports.py:349-418)
# ---------------------------------------------------------------------------


def sanitize_filename(name: Column | str) -> Column:
    """F8: replace filesystem-illegal chars with '_' (ref :477-479)."""
    return F.regexp_replace(name, r'[<>:"/\\|?*]', "_").alias("sanitized")


def parse_content_disposition(header: Column | str) -> Column:
    """F9: RFC 6266 filename*/filename extraction (ref :349-363)."""
    star = F.nullif(F.regexp_extract(header, r"filename\*=(?:UTF-8'')?([^;]+)", 1), F.lit(""))
    plain = F.nullif(F.regexp_extract(header, r'filename="?([^";]+)"?', 1), F.lit(""))
    return F.coalesce(star, plain).alias("cd_filename")


def content_type_extension(content_type: Column | str) -> Column:
    """F10: content-type → extension CASE (ref :365-387)."""
    ct = F.lower(content_type)
    return (
        F.when(ct.contains("pdf"), ".pdf")
        .when(ct.contains("spreadsheet") | ct.contains("excel"), ".xlsx")
        .when(ct.contains("presentation") | ct.contains("powerpoint"), ".pptx")
        .when(ct.contains("msword") | ct.contains("wordprocessing"), ".docx")
        .when(ct.contains("zip"), ".zip")
        .when(ct.contains("html"), ".html")
        .when(ct.contains("csv"), ".csv")
        .when(ct.contains("json"), ".json")
        .when(ct.contains("xml"), ".xml")
        .when(ct.contains("text/plain"), ".txt")
        .otherwise(".bin")
        .alias("ext_from_content_type")
    )


def build_filename(
    title: Column, year: Column, quarter: Column, ext: Column, cd_name: Column, url: Column
) -> Column:
    """F11: 3-priority filename coalesce (ref :389-418):
    '{title}_{year}Q{quarter}{ext}' > content-disposition name > URL last
    segment > 'download{ext}'."""
    from_title = F.when(
        title.isNotNull() & year.isNotNull() & quarter.isNotNull(),
        F.concat(
            sanitize_filename(title), F.lit("_"), year, F.lit("Q"), quarter, ext
        ),
    )
    last_seg = F.nullif(F.regexp_extract(url, r"/([^/?#]+)(?:[?#].*)?$", 1), F.lit(""))
    return F.coalesce(from_title, cd_name, last_seg, F.concat(F.lit("download"), ext)).alias(
        "filename"
    )


# ---------------------------------------------------------------------------
# F18/F19 — smart truncation + size-based model CASE
# (ref src/extract_reports.py:15-35, :38-51)
# ---------------------------------------------------------------------------


def smart_truncate(text: Column, limit: int) -> Column:
    """Truncate to ``limit`` chars, backing up to the last space inside the
    window when one exists (ref break-point search :24-33)."""
    prefix = F.substring(text, 1, limit)
    last_space_from_end = F.instr(F.reverse(prefix), " ")
    cut = F.lit(limit) - last_space_from_end
    return (
        F.when(F.length(text) <= limit, text)
        .when(last_space_from_end == 0, prefix)
        .otherwise(F.substring(text, 1, cut))
        .alias("truncated")
    )


def select_model(text: Column, threshold: int = 200) -> Column:
    """F19 size-based model selection (ref :38-51): big inputs go to the
    higher-context model."""
    return (
        F.when(F.length(text) > threshold, "model-large-context")
        .otherwise("model-default")
        .alias("model")
    )


# ===========================================================================
# Queries + DuckDB oracles
# ===========================================================================

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _synthetic_titles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic report-title strings in the reference's observed
    formats (FIXTURES.md document_links distribution), derived from
    orders so Spark and DuckDB construct byte-identical inputs."""
    o = load_table(spark, sf_dir, "orders")
    y = F.year("o_orderdate").cast("string")
    yy = F.lpad((F.year("o_orderdate") % 100).cast("string"), 2, "0")
    q = F.quarter("o_orderdate").cast("string")
    title = (
        F.when(F.col("o_orderkey") % 6 == 0, F.concat(F.lit("Q"), q, F.lit(" "), y, F.lit(" Earnings Release")))
        .when(F.col("o_orderkey") % 6 == 1, F.concat(F.lit("FY"), yy, F.lit(" Q"), q, F.lit(" Report")))
        .when(F.col("o_orderkey") % 6 == 2, F.concat(q, F.lit("Q"), yy, F.lit(" results")))
        .when(F.col("o_orderkey") % 6 == 3, F.concat(F.lit("report-"), y, F.lit("-q"), q, F.lit(".pdf")))
        .when(F.col("o_orderkey") % 6 == 4, F.concat(F.lit("Annual Report "), y))
        .otherwise(F.lit("investor relations home"))
    )
    return o.select(F.col("o_orderkey").alias("key"), title.alias("title"))


_SYNTH_TITLES_SQL = """
    SELECT o_orderkey AS key,
           CASE o_orderkey % 6
             WHEN 0 THEN 'Q' || CAST(EXTRACT(quarter FROM o_orderdate) AS VARCHAR)
                      || ' ' || CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR)
                      || ' Earnings Release'
             WHEN 1 THEN 'FY' || lpad(CAST(EXTRACT(year FROM o_orderdate) % 100 AS VARCHAR), 2, '0')
                      || ' Q' || CAST(EXTRACT(quarter FROM o_orderdate) AS VARCHAR) || ' Report'
             WHEN 2 THEN CAST(EXTRACT(quarter FROM o_orderdate) AS VARCHAR)
                      || 'Q' || lpad(CAST(EXTRACT(year FROM o_orderdate) % 100 AS VARCHAR), 2, '0')
                      || ' results'
             WHEN 3 THEN 'report-' || CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR)
                      || '-q' || CAST(EXTRACT(quarter FROM o_orderdate) AS VARCHAR) || '.pdf'
             WHEN 4 THEN 'Annual Report ' || CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR)
             ELSE 'investor relations home'
           END AS title
    FROM orders
"""


@_register(
    "extract_year_quarter",
    f"""
    WITH titles AS ({_SYNTH_TITLES_SQL}),
    extracted AS (
      SELECT
        COALESCE(
          CAST(nullif(regexp_extract(title, '(19[0-9]{{2}}|20[0-9]{{2}})', 1), '') AS INT),
          CASE WHEN CAST(nullif(regexp_extract(title, '(?i)fy\\s*-?\\s*([0-9]{{2}})', 1), '') AS INT) >= 70
               THEN CAST(nullif(regexp_extract(title, '(?i)fy\\s*-?\\s*([0-9]{{2}})', 1), '') AS INT) + 1900
               ELSE CAST(nullif(regexp_extract(title, '(?i)fy\\s*-?\\s*([0-9]{{2}})', 1), '') AS INT) + 2000 END,
          CASE WHEN CAST(nullif(regexp_extract(title, '(?i)([1-4])q([0-9]{{2}})', 2), '') AS INT) >= 70
               THEN CAST(nullif(regexp_extract(title, '(?i)([1-4])q([0-9]{{2}})', 2), '') AS INT) + 1900
               ELSE CAST(nullif(regexp_extract(title, '(?i)([1-4])q([0-9]{{2}})', 2), '') AS INT) + 2000 END
        ) AS year,
        COALESCE(
          CAST(nullif(regexp_extract(title, '(?i)([1-4])q([0-9]{{2}})', 1), '') AS INT),
          CAST(nullif(regexp_extract(title, '(?i)q\\s*-?\\s*([1-4])', 1), '') AS INT)
        ) AS quarter
      FROM titles
    )
    SELECT year, quarter, COUNT(*) AS n
    FROM extracted GROUP BY year, quarter ORDER BY year NULLS FIRST, quarter NULLS FIRST
    """,
)
def extract_year_quarter_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 year/quarter extraction over all observed title formats."""
    titles = _synthetic_titles(spark, sf_dir)
    return (
        titles.select(
            extract_year(F.col("title")).alias("year"),
            extract_quarter(F.col("title")).alias("quarter"),
        )
        .groupBy("year", "quarter")
        .agg(F.count("*").alias("n"))
        .orderBy(F.asc_nulls_first("year"), F.asc_nulls_first("quarter"))
    )


def _synthetic_hrefs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL corpus with the reference's observed shapes: documents with
    real extensions, extension-less pages, mailto/javascript junk,
    third-party domains (FIXTURES.md document_links)."""
    d = load_table(spark, sf_dir, "documents")
    i = F.col("doc_id")
    href = (
        F.when(i % 8 == 0, F.concat(F.lit("https://ir.example.com/"), F.col("source"), F.lit("/report_"), i, F.lit(".pdf")))
        .when(i % 8 == 1, F.concat(F.lit("https://ir.example.com/"), F.col("source"), F.lit("/data_"), i, F.lit(".XLSX")))
        .when(i % 8 == 2, F.concat(F.lit("https://ir.example.com/news/item_"), i, F.lit(".htm?utm=x")))
        .when(i % 8 == 3, F.concat(F.lit("https://cdn.thirdparty.net/assets/deck_"), i, F.lit(".pptx")))
        .when(i % 8 == 4, F.concat(F.lit("https://ir.example.com/pages/overview_"), i))
        .when(i % 8 == 5, F.lit("mailto:ir@example.com"))
        .when(i % 8 == 6, F.concat(F.lit("https://ir.example.com/archive_"), i, F.lit(".zip")))
        .otherwise(F.concat(F.lit("javascript:void("), i, F.lit(")")))
    )
    return d.select(i.alias("doc_id"), href.alias("href"))


_SYNTH_HREFS_SQL = """
    SELECT doc_id,
           CASE doc_id % 8
             WHEN 0 THEN 'https://ir.example.com/' || source || '/report_' || CAST(doc_id AS VARCHAR) || '.pdf'
             WHEN 1 THEN 'https://ir.example.com/' || source || '/data_' || CAST(doc_id AS VARCHAR) || '.XLSX'
             WHEN 2 THEN 'https://ir.example.com/news/item_' || CAST(doc_id AS VARCHAR) || '.htm?utm=x'
             WHEN 3 THEN 'https://cdn.thirdparty.net/assets/deck_' || CAST(doc_id AS VARCHAR) || '.pptx'
             WHEN 4 THEN 'https://ir.example.com/pages/overview_' || CAST(doc_id AS VARCHAR)
             WHEN 5 THEN 'mailto:ir@example.com'
             WHEN 6 THEN 'https://ir.example.com/archive_' || CAST(doc_id AS VARCHAR) || '.zip'
             ELSE 'javascript:void(' || CAST(doc_id AS VARCHAR) || ')'
           END AS href
    FROM documents
"""


@_register(
    "file_ext_doctype",
    f"""
    WITH hrefs AS ({_SYNTH_HREFS_SQL})
    SELECT lower(regexp_extract(href, '\\.([A-Za-z0-9]{{1,5}})(?:[?#].*)?$', 1)) AS file_extension,
           CASE lower(regexp_extract(href, '\\.([A-Za-z0-9]{{1,5}})(?:[?#].*)?$', 1))
             WHEN 'pdf' THEN 'PDF Document'
             WHEN 'doc' THEN 'Word Document' WHEN 'docx' THEN 'Word Document'
             WHEN 'xls' THEN 'Excel Spreadsheet' WHEN 'xlsx' THEN 'Excel Spreadsheet'
             WHEN 'ppt' THEN 'PowerPoint Presentation' WHEN 'pptx' THEN 'PowerPoint Presentation'
             WHEN 'zip' THEN 'Archive' WHEN 'rar' THEN 'Archive'
             WHEN 'csv' THEN 'CSV Data' WHEN 'txt' THEN 'Text Document'
             WHEN 'rtf' THEN 'Rich Text Document' WHEN 'xml' THEN 'XML Document'
             WHEN 'json' THEN 'JSON Data'
             WHEN 'htm' THEN 'Web Page' WHEN 'html' THEN 'Web Page'
             WHEN 'aspx' THEN 'Web Page' WHEN 'php' THEN 'Web Page'
             ELSE 'Unknown'
           END AS document_type,
           COUNT(*) AS n
    FROM hrefs
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def file_ext_doctype_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 extension + F5 doc-type map, A5-style histogram over it."""
    hrefs = _synthetic_hrefs(spark, sf_dir)
    ext = file_extension(F.col("href"))
    return (
        hrefs.select(ext.alias("file_extension"))
        .select("file_extension", document_type(F.col("file_extension")).alias("document_type"))
        .groupBy("file_extension", "document_type")
        .agg(F.count("*").alias("n"))
        .orderBy("file_extension", "document_type")
    )


@_register(
    "link_classification",
    f"""
    WITH hrefs AS ({_SYNTH_HREFS_SQL})
    SELECT CASE
             WHEN lower(regexp_extract(href, '\\.([A-Za-z0-9]{{1,5}})(?:[?#].*)?$', 1))
                  IN ('pdf','doc','docx','xls','xlsx','ppt','pptx','zip','rar','csv','txt','rtf')
               THEN 'document'
             WHEN href LIKE 'javascript:%' OR href LIKE 'mailto:%' OR href LIKE '#%'
               THEN 'invalid'
             WHEN regexp_extract(href, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1) = 'ir.example.com'
               THEN 'internal'
             ELSE 'external'
           END AS link_type,
           COUNT(*) AS n
    FROM hrefs GROUP BY 1 ORDER BY 1
    """,
)
def link_classification_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 link classification CASE (document/invalid/internal/external)."""
    hrefs = _synthetic_hrefs(spark, sf_dir)
    return (
        hrefs.select(classify_link(F.col("href"), F.lit("ir.example.com")).alias("link_type"))
        .groupBy("link_type")
        .agg(F.count("*").alias("n"))
        .orderBy("link_type")
    )


@_register(
    "url_parse",
    f"""
    WITH hrefs AS ({_SYNTH_HREFS_SQL}),
    scoped AS (SELECT href FROM hrefs WHERE href LIKE 'http%')
    SELECT regexp_extract(href, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1) AS protocol,
           regexp_extract(href, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1) AS host,
           regexp_extract(href, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)?', 1) AS path,
           COUNT(*) AS n
    FROM scoped GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def url_parse_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 URL host/path/protocol parse (http URLs only — parse_url and the
    oracle regex agree on those; mailto/javascript are P2's 'invalid')."""
    hrefs = _synthetic_hrefs(spark, sf_dir).where(F.col("href").startswith("http"))
    return (
        hrefs.select(
            url_protocol(F.col("href")).alias("protocol"),
            url_host(F.col("href")).alias("host"),
            F.coalesce(url_path(F.col("href")), F.lit("")).alias("path"),
        )
        .groupBy("protocol", "host", "path")
        .agg(F.count("*").alias("n"))
        .orderBy("protocol", "host", "path")
    )


@_register(
    "filename_pipeline",
    """
    SELECT p_partkey,
           regexp_replace(p_name, '[<>:"/\\\\|?*]', '_', 'g') || '_'
             || CAST(2024 AS VARCHAR) || 'Q' || CAST((p_partkey % 4) + 1 AS VARCHAR)
             || '.pdf' AS filename
    FROM part
    ORDER BY p_partkey
    """,
)
def filename_pipeline_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 sanitize + F12 format: '{sanitized}_{year}Q{quarter}{ext}'
    (ref src/download_reports.py:404-406, :477-479)."""
    p = load_table(spark, sf_dir, "part")
    fname = F.concat(
        sanitize_filename(F.col("p_name")),
        F.lit("_2024Q"),
        ((F.col("p_partkey") % 4) + 1).cast("string"),
        F.lit(".pdf"),
    )
    return p.select("p_partkey", fname.alias("filename")).orderBy("p_partkey")


@_register(
    "kv_roundtrip",
    """
    WITH lines AS (
      SELECT 'name=''' || c_name || ''' key=''' || CAST(c_custkey AS VARCHAR)
             || ''' bal=''' || printf('%.2f', c_acctbal) || '''' AS line
      FROM customer
    )
    SELECT nullif(regexp_extract(line, 'name=''([^'']*)''', 1), '') AS name,
           CAST(nullif(regexp_extract(line, 'key=''([^'']*)''', 1), '') AS BIGINT) AS key,
           CAST(nullif(regexp_extract(line, 'bal=''([^'']*)''', 1), '') AS DOUBLE) AS bal
    FROM lines ORDER BY key
    """,
)
def kv_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/S2 round-trip: serialize rows to key='value' record lines
    (ref orchestrator.py:78-81) and regex-parse them back
    (ref download_reports.py:313-327)."""
    c = load_table(spark, sf_dir, "customer")
    line = F.concat(
        F.lit("name='"), F.col("c_name"),
        F.lit("' key='"), F.col("c_custkey").cast("string"),
        F.lit("' bal='"), F.format_string("%.2f", F.col("c_acctbal")),
        F.lit("'"),
    )
    lines = c.select(line.alias("line"))
    return lines.select(
        extract_kv(F.col("line"), "name").alias("name"),
        extract_kv(F.col("line"), "key").cast("bigint").alias("key"),
        extract_kv(F.col("line"), "bal").cast("double").alias("bal"),
    ).orderBy("key")


@_register(
    "json_scalar",
    """
    SELECT event_type,
           ROUND(AVG(CAST(props->>'k' AS INT)), 4) AS avg_k,
           CAST(MAX(CAST(props->>'k' AS INT)) AS INT) AS max_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def json_scalar_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F22 JSON decode (ref simple_metadata_collector.py:126-127):
    get_json_object over the events.props JSON column."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").cast("int").alias("max_k"),
        )
        .orderBy("event_type")
    )


@_register(
    "md5_checksum",
    """
    SELECT substr(md5(text), 1, 2) AS bucket, COUNT(*) AS n
    FROM documents GROUP BY 1 ORDER BY 1
    """,
)
def md5_checksum_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17 MD5 checksum (ref simple_metadata_collector.py:132-145),
    bucketed histogram over the hex digest."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.substring(F.md5(F.col("text").cast("binary")), 1, 2).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


@_register(
    "truncate_model_select",
    """
    WITH t AS (
      SELECT CASE
               WHEN length(text) <= 120 THEN text
               WHEN strpos(reverse(substr(text, 1, 120)), ' ') = 0 THEN substr(text, 1, 120)
               ELSE substr(text, 1, 120 - strpos(reverse(substr(text, 1, 120)), ' '))
             END AS truncated,
             CASE WHEN length(text) > 200 THEN 'model-large-context'
                  ELSE 'model-default' END AS model
      FROM documents
    )
    SELECT model,
           COUNT(*) AS n,
           ROUND(AVG(length(truncated)), 4) AS avg_len
    FROM t GROUP BY model ORDER BY model
    """,
)
def truncate_model_select_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F18 smart truncation + F19 size-based model CASE
    (ref extract_reports.py:15-51)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        smart_truncate(F.col("text"), 120).alias("truncated"),
        select_model(F.col("text"), 200).alias("model"),
    )
    return (
        t.groupBy("model")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.length("truncated")), 4).alias("avg_len"),
        )
        .orderBy("model")
    )


@_register(
    "word_char_count",
    """
    SELECT lang,
           ROUND(AVG(len(string_split_regex(trim(text), '\\s+'))), 4) AS avg_words,
           ROUND(AVG(length(text)), 4) AS avg_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def word_char_count_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F20 word/char counts (ref extract_reports.py:40-41, orchestrator.py:97)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.round(F.avg(F.size(F.split(F.trim(F.col("text")), r"\s+"))), 4).alias("avg_words"),
            F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
        )
        .orderBy("lang")
    )
