"""DOM-based HTML operators (S8/F21/X4 fidelity path).

The reference parses HTML with BeautifulSoup('html.parser')
(/root/reference/src/enhanced_selenium_scraper.py:573-632: decompose
svg/img/style/script, prune decorative-class elements, drop empty
elements; :598-632: find_all('a') → href/get_text/title) and pandas
read_html for wikitables (/root/reference/src/scrapers/get30DowTickers.py:7-143).

`sources/html_table.py` approximates those with JVM regexps — fast,
codegen'd, and right for well-formed pages, but regexes diverge on
malformed real-world HTML (unclosed tags, nested tables). This module
is the *fidelity* path: a real tokenizer-driven DOM walk built on the
stdlib `html.parser.HTMLParser` (the same tokenizer BeautifulSoup uses
under its 'html.parser' backend — no new dependency), run as
Arrow-batched pandas UDFs.

Engine guidance: use the JVM-regex operators for bulk scans of
machine-generated HTML; use these DOM operators when the input is
real-world HTML where recovery semantics matter. Both are oracled.

Scale shape: one pandas_udf call per page batch — embarrassingly
parallel, no shuffle introduced; the Python boundary is Arrow-batched
(never row-at-a-time), which is the documented slow-path contract for
inherently-Python parsing (PERF.md "Python-boundary policy").
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

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


# ---------------------------------------------------------------------------
# Minimal recovering DOM tree. html.parser tokenizes; recovery rules here
# mirror the HTML5 "implied end tag" cases that matter for tables/lists —
# the situations where the regex path silently produces wrong rows.
# ---------------------------------------------------------------------------

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# A start tag of <key> implicitly closes an open element in its value set.
_IMPLIED_END = {
    "td": frozenset({"td", "th", "p"}),
    "th": frozenset({"td", "th", "p"}),
    "tr": frozenset({"td", "th", "tr", "p"}),
    "li": frozenset({"li", "p"}),
    "p": frozenset({"p"}),
    "option": frozenset({"option"}),
    "table": frozenset({"p"}),
}

# Reference decorative-class keywords (enhanced_selenium_scraper.py:584-588).
DECORATIVE_CLASS_KEYWORDS = ("icon", "background", "gradient", "layer", "sketch", "pdf-icon")

# Reference decompose list (enhanced_selenium_scraper.py:580-582).
DROP_TAGS = frozenset({"svg", "img", "style", "script"})


class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str]):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # _Node | str


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {})
        self.stack = [self.root]

    # -- tokenizer events ---------------------------------------------------
    def handle_starttag(self, tag, attrs):
        node = _Node(tag, {k: (v or "") for k, v in attrs})
        if tag in VOID_TAGS:
            self.stack[-1].children.append(node)
            return
        implied = _IMPLIED_END.get(tag)
        if implied:
            while len(self.stack) > 1 and self.stack[-1].tag in implied:
                self.stack.pop()
        self.stack[-1].children.append(node)
        self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag, {k: (v or "") for k, v in attrs}))

    def handle_endtag(self, tag):
        if tag in VOID_TAGS:
            return
        # recover from unclosed children: pop to the matching open tag if
        # one exists anywhere on the stack; ignore stray end tags.
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_dom(html: str) -> _Node:
    p = _TreeBuilder()
    p.feed(html or "")
    p.close()
    return p.root


def _is_decorative(node: _Node) -> bool:
    cls = node.attrs.get("class", "").lower()
    return bool(cls) and any(k in cls for k in DECORATIVE_CLASS_KEYWORDS)


def _pruned(node: _Node) -> bool:
    return node.tag in DROP_TAGS or _is_decorative(node)


def _collect_text(node: _Node, out: list[str]) -> None:
    for ch in node.children:
        if isinstance(ch, str):
            out.append(ch)
        elif not _pruned(ch):
            _collect_text(ch, out)


def _norm(parts: list[str]) -> str:
    return " ".join("".join(parts).split())


def dom_text(html: str) -> str:
    """Visible text after the reference's pruning rules (drop
    svg/img/style/script subtrees and decorative-class elements),
    whitespace-normalized."""
    out: list[str] = []
    _collect_text(parse_dom(html), out)
    return _norm(out)


def dom_links(html: str) -> list[dict]:
    """All <a> elements outside pruned subtrees →
    {href, text, title} (reference create_document_link inputs,
    enhanced_selenium_scraper.py:598-604)."""
    links: list[dict] = []

    def walk(node: _Node) -> None:
        for ch in node.children:
            if isinstance(ch, str) or _pruned(ch):
                continue
            if ch.tag == "a":
                parts: list[str] = []
                _collect_text(ch, parts)
                links.append(
                    {
                        "href": ch.attrs.get("href", ""),
                        "text": _norm(parts),
                        "title": ch.attrs.get("title", ""),
                    }
                )
            walk(ch)

    walk(parse_dom(html))
    return links


def dom_table_rows(html: str) -> list[list[str]]:
    """Every <tr>'s direct td/th cell texts, in document order. Nested
    tables contribute their own rows (a nested table's text is NOT
    flattened into the outer cell — the divergence regex parsing gets
    wrong), matching pandas.read_html's one-table-at-a-time model."""
    rows: list[list[str]] = []

    def walk(node: _Node) -> None:
        for ch in node.children:
            if isinstance(ch, str) or _pruned(ch):
                continue
            if ch.tag == "tr":
                row = []
                for cell in ch.children:
                    if isinstance(cell, _Node) and cell.tag in ("td", "th"):
                        parts: list[str] = []
                        # direct text only — a nested table inside a cell
                        # renders as its own rows, not inline cell text
                        _collect_cell_text(cell, parts)
                        row.append(_norm(parts))
                rows.append(row)
            walk(ch)

    def _collect_cell_text(node: _Node, out: list[str]) -> None:
        for ch in node.children:
            if isinstance(ch, str):
                out.append(ch)
            elif isinstance(ch, _Node) and ch.tag != "table" and not _pruned(ch):
                _collect_cell_text(ch, out)

    walk(parse_dom(html))
    return rows


# ---------------------------------------------------------------------------
# Spark surface — Arrow-batched pandas UDFs over an html string column.
# ---------------------------------------------------------------------------


_LINK_TYPE = ArrayType(
    StructType(
        [
            StructField("href", StringType()),
            StructField("text", StringType()),
            StructField("title", StringType()),
        ]
    )
)


# DataType objects (not DDL strings) so the UDFs are constructible at
# import time without an active SparkSession.
@F.pandas_udf(StringType())
def dom_text_udf(html: pd.Series) -> pd.Series:
    return html.map(dom_text)


@F.pandas_udf(_LINK_TYPE)
def dom_links_udf(html: pd.Series) -> pd.Series:
    return html.map(dom_links)


@F.pandas_udf(ArrayType(ArrayType(StringType())))
def dom_table_rows_udf(html: pd.Series) -> pd.Series:
    return html.map(dom_table_rows)


def parse_html_tables_dom(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """DOM twin of sources.html_table.parse_html_tables: one output row
    per <tr> with a `cells` array."""
    return pages.withColumn("cells", F.explode(dom_table_rows_udf(F.col(html_col))))


# ---------------------------------------------------------------------------
# Queries — synthetic pages exercise exactly the malformed-HTML shapes
# the regex path cannot handle: unclosed <td>/<tr>, decorative-class
# pruning, anchors wrapping markup. Oracles state expected outputs.
# ---------------------------------------------------------------------------


@_register(
    "html_dom_table_scan",
    """
    SELECT n.n_regionkey                 AS region_key,
           n.n_name                      AS company,
           substring(n.n_name, 1, 3)     AS ticker
    FROM nation n
    WHERE substring(n.n_name, 1, 3) ~ '^[A-Z]{1,5}$'
    ORDER BY region_key, company
    """,
)
def html_dom_table_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 through the DOM parser over a MALFORMED wikitable: rows use
    unclosed <td> and <tr> tags (implied-end recovery), which the regex
    row/cell patterns would drop entirely. Expected output identical to
    the well-formed html_table_scan oracle."""
    n = load_table(spark, sf_dir, "nation")
    # no </td>, no </tr> — recovery must infer both
    tr = F.format_string("<tr><td>%s<td>%s", F.col("n_name"), F.substring("n_name", 1, 3))
    pages = (
        n.groupBy("n_regionkey")
        .agg(F.concat_ws("", F.collect_list(tr)).alias("body"))
        .select(
            F.col("n_regionkey").alias("region_key"),
            F.concat(
                F.lit('<table class="wikitable"><tr><th>Company<th>Ticker'),
                F.col("body"),
                F.lit("</table>"),
            ).alias("html"),
        )
    )
    parsed = parse_html_tables_dom(pages)
    out = parsed.filter(F.size("cells") == 2).select(
        "region_key",
        F.element_at("cells", 1).alias("company"),
        F.element_at("cells", 2).alias("ticker"),
    )
    return out.filter(F.col("ticker").rlike("^[A-Z]{1,5}$")).orderBy("region_key", "company")


@_register(
    "html_dom_links",
    """
    SELECT doc_id,
           'https://ir.example.com/page-'
             || translate(CAST(doc_id AS VARCHAR), '0123456789', 'abcdefghij')
             || '.html'                            AS href,
           'Report ' || CAST(doc_id AS VARCHAR)    AS text,
           'Doc ' || CAST(doc_id AS VARCHAR)       AS title
    FROM documents
    ORDER BY doc_id
    """,
)
def html_dom_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F21 link extraction through the DOM: each synthetic page has one
    real anchor (text split across nested markup with an unclosed <b>)
    and one decorative icon anchor that class-pruning must drop —
    semantics regex extraction cannot express."""
    d = spread(load_table(spark, sf_dir, "documents"))
    safe_id = F.translate(F.col("doc_id").cast("string"), "0123456789", "abcdefghij")
    page = F.format_string(
        '<div><a href="https://ir.example.com/page-%s.html" title="Doc %s">'
        "<b>Report</b> <span>%s</span></a>"
        '<a class="pdf-icon" href="https://cdn.example.com/icon.svg">decoration</a>'
        "</div>",
        safe_id,
        F.col("doc_id").cast("string"),
        F.col("doc_id").cast("string"),
    )
    links = d.select("doc_id", F.explode(dom_links_udf(page)).alias("l"))
    return links.select(
        "doc_id",
        F.col("l.href").alias("href"),
        F.col("l.text").alias("text"),
        F.col("l.title").alias("title"),
    ).orderBy("doc_id")


@_register(
    "html_dom_clean",
    """
    SELECT doc_id,
           trim(regexp_replace(text, '\\s+', ' ', 'g')) AS clean_text
    FROM documents
    ORDER BY doc_id
    """,
)
def html_dom_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 through the DOM: noisy wrapper with script/style/svg blocks,
    a decorative-class subtree (class pruning — beyond the regex
    chain's power), and an unclosed <p>. Clean text must equal the
    original document text."""
    d = spread(load_table(spark, sf_dir, "documents"))
    noisy = F.concat(
        F.lit('<div class="doc"><script>var x = "<p>not text</p>";</script>'),
        F.lit('<style>.a{content:"</div>"}</style><svg><path d="M0"/></svg>'),
        F.lit('<div class="bg-gradient-layer">decorative junk</div><p>'),
        F.col("text"),
        F.lit("</div>"),  # <p> left unclosed
    )
    return d.select("doc_id", dom_text_udf(noisy).alias("clean_text")).orderBy("doc_id")
