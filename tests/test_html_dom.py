"""DOM parser fidelity (sources/html_dom.py): the malformed-HTML shapes
that regex parsing gets wrong, pinned against BeautifulSoup-equivalent
expectations (reference enhanced_selenium_scraper.py:573-632 semantics).

Pure-Python tests — no SparkSession needed for the parser itself; one
Spark test exercises the pandas_udf plumbing end-to-end.
"""

from __future__ import annotations

from automated_dow30_earnings_reports_spark.sources.html_dom import (
    dom_links,
    dom_table_rows,
    dom_text,
)


def test_unclosed_td_tr_recovery():
    h = "<table><tr><td>a<td>b<tr><td>c<td>d</table>"
    assert dom_table_rows(h) == [["a", "b"], ["c", "d"]]


def test_nested_table_rows_not_flattened():
    h = "<table><tr><td>outer<table><tr><td>inner</td></tr></table></td></tr></table>"
    # outer cell text excludes the nested table; nested rows stand alone
    assert dom_table_rows(h) == [["outer"], ["inner"]]


def test_th_and_td_mixed():
    h = "<table><tr><th>H1<th>H2<tr><td>v1<td>v2</table>"
    assert dom_table_rows(h) == [["H1", "H2"], ["v1", "v2"]]


def test_script_style_cdata_ignores_fake_tags():
    h = (
        '<div><script>var x = "<p>fake</p>";</script>'
        '<style>.c{content:"</div>"}</style>real</div>'
    )
    assert dom_text(h) == "real"


def test_decorative_class_pruned():
    h = '<div><span class="pdf-icon">junk</span><span class="Layer-2">junk</span>keep</div>'
    assert dom_text(h) == "keep"


def test_svg_img_removed():
    # adjacent text nodes concatenate with no separator once the svg is
    # decomposed — identical to BeautifulSoup get_text() (reference
    # enhanced_selenium_scraper.py:601)
    h = '<p>before<svg><text>svg text</text></svg><img src="x" alt="a">after</p>'
    assert dom_text(h) == "beforeafter"


def test_stray_end_tags_ignored():
    h = "</div></td><p>ok</p></table>"
    assert dom_text(h) == "ok"


def test_link_text_across_markup_with_unclosed_tags():
    h = '<a href="u" title="t"><b>Quarterly <i>Report</a>'
    assert dom_links(h) == [{"href": "u", "text": "Quarterly Report", "title": "t"}]


def test_links_inside_decorative_subtree_dropped():
    h = '<div class="icon-wrap"><a href="u1">x</a></div><a href="u2">y</a>'
    assert dom_links(h) == [{"href": "u2", "text": "y", "title": ""}]


def test_entity_refs_decoded():
    assert dom_text("<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"


def test_empty_and_none_safe():
    assert dom_text("") == ""
    assert dom_table_rows("") == []
    assert dom_links("no tags at all") == []


def test_regex_path_diverges_on_malformed_table():
    """Documents WHY the DOM path exists: the JVM-regex row pattern
    requires </tr> and silently drops every unclosed row."""
    import re

    h = "<table><tr><td>a<td>b<tr><td>c<td>d</table>"
    regex_rows = re.findall(r"(?s)<tr[^>]*>(.*?)</tr>", h)
    assert regex_rows == []  # regex finds nothing...
    assert dom_table_rows(h) == [["a", "b"], ["c", "d"]]  # ...DOM recovers all


def test_spark_udf_plumbing(spark):
    from pyspark.sql import functions as F

    from automated_dow30_earnings_reports_spark.sources.html_dom import (
        dom_links_udf,
        dom_table_rows_udf,
        dom_text_udf,
    )

    df = spark.createDataFrame(
        [("<table><tr><td>a<td>b</table>", '<a href="u">x</a>', "<p>t</p>")],
        ["t1", "t2", "t3"],
    )
    row = df.select(
        dom_table_rows_udf("t1").alias("rows"),
        dom_links_udf("t2").alias("links"),
        dom_text_udf("t3").alias("txt"),
    ).first()
    assert row.rows == [["a", "b"]]
    assert row.links[0].href == "u" and row.links[0].text == "x"
    assert row.txt == "t"
