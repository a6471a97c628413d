"""S9/S11 — rendered-page fetch as a pluggable Spark stage.

The reference renders pages with a Selenium Chrome subprocess
(src/enhanced_selenium_scraper.py:208-252) and probes document URLs
with HEAD/GET (:427-487). Here fetching is a ``mapInPandas`` stage:

  - the fetcher is constructed ONCE PER PARTITION (session/webdriver
    reuse — the Spark analog of the reference keeping one driver per
    company thread);
  - output schema is declared up front (input cols + http_status,
    content_type, html, fetch_error);
  - failures never kill the task: they land in the ``fetch_error``
    dead-letter column (ref retries :208-252 stay inside the fetcher).

Scale notes: fetch is embarrassingly parallel, so the stage first
``repartition(num_partitions)`` on the URL — at 1000 executors this
spreads politeness-limited hosts across the cluster and bounds the
per-task session count. No shuffle besides that single round-robin
exchange; everything downstream is narrow.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

# A Fetcher maps url -> (http_status, content_type, html_or_none, error_or_none).
Fetcher = Callable[[str], tuple[int, str, str | None, str | None]]
# Factory is invoked once per partition (session reuse).
FetcherFactory = Callable[[], Fetcher]

FETCH_RESULT_FIELDS = [
    StructField("http_status", IntegerType(), True),
    StructField("content_type", StringType(), True),
    StructField("html", StringType(), True),
    StructField("fetch_error", StringType(), True),
]


def fetch_stage(
    df: DataFrame,
    fetcher_factory: FetcherFactory,
    url_col: str = "url",
    num_partitions: int | None = None,
) -> DataFrame:
    """Fetch every row's ``url_col``; append FETCH_RESULT_FIELDS."""
    clash = {f.name for f in FETCH_RESULT_FIELDS} & set(df.columns)
    if clash:
        # duplicate field names would pass schema construction and fail
        # (or silently mispair columns) at the Arrow boundary — e.g.
        # re-fetching a prior fetch_stage output for a retry pass.
        # Select-away or rename the stale result columns first.
        raise ValueError(
            f"fetch_stage: input already has result column(s) {sorted(clash)}"
        )
    out_schema = StructType(list(df.schema.fields) + FETCH_RESULT_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetcher = fetcher_factory()  # one session per partition
        for pdf in batches:
            results = []
            for url in pdf[url_col]:
                try:
                    results.append(fetcher(url))
                except Exception as exc:  # dead-letter, never task-fail
                    results.append((0, "", None, f"{type(exc).__name__}: {exc}"))
            res = pd.DataFrame(
                results, columns=["http_status", "content_type", "html", "fetch_error"]
            )
            yield pd.concat([pdf.reset_index(drop=True), res], axis=1)

    source = df.repartition(num_partitions) if num_partitions else df
    return source.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# Deterministic fake fetcher — a synthetic IR site derived from the URL
# alone, so crawls are reproducible and assertable. Shape mirrors real IR
# pages: a few internal nav pages, per-quarter PDF links, one external link.
# ---------------------------------------------------------------------------


def _stable_int(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % mod


def fake_ir_site_fetcher() -> Fetcher:
    """FetcherFactory for tests: renders a deterministic HTML page per URL."""

    def fetch(url: str) -> tuple[int, str, str | None, str | None]:
        base = url.rstrip("/")
        n_docs = 2 + _stable_int(url + ":docs", 4)  # 2-5 quarterly PDFs
        n_pages = 1 + _stable_int(url + ":pages", 3)  # 1-3 internal pages
        anchors = []
        for i in range(n_docs):
            year = 2023 + _stable_int(f"{url}:y{i}", 3)
            quarter = 1 + _stable_int(f"{url}:q{i}", 4)
            anchors.append(
                f'<a href="{base}/files/Q{quarter}-{year}-earnings-{i}.pdf" '
                f'title="Q{quarter} {year} Earnings Release">Q{quarter} {year} PDF</a>'
            )
        for i in range(n_pages):
            anchors.append(
                f'<a href="{base}/quarterly-results-{i}" title="Quarterly Results {i}">'
                f"Quarterly Results and Earnings Webcast {i}</a>"
            )
        anchors.append('<a href="https://www.businesswire.com/news">News Release</a>')
        html = "<html><body>" + "\n".join(anchors) + "</body></html>"
        return (200, "text/html", html, None)

    return fetch


def failing_fetcher(fail_substring: str = "bad") -> Fetcher:
    """FetcherFactory for dead-letter tests: URLs containing the marker fail."""
    inner = fake_ir_site_fetcher()

    def fetch(url: str) -> tuple[int, str, str | None, str | None]:
        if fail_substring in url:
            raise ConnectionError(f"refused: {url}")
        return inner(url)

    return fetch
