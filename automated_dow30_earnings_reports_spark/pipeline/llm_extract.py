"""X1 — LLM structured extraction as a schema-validated UDTF stage.

The reference's centerpiece operator (src/extract_reports.py:75-157):
one (company, links-file text) input row → N pydantic ``Report`` rows
via an instructor/Gemini call, rate-limited by a cross-thread lock
file (:98-108). The Spark shape is a ``mapInPandas`` UDTF:

  - pre-stage projections do the pure parts declaratively:
    ``smart_truncate`` to 300k chars (F18, ref :15-35,:120) and
    size-based model selection (F19, ref :38-51) — Catalyst places
    both before the expensive stage, mirroring the reference's
    hand-rolled "truncate before LLM" optimization (SURVEY §4);
  - the extractor is injected; output rows are coerced to the declared
    REPORTS schema (instructor's pydantic contract becomes the
    mapInPandas output StructType) — rows the extractor cannot
    produce land in a dead-letter row (extract_error set), never a
    task failure;
  - rate limiting is a per-partition token bucket (``min_interval``
    seconds between calls within a partition). A cluster-global
    lock has no scalable distributed equivalent (SURVEY §7 hard (a));
    the honest contract is partitions × min_interval = fleet rate,
    controlled via ``num_partitions``.

The deterministic fake extractor mirrors what the reference's prompt
asks the LLM to do (find report documents with title/category/url/
year/quarter in the links text) with pure regexes, so the whole stage
is oracle-checkable in DuckDB.
"""

from __future__ import annotations

import re
import time
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from automated_dow30_earnings_reports_spark.schemas import REPORTS

from automated_dow30_earnings_reports_spark.functions.scalars import select_model, smart_truncate

# Extractor: (company, text, model) -> list of report dicts
# (keys title/category/url/year/quarter — pydantic Report, ref :68-73).
Extractor = Callable[[str, str, str], list[dict]]
ExtractorFactory = Callable[[], Extractor]

# The report fields COME FROM schemas.REPORTS (the reference's pydantic
# Report, src/extract_reports.py:68-73) so the two cannot drift; they
# are relaxed to nullable here because a dead-letter row nulls them all.
EXTRACTED_REPORTS_SCHEMA = StructType(
    [
        StructField("company", StringType(), False),
        StructField("model_used", StringType(), True),
    ]
    + [StructField(f.name, f.dataType, True) for f in REPORTS.fields]
    + [StructField("extract_error", StringType(), True)]
)

_REPORT_KEYS = ("title", "category", "url", "year", "quarter")


def llm_extract_stage(
    df: DataFrame,
    extractor_factory: ExtractorFactory,
    company_col: str = "company",
    text_col: str = "links_text",
    truncate_chars: int | None = 300_000,
    model_threshold: int = 200_000,
    min_interval: float = 0.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """(company, links_text) rows → exploded report rows (UDTF shape).

    Returns EXTRACTED_REPORTS_SCHEMA; extraction failures produce one
    dead-letter row per input with ``extract_error`` set.
    """
    prepared = df.select(
        F.col(company_col).alias("company"),
        (
            smart_truncate(F.col(text_col), truncate_chars)
            if truncate_chars is not None
            else F.col(text_col)
        ).alias("text"),
        select_model(F.col(text_col), model_threshold).alias("model_used"),
    )
    if num_partitions:
        prepared = prepared.repartition(num_partitions, "company")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        extractor = extractor_factory()  # one client per partition
        last_call = 0.0
        for pdf in batches:
            out: list[tuple] = []
            for company, text, model in zip(pdf["company"], pdf["text"], pdf["model_used"]):
                if min_interval > 0:  # partition-local token bucket
                    wait = last_call + min_interval - time.monotonic()
                    if wait > 0:
                        time.sleep(wait)
                    last_call = time.monotonic()
                # the record coercion lives INSIDE the dead-letter try:
                # a model returning year='FY2024' (int() raises) or a
                # non-dict item (r.get raises) is malformed OUTPUT, not
                # a task failure — the 'never a task failure' contract
                # covers the whole per-company unit of work
                try:
                    reports = extractor(company, text, model)
                    rows = []
                    for r in reports:
                        vals = [r.get(k) for k in _REPORT_KEYS]
                        vals[3] = int(vals[3]) if vals[3] is not None else None
                        vals[4] = int(vals[4]) if vals[4] is not None else None
                        rows.append((company, model, *vals, None))
                except Exception as exc:  # dead-letter channel
                    out.append(
                        (company, model, None, None, None, None, None,
                         f"{type(exc).__name__}: {exc}")
                    )
                    continue
                out.extend(rows)
            yield pd.DataFrame(out, columns=[f.name for f in EXTRACTED_REPORTS_SCHEMA.fields])

    return prepared.mapInPandas(run, schema=EXTRACTED_REPORTS_SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic fake extractor: the reference prompt's intent as regexes.
# Patterns match functions/scalars.py (_Y4/_Q) so the same semantics are
# expressible as the DuckDB oracle.
# ---------------------------------------------------------------------------

_URL_PDF = re.compile(r"url='([^']*\.pdf)'")
_TITLE = re.compile(r"title='([^']*)'")
_YEAR = re.compile(r"(19[0-9]{2}|20[0-9]{2})")
_QUARTER = re.compile(r"(?i)q\s*-?\s*([1-4])")


def fake_llm_extractor() -> Extractor:
    """ExtractorFactory: per-line regex extraction of PDF report records."""

    def extract(company: str, text: str, model: str) -> list[dict]:
        reports = []
        for line in text.split("\n"):
            m = _URL_PDF.search(line)
            if not m:
                continue
            url = m.group(1)
            t = _TITLE.search(line)
            y = _YEAR.search(url)
            q = _QUARTER.search(url)
            reports.append(
                {
                    "title": t.group(1) if t else None,
                    "category": "Earnings Release" if "earnings" in url.lower() else "Financial Document",
                    "url": url,
                    "year": int(y.group(1)) if y else None,
                    "quarter": int(q.group(1)) if q else None,
                }
            )
        return reports

    return extract


def failing_llm_extractor(fail_substring: str = "FAIL") -> Extractor:
    """ExtractorFactory for dead-letter tests."""
    inner = fake_llm_extractor()

    def extract(company: str, text: str, model: str) -> list[dict]:
        if fail_substring in company:
            raise RuntimeError(f"model refused for {company}")
        return inner(company, text, model)

    return extract
