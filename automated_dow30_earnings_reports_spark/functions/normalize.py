"""Unicode normalization for text pipelines.

Spark has no NFC/NFKC builtin, so this is one of the few legitimately
Python-side scalar ops — Arrow-batched (pandas_udf), never
row-at-a-time. Web-scraped corpora mix composed and decomposed forms
(e.g. U+00E9 vs e + U+0301); exact dedup and shingling treat them as
different bytes unless normalized first, so a 100 TB dedup run puts
this map stage directly after the scan, before any hashing.

UDFs are built lazily (pandas_udf parses its DDL return type against
the active session), mirroring the MAD UDAF in operators/textstats.

Cross-engine parity: python unicodedata.normalize("NFC", s) agrees
with DuckDB's nfc_normalize() (both implement UAX #15); pinned in
tests/test_normalize.py over constructed composed/decomposed pairs.
"""

from __future__ import annotations

import unicodedata

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


def nfc_normalize():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return nfc


def nfkc_casefold():
    """The aggressive variant dedup canonicalization uses: NFKC (folds
    compatibility forms — ligatures, fullwidth, superscripts) then
    casefold. Matches the 'clean text before hashing' stage of public
    LLM-data pipelines."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfkc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize("NFKC", x).casefold()
            if x is not None
            else None
        )

    return nfkc


def nfc_fingerprint(text: Column) -> Column:
    """md5 of the NFC form — the normalization-stable exact-dedup key."""
    return F.md5(nfc_normalize()(text).cast("binary"))
