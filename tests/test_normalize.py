"""Unicode-normalization parity: the Arrow-batched NFC/NFKC stage must
agree with DuckDB's nfc_normalize (UAX #15) and fold the classic
composed/decomposed confusables to one dedup key."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.functions.normalize import (
    nfc_fingerprint,
    nfc_normalize,
    nfkc_casefold,
)

# composed vs decomposed vs compatibility forms of the "same" text
CASES = [
    "café",                 # é composed
    "café",                # e + combining acute (decomposed)
    "ﬁle",                  # ﬁ ligature (NFKC folds to 'fi')
    "ＦＵＬＬ",  # fullwidth FULL
    "straße",               # ß (casefold -> ss)
    "STRASSE",
    "no-op ascii",
    "",
]


def test_nfc_matches_duckdb(spark):
    df = spark.createDataFrame([(s,) for s in CASES], ["s"])
    got = {
        r.s: r.n
        for r in df.select("s", nfc_normalize()(F.col("s")).alias("n")).collect()
    }
    con = duckdb.connect()
    for s in CASES:
        duck = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
        assert got[s] == duck, repr(s)


def test_composed_and_decomposed_share_fingerprint(spark):
    df = spark.createDataFrame([(s,) for s in CASES], ["s"])
    fp = {r.s: r.fp for r in df.select("s", nfc_fingerprint(F.col("s")).alias("fp")).collect()}
    assert fp["café"] == fp["café"]
    assert fp["café"] != fp["no-op ascii"]


def test_nfkc_casefold_folds_compat_forms(spark):
    df = spark.createDataFrame([(s,) for s in CASES], ["s"])
    out = {
        r.s: r.c
        for r in df.select("s", nfkc_casefold()(F.col("s")).alias("c")).collect()
    }
    assert out["ﬁle"] == "file"
    assert out["ＦＵＬＬ"] == "full"
    assert out["straße"] == out["STRASSE"] == "strasse"
