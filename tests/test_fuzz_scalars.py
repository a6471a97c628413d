"""Seeded fuzz parity: the JVM column expressions must agree with
plain-Python twins (re / urllib.parse.urljoin) over generated inputs.
One Spark job per function — all cases go through as a single batch."""

from __future__ import annotations

import random
import re
from urllib.parse import urljoin

from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.functions.scalars import (
    extract_quarter,
    extract_year,
    file_extension,
    resolve_url,
)

_WORDS = [
    "q", "Q1", "q2", "Q-3", "FY24", "fy 25", "2023", "2024", "1999", "20245",
    "report", "earnings", "3Q24", "4q99", "Q5", "fy-07", "1899", "2100",
    "supplemental", "10-K", "Q", "2019Q4", "", "x",
]


def _gen_strings(n=300, seed=7):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randint(1, 6)
        sep = rng.choice([" ", "-", "_", "/", "+"])
        out.append(sep.join(rng.choice(_WORDS) for _ in range(k)))
    return out


# Python twins of the _Y4/_FY2/_QY2/_Q patterns in scalars.py
_Y4 = re.compile(r"(19[0-9]{2}|20[0-9]{2})")
_FY2 = re.compile(r"(?i)fy\s*-?\s*([0-9]{2})")
_QY2 = re.compile(r"(?i)([1-4])q([0-9]{2})")
_Q = re.compile(r"(?i)q\s*-?\s*([1-4])")


def _century(y2: int) -> int:
    return y2 + (1900 if y2 >= 70 else 2000)


def _py_year(s: str):
    m = _Y4.search(s)
    if m:
        return int(m.group(1))
    m = _FY2.search(s)
    if m:
        return _century(int(m.group(1)))
    m = _QY2.search(s)
    if m:
        return _century(int(m.group(2)))
    return None


def _py_quarter(s: str):
    m = _QY2.search(s)
    if m:
        return int(m.group(1))
    m = _Q.search(s)
    if m:
        return int(m.group(1))
    return None


def test_year_quarter_fuzz(spark):
    cases = _gen_strings()
    df = spark.createDataFrame([(s,) for s in cases], ["s"])
    got = {
        r.s: (r.year, r.quarter)
        for r in df.select(
            "s", extract_year(F.col("s")).alias("year"), extract_quarter(F.col("s")).alias("quarter")
        ).collect()
    }
    for s in cases:
        assert got[s] == (_py_year(s), _py_quarter(s)), repr(s)


_EXT = re.compile(r"\.([A-Za-z0-9]{1,5})(?:[?#].*)?$")


def _py_ext(href: str) -> str:
    m = _EXT.search(href)
    return m.group(1).lower() if m else ""


def test_file_extension_fuzz(spark):
    rng = random.Random(11)
    exts = ["pdf", "DOCX", "x", "toolong7", "htm", "", "p?d"]
    cases = []
    for _ in range(200):
        base = "https://h.example.com/" + "/".join(
            rng.choice(["a", "b.c", "dir", "Q1-2024"]) for _ in range(rng.randint(0, 3))
        )
        e = rng.choice(exts)
        suffix = rng.choice(["", "?q=1", "#frag", "?a=b#c"])
        cases.append(base + ("." + e if e else "") + suffix)
    df = spark.createDataFrame([(s,) for s in cases], ["href"])
    got = {r.href: r.file_extension for r in df.select("href", file_extension("href")).collect()}
    for s in cases:
        assert got[s] == _py_ext(s), repr(s)


def test_resolve_url_matches_urljoin(spark):
    bases = [
        "https://ir.example.com/investors",
        "https://ir.example.com/investors/",
        "https://ir.example.com/a/b/c.html",
        "http://x.com/a/b?q=1",
        "https://x.com",
    ]
    hrefs = [
        "https://other.com/doc.pdf",
        "//cdn.example.com/f.pdf",
        "/files/Q1.pdf",
        "files/Q1.pdf",
        "../up.pdf",
        "#section",
        "?page=2",
        "mailto:ir@example.com",
        "javascript:void(0)",
        "tel:+1-555-0100",
        "doc.pdf?dl=1",
    ]
    cases = [(b, h) for b in bases for h in hrefs]
    df = spark.createDataFrame(cases, ["base", "href"])
    got = {
        (r.base, r.href): r.resolved_url
        for r in df.select("base", "href", resolve_url(F.col("base"), F.col("href"))).collect()
    }
    mismatches = []
    for b, h in cases:
        expected = urljoin(b, h)
        if h == "../up.pdf":
            # known divergence: we don't normalize dot-segments (the
            # crawl treats ../ links as same-directory-prefixed URLs);
            # urljoin collapses them.
            continue
        if got[(b, h)] != expected:
            mismatches.append((b, h, got[(b, h)], expected))
    assert not mismatches, mismatches


def test_levenshtein_parity_with_python(spark):
    """fuzzy_match_blocked leans on F.levenshtein == DuckDB
    levenshtein; pin both against a plain-Python DP twin."""
    import duckdb

    rng = random.Random(11)
    alphabet = "abcde "
    cases = []
    for _ in range(150):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        cases.append((a, b))

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    df = spark.createDataFrame(cases, ["a", "b"])
    got = {
        (r.a, r.b): r.d
        for r in df.select("a", "b", F.levenshtein("a", "b").alias("d")).collect()
    }
    con = duckdb.connect()
    for a, b in cases:
        expected = lev(a, b)
        assert got[(a, b)] == expected, (a, b)
        duck = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert duck == expected, (a, b)
