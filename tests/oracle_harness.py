"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side by side and compares
row-count, column names/dtypes, and an order-insensitive value frame.
Stricter than the driver is likely to be (exact string equality of
normalized cells) so that passing here implies passing there.
"""

from __future__ import annotations

import datetime as _dt
import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Queries pre-round their float outputs; this guards the last ulp.
        return f"{v:.6f}"
    if isinstance(v, (_dt.datetime, pd.Timestamp)):
        return pd.Timestamp(v).strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return repr(v)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        out[c] = out[c].map(_norm_cell)
    out = out.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return out


def compare(name: str, spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    spark_pdf = spark_df.toPandas()

    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"{name}: column names differ: spark={sorted(spark_pdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
        return problems

    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"{name}: row count {len(spark_pdf)} vs oracle {len(oracle_pdf)}")

    s_norm = normalize(spark_pdf)
    o_norm = normalize(oracle_pdf)
    if len(spark_pdf) == len(oracle_pdf) and not s_norm.equals(o_norm):
        diff_mask = (s_norm != o_norm).any(axis=1)
        idx = list(s_norm.index[diff_mask])[:5]
        for i in idx:
            problems.append(
                f"{name}: row {i} differs:\n  spark : {s_norm.loc[i].to_dict()}\n"
                f"  oracle: {o_norm.loc[i].to_dict()}"
            )
    return problems
