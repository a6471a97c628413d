"""Round-10 OPTIMIZATION pins: the shared-tokenize / shared-shingle
slice pattern.

The lifecycle verbs used to derive each generation's working set with
its own corpus pass (`_shingle_hashes_of(docs.where(pred))`,
`_write_text_index(d.where(pred), ...)`). The r10 optimization runs THE
one corpus pass and slices the cached result per generation. These
tests pin the equivalence that makes that rewrite safe — filtering on
the grouping key commutes with the per-doc derivation — at the exact
seams the queries now rely on:

- dedup: `_shingle_hashes_of(docs).where(pred)` row-multiset-equals
  `_shingle_hashes_of(docs.where(pred))`;
- text: `_write_text_index_tokd(tokd.where(pred), ...)` writes tables
  bit-identical (as row multisets) to `_write_text_index(d.where(pred),
  ...)` for every one of the three tables, overwrite and append modes.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_shingle_slice_commutes_with_filter(spark):
    from automated_dow30_earnings_reports_spark.operators.dedup import (
        _shingle_hashes_of,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table, spread

    docs = spread(load_table(spark, SF, "documents")).select("doc_id", "text")
    pred = F.col("doc_id") % 5 == 4
    per_slice = _shingle_hashes_of(docs.where(pred))
    sliced = _shingle_hashes_of(docs).where(pred)
    assert _rows(per_slice, ["doc_id", "h"]) == _rows(sliced, ["doc_id", "h"])
    # and the complement, so the two slices tile the corpus
    per_slice_c = _shingle_hashes_of(docs.where(~pred))
    sliced_c = _shingle_hashes_of(docs).where(~pred)
    assert _rows(per_slice_c, ["doc_id", "h"]) == _rows(sliced_c, ["doc_id", "h"])


def test_tokd_sliced_writes_equal_per_slice_writes(spark, tmp_path):
    from automated_dow30_earnings_reports_spark.operators.textstats import (
        _tokenized_docs,
        _write_text_index,
        _write_text_index_tokd,
    )
    from automated_dow30_earnings_reports_spark.tables import load_table, spread

    d = spread(load_table(spark, SF, "documents"))
    pred = F.col("doc_id") % 5 == 0

    old_path = os.path.join(str(tmp_path), "per_slice")
    new_path = os.path.join(str(tmp_path), "sliced")

    # reference: the pre-r10 shape — one tokenize pass per generation
    _write_text_index(d.where(~pred), old_path, "overwrite")
    _write_text_index(d.where(pred), old_path, "append")

    # r10 shape: one tokenize pass, cached, sliced per generation
    tokd = _tokenized_docs(d).persist()
    try:
        _write_text_index_tokd(tokd.where(~pred), new_path, "overwrite")
        _write_text_index_tokd(tokd.where(pred), new_path, "append")
    finally:
        tokd.unpersist()

    for table, cols in (
        ("docstats", ["doc_id", "dl"]),
        ("stats", ["n_docs", "sum_dl"]),
        ("postings", ["term", "doc_id", "tf", "bucket"]),
    ):
        a = spark.read.parquet(os.path.join(old_path, table))
        b = spark.read.parquet(os.path.join(new_path, table))
        assert _rows(a, cols) == _rows(b, cols), table
