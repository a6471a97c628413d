"""PySpark Python DataSource connector for the reference's key-value
text record format (`key='value'` fields, one record per line — the
serialization in reference src/orchestrator.py:77-81, re-parsed there
with per-line regexes at :111-125).

`sources/kv_text.py` already expresses the scan declaratively
(spark.read.text + regexp_extract); this module promotes the format to
a FIRST-CLASS connector — ``spark.read.format("kvlinks")`` /
``df.write.format("kvlinks")`` — using the PySpark 4 Python DataSource
API, with the two properties a real connector owes the engine:

* **Byte-range split planning.** `partitions()` carves every input
  file into ~`split_size`-byte `InputPartition`s using the standard
  Hadoop text-split contract (a record belongs to the split containing
  its first byte; a reader seeks to start-1 and discards the partial
  line, then reads past `end` to finish its last record). A single
  100 GB links file therefore scans with full cluster parallelism —
  the regex path would get whatever splits spark.read.text chooses,
  this one makes the contract explicit and testable.
* **Typed projection at the source.** The user-supplied schema drives
  both the key set that is parsed and the Python-side casts, so
  unreferenced keys are never materialized (column pruning inside the
  reader).

The writer mirrors the task-commit shape: each task writes
`part-<pid>-<uuid>` under the destination and reports it in its commit
message; `commit()` stamps `_SUCCESS`, `abort()` deletes the reported
files — idempotent under task retry because a retried task gets a
fresh uuid and only files named in SUCCESSFUL commit messages count.
"""

from __future__ import annotations

import os
import re
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from automated_dow30_earnings_reports_spark.schemas import DOCUMENT_LINKS

# Schema field -> serialized key (matches sources/kv_text.py).
FIELD_TO_KEY = {"href": "url", "link_type": "type"}

DEFAULT_SPLIT = 1 << 20  # 1 MiB


class KVSplit(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class _Commit(WriterCommitMessage):
    def __init__(self, file: str):
        self.file = file


def _input_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith(("_", ".")) and os.path.isfile(os.path.join(path, f))
        )
    return [path]


def _caster(dt: str):
    if dt in ("bigint", "int", "integer", "long", "smallint", "tinyint"):
        return lambda s: int(s) if s else None
    if dt in ("double", "float"):
        return lambda s: float(s) if s else None
    if dt == "boolean":
        return lambda s: s.lower() == "true" if s else None
    return lambda s: s if s else None


class KVLinksReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kvlinks: 'path' option is required")
        self.split_size = int(options.get("split_size", DEFAULT_SPLIT))
        # one compiled pattern + caster per projected column
        self._fields = [
            (
                re.compile(
                    r"(?:^|\s)%s='([^']*)'" % re.escape(FIELD_TO_KEY.get(f.name, f.name))
                ),
                _caster(f.dataType.simpleString()),
            )
            for f in schema.fields
        ]

    def partitions(self) -> list[KVSplit]:
        out = []
        for p in _input_files(self.path):
            size = os.path.getsize(p)
            if size == 0:
                continue
            start = 0
            while start < size:
                out.append(KVSplit(p, start, min(start + self.split_size, size)))
                start += self.split_size
        # zero-file scan still needs one (empty) partition
        return out or [KVSplit("", 0, 0)]

    def read(self, partition: KVSplit) -> Iterator[tuple]:
        if not partition.path:
            return
        with open(partition.path, "rb") as f:
            if partition.start > 0:
                # Hadoop text-split contract: the record containing byte
                # start-1 belongs to the previous split — consume its tail.
                f.seek(partition.start - 1)
                f.readline()
            while True:
                pos = f.tell()
                if pos >= partition.end:
                    break
                raw = f.readline()
                if not raw:
                    break
                line = raw.decode("utf-8", errors="replace").rstrip("\n")
                yield tuple(
                    cast(m.group(1)) if (m := pat.search(line)) else None
                    for pat, cast in self._fields
                )


class KVLinksWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kvlinks: 'path' option is required")
        self._keys = [FIELD_TO_KEY.get(f.name, f.name) for f in schema.fields]
        self._float_cols = {
            i
            for i, f in enumerate(schema.fields)
            if f.dataType.simpleString() in ("double", "float")
        }

    def _fmt(self, i: int, v) -> str:
        if v is None:
            return ""
        if i in self._float_cols:
            return f"{v:.2f}"
        return str(v)

    def write(self, iterator: Iterator) -> _Commit:
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex[:12]}.txt"
        tmp = os.path.join(self.path, f".{name}.inprogress")
        final = os.path.join(self.path, name)
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(
                    " ".join(
                        f"{k}='{self._fmt(i, row[i])}'"
                        for i, k in enumerate(self._keys)
                    )
                    + "\n"
                )
        os.rename(tmp, final)  # atomic publish; retries use a fresh uuid
        return _Commit(final)

    def commit(self, messages) -> None:
        with open(os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8") as f:
            f.write("\n".join(os.path.basename(m.file) for m in messages if m))

    def abort(self, messages) -> None:
        for m in messages:
            if m and os.path.exists(m.file):
                os.remove(m.file)


class KVLinksDataSource(DataSource):
    """format("kvlinks"): reader/writer for key='value' record lines.

    Default schema is the reference's DocumentLink record; pass
    .schema(...) to project/cast other key sets."""

    @classmethod
    def name(cls) -> str:
        return "kvlinks"

    def schema(self) -> StructType:
        return DOCUMENT_LINKS

    def reader(self, schema: StructType) -> KVLinksReader:
        return KVLinksReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> KVLinksWriter:
        return KVLinksWriter(schema, self.options)


def register(spark) -> None:
    """Idempotently register the connector on this session."""
    try:
        spark.dataSource.register(KVLinksDataSource)
    except Exception:
        pass  # already registered


# ---------------------------------------------------------------------------
# Oracled round-trip query: customer-derived records → custom writer →
# custom reader (64 KiB splits, so even this small file exercises the
# split-boundary path) → typed aggregate. The oracle recomputes the
# aggregate straight from the base table, so a parse slip, split-
# boundary duplicate/loss, or cast drift breaks the value hash.
# ---------------------------------------------------------------------------

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
    "kv_datasource",
)

_RT_SCHEMA = "name string, key bigint, bal double"


def kv_datasource_roundtrip(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from automated_dow30_earnings_reports_spark.tables import load_table

    register(spark)
    path = os.path.join(_SCRATCH, os.path.basename(sf_dir.rstrip("/")))
    if os.path.isdir(path):
        for f in os.listdir(path):
            os.remove(os.path.join(path, f))
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").alias("bal"),
    )
    c.write.format("kvlinks").option("path", path).mode("append").save()
    back = (
        spark.read.format("kvlinks")
        .schema(_RT_SCHEMA)
        .option("path", path)
        .option("split_size", 64 * 1024)
        .load()
    )
    return (
        back.groupBy()
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.count_distinct("key").cast("bigint").alias("n_keys"),
            F.sum(F.col("bal").cast("decimal(18,2)")).cast("double").alias("total_bal"),
            F.min("name").alias("first_name"),
        )
    )


QUERIES["kv_datasource_roundtrip"] = kv_datasource_roundtrip
ORACLES["kv_datasource_roundtrip"] = """
    SELECT CAST(COUNT(*) AS BIGINT)                 AS n_rows,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_keys,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
           MIN(c_name)                               AS first_name
    FROM customer
"""
