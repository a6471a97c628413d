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
* **Filter pushdown.** `pushFilters()` accepts the comparison /
  null-test / IN / string-match conjuncts on scanned columns and
  evaluates them inside `read()` right after parsing — rows die in the
  Python worker before they are ever serialized across the Arrow
  boundary, and Spark is told those conjuncts are fully handled so it
  plans no residual filter. (Null comparison semantics match SQL:
  any comparison against a missing key is False.) Requires
  `spark.sql.python.filterPushdown.enabled` (register() sets it).

  Engine sharp edge (observed on Spark 4.1.2, verified with fresh-
  reader-per-planning traces): the JVM memoizes the first planning's
  partitions+read-function on the shared relation object, so a query
  WITHOUT pushable filters planned against the SAME `.load()` result
  that an earlier filtered query used can reuse the earlier read
  function — stale filters included. Plan a fresh `.load()` per query
  (cheap — metadata only) when mixing filtered and unfiltered reads;
  every planning that pushes filters always gets a fresh, correct
  reader.

A `SimpleDataSourceStreamReader` makes the same directory a STREAMING
source: each micro-batch ingests the not-yet-seen files (offset = the
explicit ingested-name set, so arbitrary file names are safe), giving
an exactly-once landing-directory tail under checkpoint/replay —
`readBetweenOffsets` re-reads any committed range deterministically.

The writer maintains a `_SUCCESS` manifest naming exactly the files of
successfully committed jobs (merged on append, replaced — with stale
file deletion — on overwrite); the batch reader treats the manifest as
the source of truth when present, so part files orphaned by a task
retry whose commit message never landed are invisible to readers.

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
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    StringContains,
    StringEndsWith,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from automated_dow30_earnings_reports_spark.schemas import DOCUMENT_LINKS
from automated_dow30_earnings_reports_spark.sources.kv_text import (
    _FIELD_TO_KEY as FIELD_TO_KEY,  # single source of truth for the format
)

DEFAULT_SPLIT = 1 << 20  # 1 MiB

_SUCCESS_FILE = "_SUCCESS"
_PART_RE = re.compile(r"^part-[0-9a-f]{12}\.txt$")  # this writer's files


class KVSplit(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class _Commit(WriterCommitMessage):
    def __init__(self, file: str):
        self.file = file


def _input_files(path: str) -> list[str]:
    """Committed input files. When a `_SUCCESS` manifest exists (this
    module's writer maintains one), ONLY files it names count — an
    orphan from a task attempt that renamed its part file but whose
    commit message never reached the driver is invisible to readers,
    which is what makes the task-retry story exactly-once end to end.
    Directories without a manifest (foreign producers) fall back to a
    full listing."""
    if os.path.isdir(path):
        manifest = os.path.join(path, _SUCCESS_FILE)
        if os.path.exists(manifest):
            with open(manifest, encoding="utf-8") as fh:
                names = [ln.strip() for ln in fh if ln.strip()]
            return sorted(
                os.path.join(path, n)
                for n in names
                if os.path.isfile(os.path.join(path, n))
            )
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith(("_", ".")) and os.path.isfile(os.path.join(path, f))
        )
    return [path]


def _caster(dt: str):
    """Typed parse of a captured value. The format collapses NULL and
    the empty string into one representation (both serialize as
    key='' — the reference's regex reparse, orchestrator.py:111-125,
    is equally blind) and the reader resolves that value to NULL; a
    consumer that must distinguish them needs a different format.
    Unsupported column types fail HERE at plan time with a clear
    message — silently parsing a decimal/date column as a raw string
    used to surface as an opaque Arrow conversion error at collect."""
    if dt in ("bigint", "int", "integer", "long", "smallint", "tinyint"):
        return lambda s: int(s) if s else None
    if dt in ("double", "float"):
        return lambda s: float(s) if s else None
    if dt == "boolean":
        return lambda s: s.lower() == "true" if s else None
    if dt.startswith("decimal"):
        from decimal import Decimal

        return lambda s: Decimal(s) if s else None
    if dt == "date":
        import datetime

        return lambda s: datetime.date.fromisoformat(s) if s else None
    if dt in ("timestamp", "timestamp_ntz"):
        import datetime

        return lambda s: datetime.datetime.fromisoformat(s) if s else None
    if dt in ("string", "varchar"):
        return lambda s: s if s else None
    raise ValueError(
        f"kvlinks: unsupported column type {dt!r} — the key='value' text "
        "format carries scalars only"
    )


_PUSHABLE = (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    LessThan,
    LessThanOrEqual,
    IsNotNull,
    IsNull,
    In,
    StringStartsWith,
    StringEndsWith,
    StringContains,
)


def _filter_hit(flt, v) -> bool:
    """SQL three-valued semantics collapsed to keep/drop: a comparison
    against NULL never keeps the row (IsNull being the one null-seeker)."""
    if isinstance(flt, IsNull):
        return v is None
    if v is None:
        return False
    if isinstance(flt, IsNotNull):
        return True
    if isinstance(flt, EqualTo):
        return v == flt.value
    if isinstance(flt, GreaterThan):
        return v > flt.value
    if isinstance(flt, GreaterThanOrEqual):
        return v >= flt.value
    if isinstance(flt, LessThan):
        return v < flt.value
    if isinstance(flt, LessThanOrEqual):
        return v <= flt.value
    if isinstance(flt, In):
        return v in flt.value
    if isinstance(flt, StringStartsWith):
        return isinstance(v, str) and v.startswith(flt.value)
    if isinstance(flt, StringEndsWith):
        return isinstance(v, str) and v.endswith(flt.value)
    if isinstance(flt, StringContains):
        return isinstance(v, str) and flt.value in v
    return False


class KVLinksReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kvlinks: 'path' option is required")
        self.split_size = int(options.get("split_size", DEFAULT_SPLIT))
        self.pushed: list = []  # (col_index, Filter), set by pushFilters
        self._colidx = {f.name: i for i, f in enumerate(schema.fields)}
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

    def pushFilters(self, filters):
        """Accept single-column conjuncts we can evaluate post-parse;
        anything else stays with Spark. Accepted filters are FULLY
        handled (no residual), so evaluation must be exact — see
        _filter_hit's null semantics."""
        self.pushed = []  # re-planned from scratch: the engine may reuse
        # this reader instance across plannings of the same relation
        for flt in filters:
            attr = getattr(flt, "attribute", None)
            if (
                isinstance(flt, _PUSHABLE)
                and attr is not None
                and len(attr) == 1
                and attr[0] in self._colidx
            ):
                self.pushed.append((self._colidx[attr[0]], flt))
            else:
                yield flt

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
                row = tuple(
                    cast(m.group(1)) if (m := pat.search(line)) else None
                    for pat, cast in self._fields
                )
                if all(_filter_hit(flt, row[i]) for i, flt in self.pushed):
                    yield row


class KVLinksWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict, overwrite: bool = False):
        self.path = options.get("path")
        self.overwrite = overwrite
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
            # repr = shortest string that round-trips the exact double
            # (a fixed %.2f would silently corrupt 0.125 -> '0.12')
            return repr(float(v))
        s = str(v)
        if "'" in s or "\n" in s or "\r" in s:
            # The key='value' format cannot represent these: the reader
            # regex '([^']*)' would truncate at the quote and a newline
            # would split one record into two. Fail the task loudly
            # instead of publishing corrupt data.
            raise ValueError(
                f"kvlinks writer: value for {self._keys[i]!r} contains a "
                f"quote or newline and cannot round-trip: {s!r}"
            )
        return s

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
        """Job commit: maintain the `_SUCCESS` manifest that
        `_input_files` treats as the source of truth.

        Append mode manifests the union of this job's files, the prior
        manifest, and every FOREIGN data file in the directory (names
        not matching this writer's `part-*` pattern) — so files a
        non-kvlinks producer landed, readable before this commit via
        the no-manifest fallback, stay readable after it. Our own
        part-pattern files are admitted ONLY via a commit message or a
        prior manifest: a part file orphaned by a task retry whose
        commit message never reached the driver stays fenced off
        forever — the exactly-once half of the contract. (The corollary:
        concurrent append JOBS on one path need external coordination,
        as on any directory sink without a transaction log — the
        manifest read-modify-write is job-atomic, not cross-job.)

        Overwrite mode REPLACES the manifest with this job's files and
        deletes every other pre-existing data file, foreign included —
        DataFrameWriter overwrite semantics. Readers flip atomically
        from the old file set to the new one at the manifest rename."""
        manifest = os.path.join(self.path, _SUCCESS_FILE)
        new = sorted(os.path.basename(m.file) for m in messages if m)
        old: list[str] = []
        if os.path.exists(manifest):
            with open(manifest, encoding="utf-8") as fh:
                old = [ln.strip() for ln in fh if ln.strip()]
        listing = [
            f
            for f in os.listdir(self.path)
            if not f.startswith(("_", ".")) and os.path.isfile(os.path.join(self.path, f))
        ]
        foreign = [f for f in listing if not _PART_RE.match(f)]
        if self.overwrite:
            final = new
            stale = [n for n in set(old) | set(listing) if n not in set(new)]
        else:
            final = sorted(set(old) | set(foreign) | set(new))
            stale = []
        tmp = manifest + ".inprogress"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(final))
        os.rename(tmp, manifest)
        for n in stale:
            p = os.path.join(self.path, n)
            if os.path.exists(p):
                os.remove(p)

    def abort(self, messages) -> None:
        for m in messages:
            if m and os.path.exists(m.file):
                os.remove(m.file)


class KVLinksStreamReader(SimpleDataSourceStreamReader):
    """Streaming tail of a kv-links landing directory. The offset is
    the EXPLICIT set of ingested file names (comma-joined, sorted) —
    not a count-prefix of the sorted listing, which would both skip
    and double-read whenever a late file sorts before an already-
    committed one (uuid part names, multi-writer clock skew). With the
    name-set offset, any atomically-published immutable file is
    ingested exactly once regardless of its name. A batch reads
    `listing - seen`; `readBetweenOffsets` replays `end - start`
    deterministically for recovery. The offset grows with the number
    of files — fine for a landing directory; a production source
    compacts it into a checkpointed seen-files log exactly as Spark's
    own FileStreamSource does."""

    def __init__(self, schema: StructType, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kvlinks: 'path' option is required")
        self._batch = KVLinksReader(schema, {"path": self.path})

    def _files(self) -> list[str]:
        if not os.path.isdir(self.path):
            return []
        return _input_files(self.path)

    def _seen(self, offset: dict) -> set:
        if "n_files" in offset and "seen" not in offset:
            # migration shim for checkpoints written by the earlier
            # sorted-count-prefix offset scheme: that scheme had
            # ingested every file PRESENT when the offset was written,
            # so the committed set is the n ARRIVAL-oldest files —
            # (mtime, name) order, not name order. Reconstructing from
            # the name-sorted CURRENT listing was wrong as soon as a
            # newly-arrived file sorted lexicographically before a
            # committed one: the newcomer was marked seen (skipped
            # forever) and the committed tail file replayed as fresh.
            # Residual assumption, stated honestly: mtimes must reflect
            # arrival (coarse-granularity filesystems or an
            # mtime-preserving copy into the landing dir can still fool
            # the shim) — the migration is best-effort by nature; the
            # CURRENT offset scheme (explicit name set) has no such
            # ambiguity, which is why it replaced this one.
            n = offset["n_files"]
            # A file deleted between the listing and the stat must not
            # abort the migration on a TRANSIENT race: re-list once and
            # retry (the vanished file drops out of the fresh listing).
            # A placeholder mtime instead (±inf) would silently corrupt
            # the reconstruction: +inf pulls an uncommitted file into
            # the committed prefix when the vanished file WAS committed
            # (its rows are then skipped forever), -inf replays a
            # committed file when it was NOT. If the stat still fails
            # on the fresh listing, fail loudly — same contract as
            # readBetweenOffsets on a vanished committed file.
            for attempt in (0, 1):
                try:
                    by_arrival = sorted(
                        self._files(), key=lambda p: (os.path.getmtime(p), p)
                    )
                    break
                except OSError:
                    if attempt:
                        raise
            return {os.path.basename(p) for p in by_arrival[:n]}
        # a JSON list, NOT a joined string: file names may contain any
        # character including the would-be delimiter
        return set(offset.get("seen", []))

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _rows_of(self, files: list[str]):
        # a LIST ITERATOR, not a bare list or generator: the engine's
        # prefetch cache calls next() on empty batches (list has no
        # __next__) and pickles cached batches (generators don't pickle)
        out: list[tuple] = []
        for p in sorted(files):
            size = os.path.getsize(p)
            if size:
                out.extend(self._batch.read(KVSplit(p, 0, size)))
        return iter(out)

    def read(self, start: dict):
        seen = self._seen(start)
        fresh = [p for p in self._files() if os.path.basename(p) not in seen]
        new_seen = sorted(seen | {os.path.basename(p) for p in fresh})
        return self._rows_of(fresh), {"seen": new_seen}

    def readBetweenOffsets(self, start: dict, end: dict):
        replay = self._seen(end) - self._seen(start)
        missing = [
            n for n in replay if not os.path.isfile(os.path.join(self.path, n))
        ]
        if missing:
            # a committed batch's file vanished (external cleanup, or an
            # overwrite into a streamed directory): silently returning
            # fewer rows would corrupt recovery — fail loudly instead
            raise FileNotFoundError(
                f"kvlinks stream replay: committed input file(s) missing "
                f"from {self.path}: {sorted(missing)}"
            )
        return self._rows_of([os.path.join(self.path, n) for n in sorted(replay)])

    def commit(self, end: dict) -> None:
        pass  # files are immutable once published; nothing to release


class KVLinksDataSource(DataSource):
    """format("kvlinks"): batch reader (split-planned, filter-pushing),
    streaming reader (landing-directory tail), and task-commit writer
    for key='value' record lines.

    Default schema is the reference's DocumentLink record; pass
    .schema(...) to project/cast other key sets."""

    @classmethod
    def name(cls) -> str:
        return "kvlinks"

    def schema(self) -> StructType:
        return DOCUMENT_LINKS

    def reader(self, schema: StructType) -> KVLinksReader:
        return KVLinksReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> KVLinksStreamReader:
        return KVLinksStreamReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> KVLinksWriter:
        return KVLinksWriter(schema, self.options, overwrite)


def register(spark) -> None:
    """Idempotently register the connector on this session (and enable
    Python-source filter pushdown, off by default in Spark 4.1)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    # Spark 4.1 re-registration replaces the prior entry with a WARN
    # (verified: no exception). Other Spark minors raise on duplicate
    # registration, so tolerate exactly that error — idempotence is
    # this function's contract — while every other failure still
    # propagates with its root cause.
    try:
        spark.dataSource.register(KVLinksDataSource)
    except Exception as exc:  # noqa: BLE001 — filtered re-raise below
        msg = str(exc).lower()
        if not ("already" in msg and ("regist" in msg or "exist" in msg)):
            raise


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
