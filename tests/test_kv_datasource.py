"""Python DataSource connector (sources/kv_datasource.py): byte-range
split contract, schema-driven projection/casts, writer commit shape,
and parity with the declarative regex scan."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.sources.kv_datasource import (
    KVLinksReader,
    KVSplit,
    register,
)


@pytest.fixture()
def kv_file(tmp_path):
    p = tmp_path / "links.txt"
    lines = [
        f"name='rec{i:03d}' key='{i}' bal='{i * 1.5:.2f}'" for i in range(200)
    ]
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(p)


def _read_all(spark, path, split_size):
    return (
        spark.read.format("kvlinks")
        .schema("name string, key bigint, bal double")
        .option("path", path)
        .option("split_size", split_size)
        .load()
    )


def test_split_sizes_agree(spark, kv_file):
    """Every split size must parse each record exactly once — the
    Hadoop text-split contract (records straddling split boundaries
    read by exactly the split owning their first byte)."""
    register(spark)
    want = None
    for split in (37, 256, 1 << 20):  # pathological, small, whole-file
        got = sorted(
            (r.name, r.key, r.bal) for r in _read_all(spark, kv_file, split).collect()
        )
        assert len(got) == 200
        if want is None:
            want = got
        assert got == want


def test_partition_planning(kv_file):
    """partitions() covers the byte range exactly, no gaps/overlap."""
    rdr = KVLinksReader.__new__(KVLinksReader)
    rdr.path = kv_file
    rdr.split_size = 100
    parts = KVLinksReader.partitions(rdr)
    size = os.path.getsize(kv_file)
    assert parts[0].start == 0 and parts[-1].end == size
    for a, b in zip(parts, parts[1:]):
        assert a.end == b.start


def test_missing_keys_are_null(spark, tmp_path):
    p = tmp_path / "sparse.txt"
    p.write_text("name='only-name'\nkey='7' bal='2.50'\n", encoding="utf-8")
    register(spark)
    rows = {r.name: r for r in _read_all(spark, str(p), 1 << 20).collect()}
    assert rows["only-name"].key is None and rows["only-name"].bal is None
    assert rows[None].key == 7 and rows[None].bal == 2.5


def test_writer_roundtrip_and_success_marker(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "out")
    df = spark.createDataFrame(
        [("a", 1, 1.25), ("b", 2, None)], "name string, key bigint, bal double"
    )
    df.write.format("kvlinks").option("path", out).mode("append").save()
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    back = _read_all(spark, out, 1 << 20).collect()
    got = sorted((r.name, r.key, r.bal) for r in back)
    assert got == [("a", 1, 1.25), ("b", 2, None)]
    # no in-progress temp files left behind
    assert not [f for f in os.listdir(out) if f.endswith(".inprogress")]


def test_parity_with_regex_scan(spark, tmp_path):
    """Connector output matches sources/kv_text.read_document_links on
    reference-format DocumentLink lines (default schema)."""
    from automated_dow30_earnings_reports_spark.sources.kv_text import (
        read_document_links,
    )

    p = tmp_path / "doclinks.txt"
    p.write_text(
        "url='http://x/a.pdf' text='A' title='T' type='document' "
        "file_extension='pdf' document_type='10-K' source_url='http://x' "
        "full_html=''\n"
        "url='http://y/b.htm' text='B' title='' type='webpage' "
        "file_extension='htm' document_type='' source_url='http://y' "
        "full_html='<a>'\n",
        encoding="utf-8",
    )
    register(spark)
    via_ds = (
        spark.read.format("kvlinks").option("path", str(p)).load().orderBy("href")
    )
    via_regex = read_document_links(spark, str(p)).orderBy("href")
    assert via_ds.columns == via_regex.columns
    assert [tuple(r) for r in via_ds.collect()] == [
        tuple(r) for r in via_regex.collect()
    ]


def test_pushdown_unit():
    """pushFilters keeps what read() can evaluate, yields the rest."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, IsNotNull, Not

    from automated_dow30_earnings_reports_spark.sources.kv_datasource import (
        KVLinksReader,
    )
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL("name string, key bigint, bal double")
    rdr = KVLinksReader(schema, {"path": "/tmp/x"})
    flts = [
        EqualTo(("name",), "a"),
        GreaterThan(("key",), 5),
        IsNotNull(("bal",)),
        Not(EqualTo(("name",), "b")),  # unsupported -> residual
        EqualTo(("nope",), 1),  # unknown column -> residual
    ]
    residual = list(rdr.pushFilters(flts))
    assert residual == flts[3:]
    assert [i for i, _ in rdr.pushed] == [0, 1, 2]


def test_pushdown_end_to_end(spark, kv_file):
    """Engine-planned filters produce exact results through the
    source-side evaluation (no residual Spark filter for pushed
    conjuncts), across types and null semantics. Each predicate runs
    against a fresh load(): see the module docstring's engine sharp
    edge — Spark 4.1.2 memoizes the first planning's read function on
    a shared relation, so mixing filtered and unfiltered queries on
    one load() can replay stale pushed filters (engine-side caching,
    not connector state: every pushdown planning builds a new
    reader)."""
    register(spark)
    got = (
        _read_all(spark, kv_file, 256)
        .filter(
            (F.col("key") > 100)
            & (F.col("key") <= 110)
            & F.col("name").startswith("rec1")
        )
        .collect()
    )
    assert sorted(r.key for r in got) == list(range(101, 111))
    got2 = (
        _read_all(spark, kv_file, 256)
        .filter(F.col("name").isin("rec005", "rec007"))
        .collect()
    )
    assert sorted(r.key for r in got2) == [5, 7]
    # disjunction is not a pushable conjunct set; Spark evaluates it
    got3 = (
        _read_all(spark, kv_file, 256)
        .filter((F.col("key") == 3) | (F.col("key") == 199))
        .collect()
    )
    assert sorted(r.key for r in got3) == [3, 199]


def test_stream_tail_exactly_once(spark, tmp_path):
    """Landing-dir streaming source: availableNow run ingests existing
    files; a restarted run from the same checkpoint ingests ONLY files
    that landed in between."""
    register(spark)
    land = tmp_path / "landing"
    land.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def land_file(name, lo, hi):
        (land / name).write_text(
            "".join(f"name='r{i}' key='{i}' bal='{i}.00'\n" for i in range(lo, hi)),
            encoding="utf-8",
        )

    def run_batch(_name):
        got: list = []
        q = (
            spark.readStream.format("kvlinks")
            .schema("name string, key bigint, bal double")
            .option("path", str(land))
            .load()
            .writeStream.foreachBatch(
                lambda df, epoch: got.extend(df.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r.key for r in got}

    land_file("a.txt", 0, 5)
    land_file("b.txt", 5, 9)
    assert run_batch("kv_s1") == set(range(9))
    land_file("c.txt", 9, 12)
    assert run_batch("kv_s2") == set(range(9, 12))  # only the new file


def test_stream_out_of_order_file_names(spark, tmp_path):
    """A late file that sorts BEFORE already-ingested ones must still
    be picked up exactly once (name-set offsets, not a sorted-count
    prefix — uuid part names and multi-writer clock skew produce
    exactly this arrival order)."""
    register(spark)
    land = tmp_path / "landing2"
    land.mkdir()
    ckpt = str(tmp_path / "ckpt2")

    def run_batch():
        got: list = []
        q = (
            spark.readStream.format("kvlinks")
            .schema("name string, key bigint, bal double")
            .option("path", str(land))
            .load()
            .writeStream.foreachBatch(lambda df, e: got.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(r.key for r in got)

    (land / "zz-late-start.txt").write_text("name='a' key='1' bal='1.0'\n")
    assert run_batch() == [1]
    # lands lexicographically BEFORE zz-late-start.txt
    (land / "aa-newer.txt").write_text("name='b' key='2' bal='2.0'\n")
    assert run_batch() == [2]  # only the new file; no re-read of key=1


def test_writer_overwrite_replaces(spark, tmp_path):
    """mode('overwrite') must replace prior committed data, not append."""
    register(spark)
    out = str(tmp_path / "ow")
    df1 = spark.createDataFrame([("a", 1, 1.0)], "name string, key bigint, bal double")
    df2 = spark.createDataFrame([("b", 2, 2.0)], "name string, key bigint, bal double")
    df1.write.format("kvlinks").option("path", out).mode("append").save()
    df2.write.format("kvlinks").option("path", out).mode("overwrite").save()
    got = _read_all(spark, out, 1 << 20).collect()
    assert [(r.name, r.key) for r in got] == [("b", 2)]


def test_reader_ignores_orphan_part_files(spark, tmp_path):
    """Part files not named in the _SUCCESS manifest (a task attempt
    that published its file but whose commit message never landed)
    must be invisible to readers."""
    register(spark)
    out = str(tmp_path / "orphan")
    df = spark.createDataFrame([("a", 1, 1.0)], "name string, key bigint, bal double")
    df.write.format("kvlinks").option("path", out).mode("append").save()
    with open(os.path.join(out, "part-deadbeef0000.txt"), "w") as f:
        f.write("name='ghost' key='99' bal='9.9'\n")
    got = _read_all(spark, out, 1 << 20).collect()
    assert sorted(r.key for r in got) == [1]


def test_writer_float_roundtrip_full_precision(spark, tmp_path):
    """Doubles with more than 2 decimals must survive write->read
    exactly (repr round-trip, not %.2f)."""
    register(spark)
    out = str(tmp_path / "prec")
    df = spark.createDataFrame(
        [("a", 1, 0.125), ("b", 2, 123.456789)],
        "name string, key bigint, bal double",
    )
    df.write.format("kvlinks").option("path", out).mode("append").save()
    got = {r.name: r.bal for r in _read_all(spark, out, 1 << 20).collect()}
    assert got == {"a": 0.125, "b": 123.456789}


def test_append_preserves_foreign_files(spark, tmp_path):
    """A manifest created by the first kvlinks append must keep
    pre-existing foreign (non part-pattern) files readable."""
    register(spark)
    out = tmp_path / "mixed"
    out.mkdir()
    (out / "foreign.txt").write_text("name='f' key='100' bal='1.0'\n")
    df = spark.createDataFrame([("a", 1, 1.0)], "name string, key bigint, bal double")
    df.write.format("kvlinks").option("path", str(out)).mode("append").save()
    got = sorted(r.key for r in _read_all(spark, str(out), 1 << 20).collect())
    assert got == [1, 100]  # both the appended row and the foreign file


def test_stream_file_name_with_comma(spark, tmp_path):
    """Offsets are a name LIST, so a comma in a file name must not
    corrupt the seen set (no endless re-ingestion)."""
    register(spark)
    land = tmp_path / "landing3"
    land.mkdir()
    ckpt = str(tmp_path / "ckpt3")
    (land / "a,b.txt").write_text("name='x' key='1' bal='1.0'\n")

    def run_batch():
        got: list = []
        q = (
            spark.readStream.format("kvlinks")
            .schema("name string, key bigint, bal double")
            .option("path", str(land))
            .load()
            .writeStream.foreachBatch(lambda df, e: got.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return [r.key for r in got]

    assert run_batch() == [1]
    assert run_batch() == []  # NOT re-ingested on the second run


def test_writer_rejects_quote_and_newline(spark, tmp_path):
    """KVLinksWriter fails the task loudly on values the line format
    cannot represent (ADVICE r3) — no silently corrupt part files."""
    import pytest as _pytest

    out = str(tmp_path / "kv_bad")
    df = spark.createDataFrame([("O'Brien", 1, 0.5)], "name string, key bigint, bal double")
    with _pytest.raises(Exception, match="cannot round-trip|kvlinks writer"):
        df.write.format("kvlinks").option("path", out).mode("append").save()
    df2 = spark.createDataFrame([("a\nb", 1, 0.5)], "name string, key bigint, bal double")
    with _pytest.raises(Exception, match="cannot round-trip|kvlinks writer"):
        df2.write.format("kvlinks").option("path", out).mode("append").save()
