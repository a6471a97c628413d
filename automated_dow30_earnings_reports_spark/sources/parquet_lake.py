"""Hive-partitioned parquet lake writer/reader (the at-scale sink).

The reference persists every stage as loose text/JSON files per company
(src/orchestrator.py:73-84, src/simple_metadata_collector.py:121-130).
At 100 TB the equivalent is a partitioned parquet dataset: partition
columns become directories, so a reader's predicate on them prunes
entire directories BEFORE any file is opened (PartitionFilters in the
scan node, distinct from row-group PushedFilters), and a writer can
replace one partition atomically without touching the rest.

Scale knobs encoded here:
  - dynamic partition overwrite — an incremental job rewrites only the
    partitions present in its output (the "daily re-run" contract);
    static overwrite would drop the whole table.
  - file-count control — one output file per (partition, task) without
    a repartition produces tasks x partitions small files; repartition
    on the partition columns makes it one file per partition (bound
    further with ``files_per_partition`` salting when a single
    partition's data exceeds one task's comfortable write size).
  - in-file clustering — ``sort_within`` sorts rows inside each file so
    min/max row-group stats make point/range predicates on those
    columns skippable (poor-man's Z-order; see plans/advanced.py
    zorder_cluster for the multi-column interleaving variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    dynamic: bool = True,
    files_per_partition: int = 1,
    sort_within: list[str] | None = None,
) -> None:
    """Write ``df`` as a hive-partitioned parquet dataset."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    if dynamic and mode == "overwrite":
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out = df
        if files_per_partition == 1:
            out = out.repartition(*[F.col(c) for c in partition_cols])
        else:
            # Salted spread: an explicit partition count is required —
            # AQE coalesces column-only repartitions back together,
            # collapsing the salt groups into one task (= one file).
            n_values = df.select(*partition_cols).distinct().count()
            salt = (F.abs(F.hash(*df.columns)) % files_per_partition).alias("_salt")
            out = out.repartition(
                max(1, n_values * files_per_partition),
                *[F.col(c) for c in partition_cols],
                salt,
            )
        if sort_within:
            out = out.sortWithinPartitions(*sort_within)
        out.write.mode(mode).partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_lake(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned dataset; partition columns come back typed by
    directory-name inference, and predicates on them become
    PartitionFilters (directory pruning, zero I/O for pruned values)."""
    return spark.read.parquet(path)
