"""S10/X3 — robust download sink as an idempotent Spark stage.

The reference downloads each report URL with chunked 64 KiB writes,
retries, and alternate headers (src/download_reports.py:459-603), then
builds per-file metadata records (src/simple_metadata_collector.py:
147-166) with streamed MD5 checksums (:132-145). The Spark shape:

  - ``mapInPandas`` (not foreachPartition) so the stage *returns* the
    FILE_METADATA rows — downstream ledger aggregation (A11) and the
    success/failure dead-letter split (U3) stay in the plan;
  - per-partition transport construction (HTTP session reuse);
  - **idempotent under task retries** (SURVEY §7 hard (d)): bytes are
    streamed to ``<final>.part-<uuid>`` then ``os.replace``d into
    place — a re-run of a failed task never observes a torn file, and
    a duplicate attempt of a finished row is a cheap overwrite with
    identical content;
  - failures produce the reference's all-empty metadata variant
    (src/orchestrator.py:212-225) with success=false.

Scale: downloads are I/O-bound and embarrassingly parallel — partition
count (not core count) is the concurrency knob, and the 64 KiB chunk
loop bounds memory per task regardless of file size.
"""

from __future__ import annotations

import hashlib
import math
import os
import uuid
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Transport: url -> (content_type, iterator of byte chunks). Raises on failure.
Transport = Callable[[str], tuple[str, Iterator[bytes]]]
TransportFactory = Callable[[], Transport]

CHUNK_SIZE = 64 * 1024  # ref src/download_reports.py:542-545

DOWNLOAD_RESULT_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("filename", StringType(), True),
        StructField("file_path", StringType(), True),
        StructField("file_size", LongType(), True),
        StructField("checksum", StringType(), True),  # MD5 (ref :132-142)
        StructField("content_type", StringType(), True),
        StructField("success", BooleanType(), False),
        StructField("error", StringType(), True),
    ]
)

_ILLEGAL = '<>:"/\\|?*'


def _sanitize(name: str) -> str:
    """F8 (ref src/download_reports.py:477-479)."""
    return "".join("_" if c in _ILLEGAL else c for c in name)


def _clean_scalar(v):
    """pandas nullability repair: Arrow hands NaN (and floats like
    2023.0) for nullable int columns once any row in the batch is null,
    so 'is not None' checks passed for missing values and filenames
    came out as 'Title_nanQnan.pdf' / 'Title_2023.0Q1.0.pdf'."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float) and v.is_integer():
        return int(v)
    return v


def derive_filename(url: str, title=None, year=None, quarter=None, ext=None) -> str:
    """F11 3-priority coalesce (ref :389-418), Python twin of
    functions.scalars.build_filename for use inside the sink."""
    title, year, quarter = _clean_scalar(title), _clean_scalar(year), _clean_scalar(quarter)
    if title is not None and year is not None and quarter is not None:
        return f"{_sanitize(str(title))}_{year}Q{quarter}{ext or ''}"
    last = url.split("?")[0].split("#")[0].rstrip("/").rsplit("/", 1)[-1]
    return _sanitize(last) if last else f"download{ext or ''}"


def download_stage(
    df: DataFrame,
    out_dir: str,
    transport_factory: TransportFactory,
    url_col: str = "url",
    num_partitions: int | None = None,
) -> DataFrame:
    """Download every row's URL into ``out_dir``; return result rows.

    Input may carry optional title/year/quarter/file_extension columns
    used for filename derivation (F11).

    Collision semantics are REFERENCE PARITY: distinct URLs deriving
    the same filename clobber each other, last writer wins (src/
    download_reports.py:550-560 does exactly this), so the ledger can
    record two successes whose checksums cannot both match the one
    surviving file. Idempotence is guaranteed per-URL (same URL retried
    lands the same bytes under the same name); a deployment needing
    per-URL files should add a content-hash suffix to derive_filename
    — deliberately not done here so filenames match the reference's.
    """
    in_cols = set(df.columns)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = transport_factory()  # one HTTP session per partition
        os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            out: list[tuple] = []
            for _, row in pdf.iterrows():
                url = row[url_col]
                fname = derive_filename(
                    url,
                    row.get("title") if "title" in in_cols else None,
                    row.get("year") if "year" in in_cols else None,
                    row.get("quarter") if "quarter" in in_cols else None,
                    ("." + row["file_extension"].lstrip("."))
                    if "file_extension" in in_cols and row.get("file_extension")
                    else None,
                )
                final_path = os.path.join(out_dir, fname)
                tmp_path = f"{final_path}.part-{uuid.uuid4().hex}"
                try:
                    content_type, chunks = transport(url)
                    md5 = hashlib.md5()
                    size = 0
                    with open(tmp_path, "wb") as fh:
                        for chunk in chunks:  # 64 KiB streaming, bounded memory
                            fh.write(chunk)
                            md5.update(chunk)
                            size += len(chunk)
                    os.replace(tmp_path, final_path)  # atomic commit
                    out.append(
                        (url, fname, final_path, size, md5.hexdigest(), content_type, True, None)
                    )
                except Exception as exc:
                    if os.path.exists(tmp_path):
                        os.remove(tmp_path)
                    # all-empty failed variant (ref src/orchestrator.py:212-225)
                    out.append((url, None, None, None, None, None, False,
                                f"{type(exc).__name__}: {exc}"))
            yield pd.DataFrame(out, columns=[f.name for f in DOWNLOAD_RESULT_SCHEMA.fields])

    source = df.repartition(num_partitions) if num_partitions else df
    return source.mapInPandas(run, schema=DOWNLOAD_RESULT_SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic fake transport: byte stream derived from the URL alone.
# size = 1024 + 37*len(url) so the oracle can recompute file_size in SQL;
# content is the MD5 keystream of the URL (deterministic, incompressible).
# ---------------------------------------------------------------------------


def fake_transport() -> Transport:
    def get(url: str) -> tuple[str, Iterator[bytes]]:
        size = 1024 + 37 * len(url)
        ct = "application/pdf" if url.lower().endswith(".pdf") else "application/octet-stream"

        def chunks() -> Iterator[bytes]:
            remaining = size
            counter = 0
            while remaining > 0:
                block = hashlib.md5(f"{url}#{counter}".encode()).digest() * (CHUNK_SIZE // 16)
                yield block[: min(remaining, CHUNK_SIZE)]
                remaining -= min(remaining, CHUNK_SIZE)
                counter += 1

        return ct, chunks()

    return get


def failing_transport(fail_substring: str = "bad") -> Transport:
    inner = fake_transport()

    def get(url: str) -> tuple[str, Iterator[bytes]]:
        if fail_substring in url:
            raise ConnectionError(f"HTTP 503: {url}")
        return inner(url)

    return get
