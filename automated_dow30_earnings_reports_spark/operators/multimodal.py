"""Multimodal binary-column operators (SURVEY §2.11).

Images/audio/video are opaque ``binary`` columns with typed metadata —
the generalization of the reference's downloaded-PDF handling, where
binary content stays out of the row and only derived metadata (MD5,
size, type) enters the data model (simple_metadata_collector.py:132-145,
download_reports.py:519-521 magic-byte checks).

Since the synthetic testdata has no media files, blobs are derived
deterministically from ``documents.text`` (pure ASCII, verified) with
an ASCII format header, so every byte-level computation has an exact
string-side DuckDB oracle. The *plumbing* is the real thing:

  - BinaryType columns end-to-end (encode → binary ops → hex/md5);
  - decode / feature-extract run as ``mapInPandas`` over Arrow-batched
    binary columns — the exact shape a real PIL/librosa decode takes.
    The real decoders are stubbed (this container has no media libs):
    ``decode_image_real`` raises NotImplementedError, the fake parses
    the header + deterministic arithmetic;
  - frame sampling is JVM-side (sequence + explode + binary substring),
    no Python in the hot path.

Scale: blobs never shuffle — every operator projects metadata first
and aggregates/joins on the *derived* columns; a real deployment reads
blobs via ``spark.read.format("binaryFile")`` with the same operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from automated_dow30_earnings_reports_spark.tables import load_table

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Typed-blob construction: documents.text → binary with a 6-byte ASCII
# format header. media kind cycles image/audio/video by doc_id.
# ---------------------------------------------------------------------------

_HEADERS = {"image": "IMGv1:", "audio": "AUDv1:", "video": "VIDv1:"}


def media_kind(doc_id: Column) -> Column:
    return (
        F.when(doc_id % 3 == 0, "image")
        .when(doc_id % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_kind")
    )


def with_blob(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, media_kind, blob binary, byte_len)."""
    kind = media_kind(F.col("doc_id"))
    header = (
        F.when(kind == "image", _HEADERS["image"])
        .when(kind == "audio", _HEADERS["audio"])
        .otherwise(_HEADERS["video"])
    )
    blob = F.encode(F.concat(header, F.col("text")), "UTF-8")
    return docs.select(
        "doc_id",
        kind,
        blob.alias("blob"),
        F.length(blob).cast("bigint").alias("byte_len"),
    )


_BLOB_SQL = """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_kind,
           CASE WHEN doc_id % 3 = 0 THEN 'IMGv1:'
                WHEN doc_id % 3 = 1 THEN 'AUDv1:'
                ELSE 'VIDv1:' END || text AS payload,
           CAST(6 + length(text) AS BIGINT) AS byte_len
    FROM documents
"""


# ---------------------------------------------------------------------------
# Metadata extraction: magic-byte type detection (P9 generalized),
# byte length, MD5 — all on the binary column, JVM-side.
# ---------------------------------------------------------------------------


@_register(
    "multimodal_metadata",
    f"""
    WITH blobs AS ({_BLOB_SQL})
    SELECT doc_id,
           CASE WHEN payload LIKE 'IMGv1:%' THEN 'image'
                WHEN payload LIKE 'AUDv1:%' THEN 'audio'
                WHEN payload LIKE 'VIDv1:%' THEN 'video'
                ELSE 'unknown' END AS detected_kind,
           byte_len,
           md5(payload) AS checksum
    FROM blobs
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte sniffing on the blob itself (not the kind column):
    decode the first 6 bytes and match the format header — the binary
    twin of the reference's %PDF check (download_reports.py:519-521)."""
    blobs = with_blob(load_table(spark, sf_dir, "documents"))
    magic = F.decode(F.substring(F.col("blob"), 1, 6), "UTF-8")
    return blobs.select(
        "doc_id",
        F.when(magic == _HEADERS["image"], "image")
        .when(magic == _HEADERS["audio"], "audio")
        .when(magic == _HEADERS["video"], "video")
        .otherwise("unknown")
        .alias("detected_kind"),
        "byte_len",
        F.md5(F.col("blob")).alias("checksum"),
    )


# ---------------------------------------------------------------------------
# Image decode + resize — mapInPandas over Arrow-batched binary.
# ---------------------------------------------------------------------------

IMAGE_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mode", StringType(), True),
        StructField("resized_w", IntegerType(), True),
        StructField("resized_h", IntegerType(), True),
        StructField("decode_error", StringType(), True),
    ]
)


def decode_image_real(data: bytes) -> tuple[int, int, str]:
    """Full pixel decode, import-gated on Pillow (same pattern as the
    Excel sink, sources/csv_sources.py write_excel): decodes actual
    pixels when PIL is installed, raises NotImplementedError otherwise
    — which ``image_decode_stage`` turns into a ``decode_error``
    dead-letter row, never a task failure. Structural metadata does
    NOT need it — see parse_image_header below."""
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "pixel decode requires PIL (pip install pillow) or an injected decoder"
        ) from exc
    import io as _io

    with Image.open(_io.BytesIO(data)) as im:
        im.load()
        return im.width, im.height, im.mode


def default_image_decoder():
    """The decoder a deployment gets by default: real pixel decode when
    Pillow is importable, the deterministic fake otherwise. Registered
    queries pin ``decode_image_fake`` explicitly so their oracles are
    environment-independent; pipelines that want best-available decode
    call ``image_decode_stage(blobs, decoder=default_image_decoder())``."""
    try:
        import PIL  # noqa: F401

        return decode_image_real
    except ImportError:
        return decode_image_fake


_JPEG_SOF_MARKERS = frozenset(
    {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
)


def parse_image_header(data: bytes) -> tuple[int, int, str]:
    """REAL image dimension extraction from container headers — pure
    byte parsing, no decoder library: PNG IHDR, GIF logical screen
    descriptor, BMP info header, JPEG SOF segment scan. This is what a
    100 TB metadata pass actually runs (reading 8-30 bytes per blob);
    full pixel decode (decode_image_real) is only needed for
    resize/feature stages."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        if data[12:16] != b"IHDR":
            raise ValueError("PNG without leading IHDR")
        w = int.from_bytes(data[16:20], "big")
        h = int.from_bytes(data[20:24], "big")
        return w, h, "png"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(data[6:8], "little")
        h = int.from_bytes(data[8:10], "little")
        return w, h, "gif"
    if data[:2] == b"BM":
        w = int.from_bytes(data[18:22], "little", signed=True)
        h = abs(int.from_bytes(data[22:26], "little", signed=True))  # h<0 = top-down DIB
        return w, h, "bmp"
    if data[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(data):
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker == 0xFF:  # legal fill/padding byte between segments
                i += 1
                continue
            if marker in _JPEG_SOF_MARKERS:
                h = int.from_bytes(data[i + 5 : i + 7], "big")
                w = int.from_bytes(data[i + 7 : i + 9], "big")
                return w, h, "jpeg"
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:
                i += 2  # standalone markers have no length field
                continue
            i += 2 + int.from_bytes(data[i + 2 : i + 4], "big")
        raise ValueError("JPEG without SOF marker")
    raise ValueError("unknown image container")


def decode_image_fake(data: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in: dimensions from payload size (the bytes
    after the 6-byte header), mirroring what a real decode returns."""
    if not data.startswith(b"IMGv1:"):
        raise ValueError("not an IMGv1 blob")
    n = len(data) - 6
    return (n % 640 + 16, n % 480 + 16, "RGB")


def image_decode_stage(
    blobs: DataFrame, decoder=decode_image_fake, target: int = 64
) -> DataFrame:
    """Decode + aspect-preserving resize plan over binary batches.
    Failures land in ``decode_error`` (dead-letter), never task-fail."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, data in zip(pdf["doc_id"], pdf["blob"]):
                try:
                    w, h, mode = decoder(bytes(data))
                    rw, rh = target, max(1, (h * target) // w)
                    out.append((doc_id, w, h, mode, rw, rh, None))
                except Exception as exc:
                    out.append((doc_id, None, None, None, None, None, str(exc)))
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_DECODE_SCHEMA.fields])

    return blobs.select("doc_id", "blob").mapInPandas(run, schema=IMAGE_DECODE_SCHEMA)


@_register(
    "multimodal_image_decode",
    f"""
    WITH blobs AS ({_BLOB_SQL}),
    dims AS (
      SELECT doc_id,
             CAST((byte_len - 6) % 640 + 16 AS INTEGER) AS width,
             CAST((byte_len - 6) % 480 + 16 AS INTEGER) AS height
      FROM blobs WHERE media_kind = 'image'
    )
    SELECT doc_id, width, height, 'RGB' AS mode,
           CAST(64 AS INTEGER) AS resized_w,
           CAST(GREATEST(1, (height * 64) // width) AS INTEGER) AS resized_h
    FROM dims
    """,
)
def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    blobs = with_blob(load_table(spark, sf_dir, "documents")).filter(
        F.col("media_kind") == "image"
    )
    out = image_decode_stage(blobs)
    return out.filter(F.col("decode_error").isNull()).drop("decode_error")


# ---------------------------------------------------------------------------
# Real-container header parse: Spark assembles genuine PNG bytes
# (signature + IHDR) JVM-side from per-doc dimensions, the pandas UDF
# runs the REAL header parser on them, and the oracle states the
# dimensions arithmetically — an end-to-end encode→parse round trip
# over an actual image container format.
# ---------------------------------------------------------------------------

_PNG_SIG_IHDR_HEX = "89504E470D0A1A0A" + "0000000D" + "49484452"
_PNG_IHDR_TAIL_HEX = "0806000000" + "00000000"  # 8-bit RGBA, fake CRC


@_register(
    "multimodal_image_header",
    """
    SELECT doc_id,
           CAST(doc_id % 640 + 16 AS INTEGER) AS width,
           CAST(doc_id % 480 + 16 AS INTEGER) AS height,
           'png' AS fmt
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_image_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    from automated_dow30_earnings_reports_spark.tables import spread

    d = spread(load_table(spark, sf_dir, "documents"))
    w = (F.col("doc_id") % 640 + 16).cast("bigint")
    h = (F.col("doc_id") % 480 + 16).cast("bigint")
    png = F.unhex(
        F.concat(
            F.lit(_PNG_SIG_IHDR_HEX),
            F.lpad(F.hex(w), 8, "0"),
            F.lpad(F.hex(h), 8, "0"),
            F.lit(_PNG_IHDR_TAIL_HEX),
        )
    )
    blobs = d.select("doc_id", png.alias("blob"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, data in zip(pdf["doc_id"], pdf["blob"]):
                pw, ph, fmt = parse_image_header(bytes(data))
                out.append((doc_id, pw, ph, fmt))
            yield pd.DataFrame(out, columns=["doc_id", "width", "height", "fmt"])

    parsed = blobs.mapInPandas(
        run, schema="doc_id long, width int, height int, fmt string"
    )
    return parsed.orderBy("doc_id")


def parse_audio_header(data: bytes) -> tuple[int, int, int, str]:
    """REAL audio container metadata: RIFF/WAVE fmt-chunk walk →
    (channels, sample_rate, bits_per_sample, 'wav'). Pure byte parsing
    like parse_image_header — the fmt chunk is found by chunk-id scan,
    not fixed offset, so files with LIST/INFO chunks before fmt parse
    correctly."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    i = 12
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        clen = int.from_bytes(data[i + 4 : i + 8], "little")
        if cid == b"fmt ":
            if clen < 16 or i + 24 > len(data):
                raise ValueError("truncated fmt chunk")
            ch = int.from_bytes(data[i + 10 : i + 12], "little")
            rate = int.from_bytes(data[i + 12 : i + 16], "little")
            bits = int.from_bytes(data[i + 22 : i + 24], "little")
            return ch, rate, bits, "wav"
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    raise ValueError("WAVE without fmt chunk")


def _le_hex(col: Column, n_bytes: int) -> Column:
    """Little-endian hex of an integer column (for JVM-side container
    assembly): big-endian lpad'd hex with its byte pairs reversed."""
    be = F.lpad(F.hex(col), 2 * n_bytes, "0")
    pairs = [F.substring(be, 2 * i + 1, 2) for i in range(n_bytes)]
    return F.concat(*reversed(pairs))


@_register(
    "multimodal_audio_header",
    """
    SELECT doc_id,
           CAST(doc_id % 2 + 1 AS INTEGER)            AS channels,
           CAST(8000 + (doc_id % 6) * 8000 AS INTEGER) AS sample_rate,
           CAST(16 AS INTEGER)                         AS bits,
           'wav'                                       AS fmt
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_audio_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble genuine WAV headers JVM-side (RIFF + fmt chunk with
    per-doc channels/rate, little-endian fields built by byte-pair
    reversal) and round-trip them through the real RIFF parser."""
    from automated_dow30_earnings_reports_spark.tables import spread

    d = spread(load_table(spark, sf_dir, "documents"))
    ch = (F.col("doc_id") % 2 + 1).cast("bigint")
    rate = (8000 + (F.col("doc_id") % 6) * 8000).cast("bigint")
    bits = F.lit(16).cast("bigint")
    byte_rate = (rate * ch * 2).cast("bigint")
    block_align = (ch * 2).cast("bigint")
    wav = F.unhex(
        F.concat(
            F.lit("52494646"),          # 'RIFF'
            F.lit("24000000"),          # chunk size (LE, header-only)
            F.lit("57415645"),          # 'WAVE'
            F.lit("666D7420"),          # 'fmt '
            F.lit("10000000"),          # fmt length 16 (LE)
            F.lit("0100"),              # PCM
            _le_hex(ch, 2),
            _le_hex(rate, 4),
            _le_hex(byte_rate, 4),
            _le_hex(block_align, 2),
            _le_hex(bits, 2),
        )
    )
    blobs = d.select("doc_id", wav.alias("blob"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, data in zip(pdf["doc_id"], pdf["blob"]):
                c, r, b, fmt = parse_audio_header(bytes(data))
                out.append((doc_id, c, r, b, fmt))
            yield pd.DataFrame(
                out, columns=["doc_id", "channels", "sample_rate", "bits", "fmt"]
            )

    parsed = blobs.mapInPandas(
        run, schema="doc_id long, channels int, sample_rate int, bits int, fmt string"
    )
    return parsed.orderBy("doc_id")


def parse_video_header(data: bytes) -> tuple[str, int, int, str]:
    """REAL video container metadata: ISO BMFF (MP4) top-level box walk →
    (major_brand, timescale, duration, 'mp4') from ftyp + moov/mvhd.
    Handles version-0 (32-bit) and version-1 (64-bit) mvhd fields."""
    if len(data) < 16 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF container")
    major_brand = data[8:12].decode("ascii", "replace")
    i = 0
    while i + 8 <= len(data):
        size = int.from_bytes(data[i : i + 4], "big")
        box = data[i + 4 : i + 8]
        if size < 8:
            raise ValueError("malformed box size")
        if box == b"moov":
            j = i + 8
            end = min(i + size, len(data))
            while j + 8 <= end:
                csize = int.from_bytes(data[j : j + 4], "big")
                cbox = data[j + 4 : j + 8]
                if cbox == b"mvhd":
                    ver = data[j + 8]
                    if ver == 1:
                        ts = int.from_bytes(data[j + 28 : j + 32], "big")
                        dur = int.from_bytes(data[j + 32 : j + 40], "big")
                    else:
                        ts = int.from_bytes(data[j + 20 : j + 24], "big")
                        dur = int.from_bytes(data[j + 24 : j + 28], "big")
                    return major_brand, ts, dur, "mp4"
                if csize < 8:
                    raise ValueError("malformed box size")
                j += csize
            raise ValueError("moov without mvhd")
        i += size
    raise ValueError("no moov box")


@_register(
    "multimodal_video_header",
    """
    SELECT doc_id,
           'isom'                                        AS major_brand,
           CAST(600 AS INTEGER)                          AS timescale,
           CAST((doc_id % 300 + 1) * 600 AS BIGINT)      AS duration,
           CAST(doc_id % 300 + 1 AS BIGINT)              AS duration_sec
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_video_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble genuine MP4 structure JVM-side (ftyp + moov/mvhd v0 with
    timescale 600 and a per-doc duration) and round-trip through the
    real box-walk parser; duration_sec = duration/timescale is the
    derived column a video-curation pass filters on."""
    from automated_dow30_earnings_reports_spark.tables import spread

    d = spread(load_table(spark, sf_dir, "documents"))
    dur = ((F.col("doc_id") % 300 + 1) * 600).cast("bigint")
    # ftyp box: size 16, brand isom, minor 0 | moov (size 8+108) > mvhd v0
    # (size 108: 8 header + 100 fields; timescale at +20, duration at +24)
    mvhd = F.concat(
        F.lit("0000006C" + "6D766864"),  # size 108, 'mvhd'
        F.lit("00" + "000000"),          # version 0 + flags
        F.lit("00000000" * 2),           # creation/modification time
        F.lit("00000258"),               # timescale 600
        F.lpad(F.hex(dur), 8, "0"),      # duration (BE)
        F.lit("00" * 80),                # rate/volume/matrix/next_track
    )
    mp4 = F.unhex(
        F.concat(
            F.lit("00000010" + "66747970" + "69736F6D" + "00000000"),  # ftyp isom
            F.lit("00000074" + "6D6F6F76"),                            # moov size 116
            mvhd,
        )
    )
    blobs = d.select("doc_id", mp4.alias("blob"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, data in zip(pdf["doc_id"], pdf["blob"]):
                brand, ts, duration, _fmt = parse_video_header(bytes(data))
                out.append((doc_id, brand, ts, duration, duration // ts))
            yield pd.DataFrame(
                out,
                columns=["doc_id", "major_brand", "timescale", "duration", "duration_sec"],
            )

    parsed = blobs.mapInPandas(
        run,
        schema="doc_id long, major_brand string, timescale int, duration long, duration_sec long",
    )
    return parsed.orderBy("doc_id")


# ---------------------------------------------------------------------------
# Video frame sampling — JVM-side: sequence/explode + binary substring.
# ---------------------------------------------------------------------------

_FRAME_STRIDE = 256
_MAX_FRAMES = 4


@_register(
    "multimodal_frame_sample",
    f"""
    WITH blobs AS ({_BLOB_SQL}),
    vids AS (
      SELECT doc_id, payload, byte_len,
             LEAST({_MAX_FRAMES}, 1 + byte_len // {_FRAME_STRIDE}) AS n_frames
      FROM blobs WHERE media_kind = 'video'
    )
    SELECT doc_id,
           CAST(f.frame_idx AS INTEGER)                AS frame_idx,
           CAST(f.frame_idx * {_FRAME_STRIDE} AS BIGINT) AS frame_offset,
           upper(hex(substring(payload, f.frame_idx * {_FRAME_STRIDE} + 1, 8))) AS frame_sig
    FROM vids, LATERAL (
      SELECT unnest(generate_series(0, CAST(n_frames - 1 AS INTEGER))) AS frame_idx
    ) f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample up to 4 'frames' (8-byte signatures every 256 bytes) per
    video blob — the frame-sample plan shape with zero Python."""
    vids = with_blob(load_table(spark, sf_dir, "documents")).filter(
        F.col("media_kind") == "video"
    )
    n_frames = F.least(F.lit(_MAX_FRAMES), 1 + (F.col("byte_len") / _FRAME_STRIDE).cast("int"))
    frames = vids.select(
        "doc_id",
        "blob",
        F.explode(F.sequence(F.lit(0), (n_frames - 1).cast("int"))).alias("frame_idx"),
    )
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        (F.col("frame_idx").cast("bigint") * _FRAME_STRIDE).alias("frame_offset"),
        F.upper(
            F.hex(F.expr(f"substring(blob, frame_idx * {_FRAME_STRIDE} + 1, 8)"))
        ).alias("frame_sig"),
    )


# ---------------------------------------------------------------------------
# Audio feature extraction — vectorized numpy over Arrow binary batches.
# ---------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("energy", LongType(), True),  # Σ byte values
        StructField("peak", IntegerType(), True),  # max byte value
    ]
)


def audio_feature_stage(blobs: DataFrame) -> DataFrame:
    """Per-blob byte-level features via numpy (the librosa stand-in):
    real vectorized decode-side compute, deterministic output."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, data in zip(pdf["doc_id"], pdf["blob"]):
                arr = np.frombuffer(bytes(data), dtype=np.uint8)
                out.append((doc_id, len(arr), int(arr.sum()), int(arr.max())))
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields])

    return blobs.select("doc_id", "blob").mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


@_register(
    "multimodal_audio_features",
    f"""
    WITH blobs AS ({_BLOB_SQL}),
    chars AS (
      SELECT doc_id, byte_len, ascii(c.ch) AS byte_val
      FROM blobs, LATERAL (SELECT unnest(string_split(payload, '')) AS ch) c
      WHERE media_kind = 'audio'
    )
    SELECT doc_id,
           byte_len                         AS n_bytes,
           CAST(SUM(byte_val) AS BIGINT)    AS energy,
           CAST(MAX(byte_val) AS INTEGER)   AS peak
    FROM chars
    GROUP BY doc_id, byte_len
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    blobs = with_blob(load_table(spark, sf_dir, "documents")).filter(
        F.col("media_kind") == "audio"
    )
    return audio_feature_stage(blobs)


# ---------------------------------------------------------------------------
# Perceptual-hash (dHash) image near-dup signatures. Production shape:
# decode → downsample to a 9x8 grayscale grid → 64 horizontal-gradient
# bits → band the 64 bits into 4x16 for Hamming-LSH candidate
# generation (identical to dedup_simhash's banding, hamming<=3
# guarantee with 4 bands). The real decoder is a pandas-UDF swap-in
# (this container has no image libs); the deterministic stand-in
# "decode" expands the blob payload through an md5 chain into the 72
# pixel values, which keeps EVERY downstream step — gradient bits,
# band packing, bucket join — real, JVM-side, and exactly mirrored in
# the DuckDB oracle.
#
# Scale shape: the whole signature is whole-stage-codegen expressions
# (5 md5 calls + 72 hex slices per row, no Python); blobs never
# shuffle — only the 4 small band ints do, and candidate pairs come
# from equality buckets on (band_idx, band_value), never all-pairs.
# ---------------------------------------------------------------------------

DHASH_ROWS = 8
DHASH_COLS = 8  # bits per row; grid is (DHASH_COLS+1) x DHASH_ROWS pixels
DHASH_BANDS = 4


def _md5_chain_byte_spark(text_col: Column, p: int, salt: str) -> Column:
    """Byte p of the salted md5-chain expansion (the deterministic
    decode stand-in) — ONE chain scheme shared by the image dHash
    pixels (salt '#') and the audio fingerprint frames (salt '~'), so
    a change to the hex-pair decoding cannot leave the Spark/SQL
    oracle pairs of one modality drifting from the other."""
    k, off = divmod(p, 16)
    m = F.md5(F.concat(text_col, F.lit(f"{salt}{k}")).cast("binary"))
    return F.conv(F.substring(m, 2 * off + 1, 2), 16, 10).cast("int")


def _md5_chain_byte_sql(text_expr: str, p: int, salt: str) -> str:
    k, off = divmod(p, 16)
    hx = f"substr(md5({text_expr} || '{salt}{k}'), {2 * off + 1}, 2)"
    hi = f"(strpos('0123456789abcdef', substr({hx}, 1, 1)) - 1)"
    lo = f"(strpos('0123456789abcdef', substr({hx}, 2, 1)) - 1)"
    return f"({hi} * 16 + {lo})"


def _dhash_pixel_spark(text_col: Column, p: int) -> Column:
    return _md5_chain_byte_spark(text_col, p, "#")


def _dhash_pixel_sql(text_expr: str, p: int) -> str:
    return _md5_chain_byte_sql(text_expr, p, "#")


_BANDS_EXPR_CACHE: dict = {}


def dhash_bands_spark(text_col: Column) -> list[Column]:
    """4 x 16-bit dHash bands from the md5-expanded pixel grid.
    Process-cached per input-expression string (r11): the 4x16x2 pixel
    comparisons are ~750 py4j round trips (~1.5 s measured per call)
    and the template is constant for a given input column."""
    key = ("dhash", str(text_col))
    got = _BANDS_EXPR_CACHE.get(key)
    if got is not None:
        return got
    bands = []
    for b in range(DHASH_BANDS):
        acc = F.lit(0)
        for r in (2 * b, 2 * b + 1):
            for c in range(DHASH_COLS):
                p = r * (DHASH_COLS + 1) + c
                bit = (
                    _dhash_pixel_spark(text_col, p)
                    < _dhash_pixel_spark(text_col, p + 1)
                ).cast("int")
                acc = acc + bit * (1 << ((r % 2) * DHASH_COLS + c))
        bands.append(acc.cast("int").alias(f"b{b}"))
    _BANDS_EXPR_CACHE[key] = bands
    return bands


def _dhash_bands_sql(text_expr: str) -> list[str]:
    bands = []
    for b in range(DHASH_BANDS):
        terms = []
        for r in (2 * b, 2 * b + 1):
            for c in range(DHASH_COLS):
                p = r * (DHASH_COLS + 1) + c
                bit = (
                    f"(CASE WHEN {_dhash_pixel_sql(text_expr, p)}"
                    f" < {_dhash_pixel_sql(text_expr, p + 1)} THEN 1 ELSE 0 END)"
                )
                terms.append(f"{bit} * {1 << ((r % 2) * DHASH_COLS + c)}")
        bands.append("CAST(" + " + ".join(terms) + f" AS INTEGER) AS b{b}")
    return bands


def dhash_candidate_pairs(signed: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Banded Hamming-LSH candidates over (doc_id, b0..b3): docs
    sharing ANY 16-bit band are candidates (guaranteed to include all
    pairs with hamming <= DHASH_BANDS - 1); candidates are verified
    with an exact 4-band XOR popcount. One shuffle on the band key,
    never all-pairs. Delegates to banded_hamming_pairs — one
    candidate/verify implementation for every banded-Hamming modality
    (the 45-line inline twin could drift from the generic one)."""
    return banded_hamming_pairs(
        signed, [f"b{b}" for b in range(DHASH_BANDS)], max_hamming
    )


def _dhash_oracle() -> str:
    bands = ",\n           ".join(_dhash_bands_sql("text"))
    return f"""
    SELECT doc_id,
           {bands}
    FROM documents
    WHERE doc_id % 3 = 0
    ORDER BY doc_id
    """


@_register("multimodal_image_dhash", _dhash_oracle())
def multimodal_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image dHash signature (4 x 16-bit bands) over the
    deterministically fake-decoded pixel grid; the Hamming-LSH
    candidate/verify stage over these bands is `dhash_candidate_pairs`
    (pinned on constructed duplicates in tests — this corpus has no
    duplicate image payloads, so the oracle checks the signature
    arithmetic itself, like dedup_simhash does)."""
    from automated_dow30_earnings_reports_spark.tables import spread

    d = spread(load_table(spark, sf_dir, "documents")).filter(
        F.col("doc_id") % 3 == 0
    )
    return d.select("doc_id", *dhash_bands_spark(F.col("text"))).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Audio fingerprint near-dup signatures — the audio twin of the image
# dHash above (Shazam/Chromaprint shape reduced to its Spark-relevant
# core): frame the decoded signal, take per-frame energies, keep the
# ENERGY-GRADIENT bits (energy rises/falls between adjacent frames —
# robust to gain changes exactly as dHash gradients are robust to
# brightness), band the bits for Hamming-LSH pairing. The fake decode
# expands the blob payload through a salted md5 chain into the frame
# energies ('~' chain, disjoint from the image '#' chain), keeping
# every downstream step real, JVM-side, and oracle-mirrored.
# ---------------------------------------------------------------------------

AFP_BITS = 32  # gradient bits per clip
AFP_BANDS = 2  # 2 x 16-bit bands: all pairs with hamming <= 1 guaranteed


def _afp_frame_spark(text_col: Column, p: int) -> Column:
    return _md5_chain_byte_spark(text_col, p, "~")


def _afp_frame_sql(text_expr: str, p: int) -> str:
    return _md5_chain_byte_sql(text_expr, p, "~")


def afp_bands_spark(text_col: Column) -> list[Column]:
    """AFP_BANDS x 16-bit energy-gradient bands. Process-cached like
    dhash_bands_spark (r11) — constant template, py4j-bound build."""
    key = ("afp", str(text_col))
    got = _BANDS_EXPR_CACHE.get(key)
    if got is not None:
        return got
    bands = []
    bits_per = AFP_BITS // AFP_BANDS
    for b in range(AFP_BANDS):
        acc = F.lit(0)
        for i in range(bits_per):
            p = b * bits_per + i
            bit = (
                _afp_frame_spark(text_col, p + 1) > _afp_frame_spark(text_col, p)
            ).cast("int")
            acc = acc + bit * (1 << i)
        bands.append(acc.cast("int").alias(f"f{b}"))
    _BANDS_EXPR_CACHE[key] = bands
    return bands


def _afp_bands_sql(text_expr: str) -> list[str]:
    bands = []
    bits_per = AFP_BITS // AFP_BANDS
    for b in range(AFP_BANDS):
        terms = []
        for i in range(bits_per):
            p = b * bits_per + i
            bit = (
                f"(CASE WHEN {_afp_frame_sql(text_expr, p + 1)}"
                f" > {_afp_frame_sql(text_expr, p)} THEN 1 ELSE 0 END)"
            )
            terms.append(f"{bit} * {1 << i}")
        bands.append("CAST(" + " + ".join(terms) + f" AS INTEGER) AS f{b}")
    return bands


def banded_hamming_pairs(
    signed: DataFrame, band_cols: list[str], max_hamming: int
) -> DataFrame:
    """Generic banded Hamming-LSH candidate/verify over integer band
    columns (generalizes dhash_candidate_pairs): docs sharing ANY band
    value are candidates — all pairs with hamming <= len(band_cols)-1
    are guaranteed found — then the exact XOR popcount verifies. One
    shuffle on (band_idx, band_value), never all-pairs."""
    n = len(band_cols)
    bands = signed.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("bi"), F.col(c).alias("bv"))
                    for i, c in enumerate(band_cols)
                ]
            )
        ).alias("e"),
    ).select("doc_id", "e.bi", "e.bv")
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["bi", "bv"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    a = signed.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(c).alias(f"xa{i}") for i, c in enumerate(band_cols)],
    )
    bsig = signed.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(c).alias(f"xb{i}") for i, c in enumerate(band_cols)],
    )
    ham = None
    for i in range(n):
        t = F.bit_count(F.col(f"xa{i}").bitwiseXOR(F.col(f"xb{i}")))
        ham = t if ham is None else ham + t
    return (
        cand.join(a, "doc_a")
        .join(bsig, "doc_b")
        .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def _afp_oracle() -> str:
    bands = ",\n           ".join(_afp_bands_sql("text"))
    return f"""
    SELECT doc_id,
           {bands}
    FROM documents
    WHERE doc_id % 3 = 1
    ORDER BY doc_id
    """


@_register("multimodal_audio_fingerprint", _afp_oracle())
def multimodal_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip audio fingerprint (2 x 16 energy-gradient bits) over
    the deterministically fake-decoded frame energies; pairing via
    `banded_hamming_pairs` (pinned on constructed duplicates in tests
    — this corpus has no duplicate audio payloads, so the oracle
    value-checks the signature arithmetic, exactly as the image dHash
    and simhash queries do).

    Scale shape: the signature is pure whole-stage codegen (3 md5
    calls + 33 hex slices per row); blobs never shuffle — only the two
    small band ints do, and candidates come from band-equality
    buckets."""
    from automated_dow30_earnings_reports_spark.tables import spread

    d = spread(load_table(spark, sf_dir, "documents")).filter(
        F.col("doc_id") % 3 == 1
    )
    return d.select("doc_id", *afp_bands_spark(F.col("text"))).orderBy("doc_id")
