"""Multimodal binary-column plumbing (SURVEY §2.11): typed blobs,
decode dead-letter, real-decoder stub gate, frame/feature shapes."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.operators.multimodal import (
    audio_feature_stage,
    decode_image_fake,
    decode_image_real,
    image_decode_stage,
    with_blob,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(0, "hello image doc"), (1, "audio doc"), (2, "video doc body")],
        ["doc_id", "text"],
    )


def test_with_blob_types_and_header(spark, docs):
    rows = {r.doc_id: r for r in with_blob(docs).collect()}
    assert rows[0].media_kind == "image" and bytes(rows[0].blob).startswith(b"IMGv1:")
    assert rows[1].media_kind == "audio" and bytes(rows[1].blob).startswith(b"AUDv1:")
    assert rows[2].media_kind == "video"
    assert rows[0].byte_len == 6 + len("hello image doc")
    # binary column type survives the plan
    assert dict(with_blob(docs).dtypes)["blob"] == "binary"


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_decode_real_is_gated():
    """Without Pillow, decode_image_real raises NotImplementedError
    (the import gate); with it, a junk payload raises PIL's own decode
    error. Either way the failure is catchable — image_decode_stage
    dead-letters it instead of failing the task."""
    if _pil_available():
        with pytest.raises(Exception):
            decode_image_real(b"IMGv1:xxx")  # not a real container
    else:
        with pytest.raises(NotImplementedError):
            decode_image_real(b"IMGv1:xxx")


def _tiny_png(width: int, height: int) -> bytes:
    """Assemble a real, spec-valid RGBA PNG with stdlib only (correct
    CRCs and zlib-compressed scanlines) — no Pillow needed to BUILD it."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x7f\x00\xff\xff" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_decode_real_pixels_when_pil_present():
    """Pinned real-decode path: a genuine PNG decodes to its true
    dimensions. Skips (does not pass vacuously) where Pillow is not
    installed."""
    pytest.importorskip("PIL")
    w, h, mode = decode_image_real(_tiny_png(5, 3))
    assert (w, h, mode) == (5, 3, "RGBA")


def test_default_image_decoder_gate():
    from automated_dow30_earnings_reports_spark.operators.multimodal import (
        default_image_decoder,
    )

    picked = default_image_decoder()
    if _pil_available():
        assert picked is decode_image_real
    else:
        assert picked is decode_image_fake


def test_decode_real_dead_letters_without_pil(spark, docs):
    """Running the stage with the REAL decoder in a PIL-less container
    must produce decode_error rows, not task failures."""
    if _pil_available():
        pytest.skip("PIL installed; the no-PIL dead-letter path is moot")
    out = image_decode_stage(with_blob(docs), decoder=decode_image_real).collect()
    assert out and all(r.decode_error is not None for r in out)
    assert all("PIL" in r.decode_error for r in out)


def test_image_decode_dead_letter(spark, docs):
    blobs = with_blob(docs)  # includes audio/video blobs -> decoder errors
    out = {r.doc_id: r for r in image_decode_stage(blobs).collect()}
    assert out[0].decode_error is None and out[0].mode == "RGB"
    n = len("hello image doc")
    assert (out[0].width, out[0].height) == (n % 640 + 16, n % 480 + 16)
    assert out[0].resized_w == 64 and out[0].resized_h == max(1, out[0].height * 64 // out[0].width)
    assert out[1].decode_error is not None and out[1].width is None
    assert out[2].decode_error is not None


def test_decode_fake_matches_contract():
    w, h, mode = decode_image_fake(b"IMGv1:" + b"x" * 100)
    assert (w, h, mode) == (100 % 640 + 16, 100 % 480 + 16, "RGB")
    with pytest.raises(ValueError):
        decode_image_fake(b"AUDv1:zzz")


def test_audio_features_vectorized(spark, docs):
    blobs = with_blob(docs).filter(F.col("media_kind") == "audio")
    rows = audio_feature_stage(blobs).collect()
    assert len(rows) == 1
    payload = b"AUDv1:" + b"audio doc"
    assert rows[0].n_bytes == len(payload)
    assert rows[0].energy == sum(payload)
    assert rows[0].peak == max(payload)


# ---------------------------------------------------------------------------
# parse_image_header: real container bytes for all four formats
# ---------------------------------------------------------------------------


def _real_png(w, h):
    import struct
    import zlib

    ihdr = struct.pack(">II5B", w, h, 8, 6, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )


def test_parse_header_png_real_bytes():
    from automated_dow30_earnings_reports_spark.operators.multimodal import (
        parse_image_header,
    )

    assert parse_image_header(_real_png(640, 480)) == (640, 480, "png")
    assert parse_image_header(_real_png(1, 1)) == (1, 1, "png")


def test_parse_header_gif_bmp():
    import struct

    from automated_dow30_earnings_reports_spark.operators.multimodal import (
        parse_image_header,
    )

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    assert parse_image_header(gif) == (320, 200, "gif")

    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 800, -600) + b"\x00" * 8
    assert parse_image_header(bmp) == (800, 600, "bmp")  # top-down DIB abs()


def test_parse_header_jpeg_sof_scan():
    import struct

    from automated_dow30_earnings_reports_spark.operators.multimodal import (
        parse_image_header,
    )

    # SOI + APP0 (JFIF) + SOF0: the parser must skip the APP0 segment
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 1080, 1920, 3)
    jpeg = b"\xff\xd8" + app0 + sof0 + b"\x00" * 4
    assert parse_image_header(jpeg) == (1920, 1080, "jpeg")


def test_parse_header_rejects_garbage():
    import pytest as _pytest

    from automated_dow30_earnings_reports_spark.operators.multimodal import (
        parse_image_header,
    )

    with _pytest.raises(ValueError):
        parse_image_header(b"not an image at all")


def test_multimodal_image_header_query(spark, sf_smoke):
    from automated_dow30_earnings_reports_spark.operators.multimodal import (
        multimodal_image_header,
    )

    rows = multimodal_image_header(spark, sf_smoke).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.fmt == "png"
        assert r.width == r.doc_id % 640 + 16
        assert r.height == r.doc_id % 480 + 16


def test_parse_audio_header_stdlib_wave_roundtrip(tmp_path):
    """Parse a GENUINE wav file written by the stdlib wave module."""
    import wave

    from automated_dow30_earnings_reports_spark.operators.multimodal import (
        parse_audio_header,
    )

    p = str(tmp_path / "t.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(b"\x00\x01" * 64)
    data = open(p, "rb").read()
    assert parse_audio_header(data) == (2, 44100, 16, "wav")


def test_parse_audio_header_skips_leading_chunks():
    import struct

    from automated_dow30_earnings_reports_spark.operators.multimodal import (
        parse_audio_header,
    )

    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    wav = b"RIFF" + struct.pack("<I", 36) + b"WAVE" + lst + fmt
    assert parse_audio_header(wav) == (1, 8000, 16, "wav")


def test_multimodal_audio_header_query(spark, sf_smoke):
    from automated_dow30_earnings_reports_spark.operators.multimodal import (
        multimodal_audio_header,
    )

    rows = multimodal_audio_header(spark, sf_smoke).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.fmt == "wav" and r.bits == 16
        assert r.channels == r.doc_id % 2 + 1
        assert r.sample_rate == 8000 + (r.doc_id % 6) * 8000


def test_parse_video_header_box_walk():
    import struct

    from automated_dow30_earnings_reports_spark.operators.multimodal import (
        parse_video_header,
    )

    def mk(ts, dur, ver=0, with_free=False):
        ftyp = struct.pack(">I", 16) + b"ftypisom" + b"\x00" * 4
        if ver == 0:
            body = b"\x00\x00\x00\x00" + b"\x00" * 8 + struct.pack(">II", ts, dur) + b"\x00" * 80
        else:
            body = (
                b"\x01\x00\x00\x00" + b"\x00" * 16
                + struct.pack(">I", ts) + struct.pack(">Q", dur) + b"\x00" * 80
            )
        mvhd = struct.pack(">I", 8 + len(body)) + b"mvhd" + body
        moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
        out = ftyp
        if with_free:  # free box between ftyp and moov must be skipped
            out += struct.pack(">I", 8) + b"free"
        return out + moov

    assert parse_video_header(mk(600, 1800)) == ("isom", 600, 1800, "mp4")
    assert parse_video_header(mk(90000, 2**33, ver=1)) == ("isom", 90000, 2**33, "mp4")
    assert parse_video_header(mk(600, 1200, with_free=True)) == ("isom", 600, 1200, "mp4")

    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_video_header(b"garbage bytes here!!")


def test_multimodal_video_header_query(spark, sf_smoke):
    from automated_dow30_earnings_reports_spark.operators.multimodal import (
        multimodal_video_header,
    )

    rows = multimodal_video_header(spark, sf_smoke).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.major_brand == "isom" and r.timescale == 600
        assert r.duration_sec == r.doc_id % 300 + 1
        assert r.duration == r.duration_sec * 600


def test_parse_header_jpeg_fill_bytes_before_sof():
    """0xFF fill/padding bytes between segments are legal (ITU T.81
    B.1.1.2); the scanner must step over them instead of reading a
    bogus length."""
    import struct

    from automated_dow30_earnings_reports_spark.operators.multimodal import (
        parse_image_header,
    )

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 600, 800, 3)
    jpeg = b"\xff\xd8" + app0 + b"\xff\xff\xff" + sof0 + b"\x00" * 4
    assert parse_image_header(jpeg) == (800, 600, "jpeg")


def test_parse_audio_header_truncated_fmt_raises():
    import struct

    import pytest as _pytest

    from automated_dow30_earnings_reports_spark.operators.multimodal import (
        parse_audio_header,
    )

    # fmt chunk claims only 8 bytes — malformed, must not return garbage
    fmt = b"fmt " + struct.pack("<I", 8) + b"\x00" * 8
    wav = b"RIFF" + struct.pack("<I", 20) + b"WAVE" + fmt
    with _pytest.raises(ValueError):
        parse_audio_header(wav)


def test_dhash_identical_payloads_pair_at_zero(spark):
    """Identical fake-decoded images must collide on every band and
    verify at hamming 0; unrelated payloads must not pair at <=3."""
    from automated_dow30_earnings_reports_spark.operators.multimodal import (
        dhash_bands_spark,
        dhash_candidate_pairs,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (3, "the quick brown fox jumps over the lazy dog"),
            (6, "completely different payload bytes here"),
        ],
        "doc_id long, text string",
    )
    signed = df.select("doc_id", *dhash_bands_spark(F.col("text")))
    pairs = dhash_candidate_pairs(signed, max_hamming=3).collect()
    assert len(pairs) == 1
    assert (pairs[0].doc_a, pairs[0].doc_b, pairs[0].hamming) == (0, 3, 0)


def test_dhash_band_range(spark, sf_correctness):
    """Bands are 16-bit non-negative ints for every image doc."""
    from automated_dow30_earnings_reports_spark.operators.multimodal import (
        multimodal_image_dhash,
    )

    rows = multimodal_image_dhash(spark, sf_correctness).collect()
    assert rows
    for r in rows:
        for b in (r.b0, r.b1, r.b2, r.b3):
            assert 0 <= b < 65536


def test_audio_fingerprint_banded_pairs(spark):
    """Constructed duplicate clips pair at hamming 0; a clip differing
    in one gradient bit still pairs (<= 1 guaranteed by 2 bands); an
    unrelated clip does not pair."""
    from automated_dow30_earnings_reports_spark.operators.multimodal import (
        afp_bands_spark,
        banded_hamming_pairs,
    )

    df = spark.createDataFrame(
        [(0, "clip payload alpha"), (1, "clip payload alpha"), (2, "totally different clip")],
        "doc_id long, text string",
    )
    signed = df.select("doc_id", *afp_bands_spark(F.col("text")))
    pairs = banded_hamming_pairs(signed, ["f0", "f1"], max_hamming=1).collect()
    assert [(p.doc_a, p.doc_b, p.hamming) for p in pairs] == [(0, 1, 0)]
    # flip one bit of doc 1's f0 band -> still found via the f1 band
    rows = {r.doc_id: (r.f0, r.f1) for r in signed.collect()}
    near = spark.createDataFrame(
        [(0, *rows[0]), (1, rows[1][0] ^ 1, rows[1][1])],
        "doc_id long, f0 int, f1 int",
    )
    got = banded_hamming_pairs(near, ["f0", "f1"], max_hamming=1).collect()
    assert [(p.doc_a, p.doc_b, p.hamming) for p in got] == [(0, 1, 1)]
