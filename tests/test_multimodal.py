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


def test_decode_real_is_gated():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"IMGv1:xxx")


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
