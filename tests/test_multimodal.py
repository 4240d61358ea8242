"""Multimodal binary-column plumbing: metadata, sniffing, stubbed
decode, frame sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_n3_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample_plan,
    media_metadata,
    sniff_mime,
)

PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
JPEG = b"\xff\xd8\xff\xe0" + b"\x00" * 16
TXT = b"hello world"


def _media(spark):
    return spark.createDataFrame(
        [(1, bytearray(PNG)), (2, bytearray(JPEG)), (3, bytearray(TXT))],
        "doc_id long, payload binary",
    )


def test_sniff_and_metadata(spark):
    rows = {r["doc_id"]: r for r in media_metadata(_media(spark)).collect()}
    assert rows[1]["mime"] == "image/png"
    assert rows[2]["mime"] == "image/jpeg"
    assert rows[3]["mime"] == "application/octet-stream"
    assert rows[3]["n_bytes"] == len(TXT)
    assert len(rows[1]["content_sha"]) == 64
    assert "payload" not in rows[1].asDict()


def test_fake_decode_deterministic(spark):
    d = _media(spark).withColumn("mime", sniff_mime(F.col("payload")))
    a = {r["doc_id"]: r["features"] for r in extract_features(d).collect()}
    b = {r["doc_id"]: r["features"] for r in extract_features(d).collect()}
    assert a == b
    assert all(len(v) == FEATURE_DIM for v in a.values())
    # unit-normalized
    assert abs(sum(x * x for x in a[1]) - 1.0) < 1e-3


def test_strict_mode_poisons_rows_not_job(spark):
    d = _media(spark).withColumn("mime", F.lit("image/png"))
    rows = extract_features(d, fake_decode=False).collect()
    assert len(rows) == 3
    assert all(not r["ok"] and r["features"] is None for r in rows)
    assert "no media codecs" in rows[0]["err"]


def test_frame_sample_plan(spark):
    d = spark.createDataFrame([(1, 8.0)], "doc_id long, duration_s double")
    rows = frame_sample_plan(d, n_frames=4).collect()
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]
    assert [r["frame_ts"] for r in rows] == [1.0, 3.0, 5.0, 7.0]
