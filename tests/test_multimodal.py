"""Multimodal binary-column plumbing (decode itself is stubbed)."""

import pytest

from maillogsentinel_spark.operators.multimodal import (
    attach_binary,
    decode_image,
    extract_features,
    fake_feature_extractor,
)


def test_attach_and_extract(spark):
    docs = spark.createDataFrame([(1, "abc"), (2, "Ωmega")], ["doc_id", "text"])
    media = attach_binary(docs)
    row = {r["media_id"]: r for r in media.collect()}
    assert bytes(row[1]["payload"]) == b"abc"
    assert row[1]["meta"]["mime"] == "text/plain"
    assert row[2]["meta"]["n_bytes"] == len("Ωmega".encode())  # bytes, not chars

    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert feats[1]["features"] == [3.0, float(b"a"[0]), float(b"c"[0])]
    assert feats[1]["n_bytes"] == 3


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_fake_extractor_empty():
    assert fake_feature_extractor(b"") == [0.0, 0.0, 0.0]


def test_resize_media_propagates_meta(spark):
    from maillogsentinel_spark.operators.multimodal import resize_media

    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xy")], ["doc_id", "text"]
    )
    media = attach_binary(docs)
    out = {r["media_id"]: r for r in resize_media(media, 2, 3).collect()}
    # 2x3 -> 6 bytes: truncation and zero-padding
    assert bytes(out[1]["payload"]) == b"abcdef"
    assert bytes(out[2]["payload"]) == b"xy\x00\x00\x00\x00"
    assert out[1]["meta"]["width"] == 2 and out[1]["meta"]["height"] == 3
    assert out[1]["meta"]["n_bytes"] == 6
    assert out[1]["meta"]["mime"] == "text/plain"


def test_sample_frames_fan_out(spark):
    from maillogsentinel_spark.operators.multimodal import sample_frames

    docs = spark.createDataFrame([(1, "a" * 70), (2, "b" * 10)], ["doc_id", "text"])
    media = attach_binary(docs)
    # frame_size 16 -> doc1 has frames 0..4 (ceil(70/16)=5), every 2nd -> 0,2,4
    rows = sample_frames(media, every_nth=2, frame_size=16).collect()
    got = {(r["media_id"], r["frame_idx"]): bytes(r["frame"]) for r in rows}
    assert sorted(k for k in got if k[0] == 1) == [(1, 0), (1, 2), (1, 4)]
    assert got[(1, 4)] == b"a" * 6  # tail frame is short, not padded
    assert sorted(k for k in got if k[0] == 2) == [(2, 0)]
