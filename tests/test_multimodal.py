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
