"""Multimodal plumbing tests: schema shape, decode stub behavior, Arrow
batch integrity (payload bytes survive the boundary)."""

from __future__ import annotations

import pytest

from etl_python_airflow_bigquery_spark.operators.multimodal import (
    _byte_features,
    decode_media,
    media_features,
    media_from_documents,
)
from etl_python_airflow_bigquery_spark.tables import load_table


def test_decode_media_is_stubbed():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_media(b"\x00\x01", "jpeg")


def test_byte_features_deterministic():
    assert _byte_features(b"abc") == (3, ((97 * 31 + 98) * 31 + 99) % 2147483647)


def test_media_features_roundtrip(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = media_from_documents(docs)
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    feats = media_features(media).collect()
    assert len(feats) == 20
    by_id = {r["media_id"]: r for r in feats}
    for row in docs.collect():
        f = by_id[row["doc_id"]]
        assert f["n_bytes"] == len(row["text"].encode())
        assert f["checksum"] == _byte_features(row["text"].encode())[1]
