"""Multimodal plumbing: schema, determinism, stubbed decode contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from text_indexer_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    frame_sample,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"document body number {i} with some payload text") for i in range(30)],
        "doc_id long, text string",
    )
    return synthesize_media(docs).cache()


def test_media_schema_and_kinds(media):
    rows = media.collect()
    assert len(rows) == 30
    assert {r["kind"] for r in rows} == {"image", "audio", "video"}
    assert all(r["n_bytes"] > 0 for r in rows)
    assert all(len(r["sha256"]) == 64 for r in rows)


def test_decode_strict_raises(media):
    with pytest.raises(NotImplementedError, match="media decoding"):
        decode_media(media, strict=True)


def test_decode_fake_deterministic(media):
    a = {r["media_id"]: r for r in decode_media(media).collect()}
    b = {r["media_id"]: r for r in decode_media(media).collect()}
    assert len(a) == 30
    for mid in a:
        assert a[mid]["feature"] == b[mid]["feature"]
        assert len(a[mid]["feature"]) == FEATURE_DIM
        assert a[mid]["width"] >= 1 and a[mid]["height"] >= 1
        if a[mid]["kind"] != "video":
            assert a[mid]["n_frames"] == 1


def test_frame_sample(media):
    decoded = decode_media(media)
    frames = frame_sample(decoded, every_n=5)
    rows = frames.collect()
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    dec = {r["media_id"]: r for r in decoded.collect()}
    for mid, idxs in per.items():
        if dec[mid]["kind"] == "video":
            exp = list(range(0, dec[mid]["n_frames"], 5))
            assert sorted(idxs) == exp
        else:
            assert idxs == [0]
