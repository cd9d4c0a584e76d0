"""Multimodal plumbing tests: binary payloads through mapInPandas."""

from __future__ import annotations

import hashlib

import pytest

from tabular_to_parquet_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return mm.attach_payload(docs).cache()


def test_attach_payload_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "payload", "media_type", "meta_width", "meta_height",
    ]
    assert media.schema["payload"].dataType.typeName() == "binary"
    assert media.count() == 500


def test_extract_features_matches_hashlib(spark, media):
    feats = {r.media_id: r for r in mm.extract_features(media).collect()}
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()}
    assert len(feats) == 500
    for doc_id in list(docs)[:20]:
        raw = docs[doc_id].encode()
        assert feats[doc_id].n_bytes == len(raw)
        assert feats[doc_id].payload_md5 == hashlib.md5(raw).hexdigest()
        assert feats[doc_id].header_hex == raw[:4].hex()
        assert feats[doc_id].decoded is False  # codec absent → stub path


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")


def test_sample_frames_bounded(media):
    frames = mm.sample_frames(media.limit(10), every_n_bytes=32, max_frames=4)
    rows = frames.collect()
    assert 10 <= len(rows) <= 40
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault(r.media_id, []).append(r.frame_no)
    for frames_nos in per_doc.values():
        assert frames_nos == sorted(frames_nos)
        assert len(frames_nos) <= 4


def test_resize_media_stub(spark):
    import hashlib

    from tabular_to_parquet_spark.operators import multimodal as mm

    df = spark.createDataFrame(
        [(1, "x" * 1000), (2, "short")], "doc_id long, text string"
    )
    out = {r.media_id: r for r in
           mm.resize_media(mm.attach_payload(df)).collect()}
    # stride = 1000 // 256 = 3 → ceil(1000/3) = 334 sampled bytes
    assert out[1].resized_n_bytes == 334
    assert out[1].resized_md5 == hashlib.md5((b"x" * 1000)[::3]).hexdigest()
    assert not out[1].decoded  # codec stub: fake path taken
    # payloads below the target pass through whole (stride 1)
    assert out[2].resized_n_bytes == 5
    assert out[2].resized_md5 == hashlib.md5(b"short").hexdigest()
