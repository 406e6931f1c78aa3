"""Multimodal column plumbing: binary payloads, decode stubs, frame sampling."""

import pytest
from pyspark.sql import functions as F

from kafka_streams_demo_spark.functions.multimodal import (
    FEATURE_DIM,
    attach_binary,
    decode_features,
    frame_sample,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine test document")],
        "doc_id long, text string",
    )


def test_attach_binary_schema_and_meta(spark):
    mm = attach_binary(_docs(spark))
    assert [f.name for f in mm.schema.fields] == ["doc_id", "payload", "meta"]
    row = mm.filter(F.col("doc_id") == 1).first()
    assert bytes(row["payload"]) == b"hello world"
    assert row["meta"]["modality"] == "image"
    assert row["meta"]["byte_len"] == 11
    assert len(row["meta"]["checksum"]) == 64  # sha256 hex


def test_decode_features_gated_without_fake(spark):
    mm = attach_binary(_docs(spark))
    with pytest.raises(NotImplementedError):
        decode_features(mm)


def test_decode_features_fake_deterministic(spark):
    mm = attach_binary(_docs(spark))
    a = decode_features(mm, fake=True).orderBy("doc_id").collect()
    b = decode_features(mm, fake=True).orderBy("doc_id").collect()
    assert [r["features"] for r in a] == [r["features"] for r in b]
    for r in a:
        assert len(r["features"]) == FEATURE_DIM
        assert abs(sum(r["features"]) - 1.0) < 1e-9  # L1-normalized


def test_frame_sample_fake(spark):
    mm = attach_binary(_docs(spark))
    with pytest.raises(NotImplementedError):
        frame_sample(mm)
    frames = frame_sample(mm, every_n_bytes=8, fake=True).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 11 bytes → frames of 8 and 3
    f1 = sorted(by_doc[1], key=lambda r: r["frame_no"])
    assert [r["frame_bytes"] for r in f1] == [8, 3]


def test_resize_stub_one_row_per_image_deterministic(spark):
    from kafka_streams_demo_spark.functions.multimodal import attach_binary, resize_images
    from kafka_streams_demo_spark.sources.registry import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    mm = attach_binary(docs)
    out = resize_images(mm, target_w=224, target_h=224, fake=True)
    rows = out.collect()
    assert len(rows) == docs.count()
    r0 = rows[0]
    assert r0["new_w"] == 224 and r0["new_h"] == 224
    assert 0 < r0["scale"] <= 224 / 64
    # deterministic across runs
    again = {r["doc_id"]: (r["orig_w"], r["orig_h"], r["scale"]) for r in out.collect()}
    first = {r["doc_id"]: (r["orig_w"], r["orig_h"], r["scale"]) for r in rows}
    assert again == first


def test_resize_without_fake_raises(spark):
    from kafka_streams_demo_spark.functions.multimodal import attach_binary, resize_images
    from kafka_streams_demo_spark.sources.registry import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    try:
        resize_images(attach_binary(docs))
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError:
        pass
