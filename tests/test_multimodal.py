"""Multimodal plumbing: binary payload schema, Arrow mapInPandas batch
shape, deterministic stub decode, digest parity with JVM-side sha2."""

from __future__ import annotations

import pytest

from etl_spark.operators.multimodal import (
    decode_kernel,
    extract_media_features,
    with_binary_payload,
)


def test_decode_kernel_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_kernel(b"\x89PNG")


def test_extract_media_features(spark, sf_dir="/root/testdata/sf0.001"):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payloads = with_binary_payload(docs)
    assert dict(payloads.dtypes)["payload"] == "binary"

    feats = extract_media_features(payloads, target_partitions=4)
    rows = feats.collect()
    assert len(rows) == docs.count()
    r = rows[0]
    assert r["n_bytes"] > 0 and len(r["digest"]) == 64
    assert r["decoder"] == "stub-deterministic-fake"
    assert 64 <= r["width"] < 64 + 1920 and 64 <= r["height"] < 64 + 1080

    # deterministic: same input -> same fake dims
    again = {x["doc_id"]: (x["width"], x["height"])
             for x in extract_media_features(payloads).collect()}
    assert all(again[x["doc_id"]] == (x["width"], x["height"]) for x in rows)

    # python-side sha256 digest == JVM-side sha2 over the same binary
    from pyspark.sql import functions as F

    jvm = {x["doc_id"]: x["d"] for x in payloads.select(
        "doc_id", F.sha2(F.col("payload"), 256).alias("d")).collect()}
    assert all(jvm[x["doc_id"]] == x["digest"] for x in rows)


def test_resize_media_stub_plumbing(spark, sf_dir="/root/testdata/sf0.001"):
    import hashlib

    from etl_spark.operators.multimodal import resize_kernel, resize_media

    with pytest.raises(NotImplementedError):
        resize_kernel(b"\x89PNG", 224, 224)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    payloads = with_binary_payload(docs)
    out = resize_media(payloads, 224, 224, target_partitions=4)
    assert dict(out.dtypes)["payload"] == "binary"
    rows = out.collect()
    assert len(rows) == 20
    src = {r["doc_id"]: bytes(r["payload"]) for r in payloads.collect()}
    for r in rows:
        assert (r["width"], r["height"]) == (224, 224)
        assert r["decoder"] == "stub-deterministic-fake"
        want = hashlib.sha256(src[r["doc_id"]] + b"|resize:224x224").digest()
        assert bytes(r["payload"]) == want


def test_sample_frames_fan_out(spark, sf_dir="/root/testdata/sf0.001"):
    import hashlib

    from etl_spark.operators.multimodal import frame_sample_kernel, sample_frames

    with pytest.raises(NotImplementedError):
        frame_sample_kernel(b"\x00video", 1000)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    payloads = with_binary_payload(docs)
    frames = sample_frames(payloads, every_ms=500, target_partitions=4)
    rows = frames.collect()
    src = {r["doc_id"]: bytes(r["payload"]) for r in payloads.collect()}
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, raw in src.items():
        fs = sorted(per_doc[doc_id], key=lambda r: r["frame_idx"])
        assert len(fs) == 1 + len(raw) % 4          # deterministic fan-out
        for j, fr in enumerate(fs):
            assert fr["frame_idx"] == j and fr["ts_ms"] == j * 500
            want = hashlib.sha256(raw + f"|frame:{j}".encode()).digest()
            assert bytes(fr["frame"]) == want
