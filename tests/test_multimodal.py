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
