"""Multimodal (image/audio/video) column plumbing.

Policy for a 100 TB training-data lake: media travel as opaque ``binary``
columns plus typed metadata; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` stages (vectorized transfer, no per-row
Python), partition-balanced upstream by a key hash so one hot shard of big
blobs cannot straggle a stage.

The actual codecs (PIL/libvips/ffmpeg) are NOT available in this
environment, so the decode kernel is STUBBED: ``decode_kernel`` raises
``NotImplementedError`` and the pipeline substitutes a clearly-marked
deterministic fake (dimensions derived from the payload digest). Everything
around it — binary schema, UDF signature, Arrow batch shape, output
StructType — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "with_binary_payload", "decode_kernel", "extract_media_features",
    "MEDIA_FEATURE_SCHEMA",
]

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("digest", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("decoder", StringType(), False),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text",
                        out_col: str = "payload") -> DataFrame:
    """Attach the opaque binary column (here: UTF-8 bytes of the text —
    the driver tables carry no real media; the schema shape is what's
    exercised)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def decode_kernel(payload: bytes) -> tuple[int, int]:
    """REAL decoder entry point — intentionally unimplemented: the image
    libraries are not in this container. Swap in PIL/libvips here."""
    raise NotImplementedError(
        "media decoding requires an image library not present in this "
        "environment; extract_media_features falls back to the "
        "deterministic fake decoder"
    )


def _fake_dims(digest_hex: str) -> tuple[int, int]:
    """Deterministic FAKE dimensions from the digest (clearly marked)."""
    w = 64 + int(digest_hex[:4], 16) % 1920
    h = 64 + int(digest_hex[4:8], 16) % 1080
    return w, h


def extract_media_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    target_partitions: int | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` receives an iterator of pandas batches (one Arrow batch
    each); the kernel runs per batch, vectorized where possible. The
    upstream repartition by id hash balances blob bytes across tasks.
    """
    src = df.select(id_col, payload_col)
    if target_partitions:
        src = src.repartition(target_partitions, F.col(id_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            digests = payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest())
            try:
                dims = [decode_kernel(bytes(b)) for b in payloads]
                decoder = "real"
            except NotImplementedError:
                dims = [_fake_dims(d) for d in digests]
                decoder = "stub-deterministic-fake"
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "digest": digests,
                    "width": pd.array([d[0] for d in dims], dtype="int32"),
                    "height": pd.array([d[1] for d in dims], dtype="int32"),
                    "decoder": decoder,
                }
            )

    return src.mapInPandas(run, MEDIA_FEATURE_SCHEMA)
