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
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "with_binary_payload", "decode_kernel", "extract_media_features",
    "resize_kernel", "resize_media", "frame_sample_kernel", "sample_frames",
    "MEDIA_FEATURE_SCHEMA", "RESIZED_SCHEMA", "FRAME_SCHEMA",
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


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("decoder", StringType(), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("frame", BinaryType(), False),
        StructField("decoder", StringType(), False),
    ]
)


def resize_kernel(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize entry point — intentionally unimplemented (no PIL/vips
    in this container). Swap in the codec here."""
    raise NotImplementedError(
        "media resize requires an image library not present in this "
        "environment; resize_media falls back to the deterministic fake"
    )


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    target_partitions: int | None = None,
) -> DataFrame:
    """Arrow-batched binary→binary resize stage (image normalization for a
    training pipeline). Real plumbing — schema, batch shape, partition
    balancing — with the codec stubbed: the fake output payload is the
    sha256 of (input payload, target dims), deterministic and clearly not
    an image."""
    src = df.select(id_col, payload_col)
    if target_partitions:
        src = src.repartition(target_partitions, F.col(id_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            decs = []  # per ROW: a partial real-codec fallback must not
            #            retroactively mislabel rows it actually resized
            for b in pdf[payload_col]:
                raw = bytes(b)
                try:
                    out.append(resize_kernel(raw, width, height))
                    decs.append("real")
                except NotImplementedError:
                    decs.append("stub-deterministic-fake")
                    out.append(hashlib.sha256(
                        raw + f"|resize:{width}x{height}".encode()).digest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": out,
                    "width": pd.array([width] * len(out), dtype="int32"),
                    "height": pd.array([height] * len(out), dtype="int32"),
                    "decoder": decs,
                }
            )

    return src.mapInPandas(run, RESIZED_SCHEMA)


def frame_sample_kernel(payload: bytes, every_ms: int) -> list[bytes]:
    """REAL frame-extraction entry point — intentionally unimplemented
    (no ffmpeg in this container)."""
    raise NotImplementedError(
        "frame sampling requires ffmpeg, not present in this environment; "
        "sample_frames falls back to the deterministic fake"
    )


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    target_partitions: int | None = None,
) -> DataFrame:
    """Video → sampled frames as a 1:N Arrow ``mapInPandas`` stage (the
    kernel yields several output rows per input row — the frame fan-out a
    video curation pipeline needs). Stubbed codec: the fake samples
    1 + (n_bytes mod 4) frames, each frame payload = sha256(payload, idx),
    timestamps at ``every_ms`` spacing — deterministic, schema-true."""
    src = df.select(id_col, payload_col)
    if target_partitions:
        src = src.repartition(target_partitions, F.col(id_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames, decs = [], [], [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(b)
                try:
                    fs = frame_sample_kernel(raw, every_ms)
                    dec = "real"
                except NotImplementedError:
                    n = 1 + len(raw) % 4
                    fs = [hashlib.sha256(raw + f"|frame:{j}".encode()).digest()
                          for j in range(n)]
                    dec = "stub-deterministic-fake"
                for j, fr in enumerate(fs):
                    ids.append(int(i))
                    idxs.append(j)
                    tss.append(j * every_ms)
                    frames.append(fr)
                    decs.append(dec)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "ts_ms": pd.array(tss, dtype="int64"),
                    "frame": frames,
                    "decoder": decs,
                }
            )

    return src.mapInPandas(run, FRAME_SCHEMA)
