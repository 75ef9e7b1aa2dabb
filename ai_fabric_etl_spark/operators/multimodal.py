"""Multimodal columns: images/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas functions.

The decode step is STUBBED (no image/audio libraries in this
container): ``decode_image_stub`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake decode
so the Spark-side plumbing — schema, batch shape, partitioning, UDF
signature — is real and tested. Swapping in PIL/libsndfile later only
changes the stub body.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("source", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("content_digest", StringType()),
    ]
)


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a media table from the documents fixture: utf-8 payload
    bytes + typed metadata. At scale this is the schema a binary-file
    ingest (S1/S2) would produce."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias("n_bytes"),
        F.col("source"),
    )


def decode_image_stub(payload: bytes, fake: bool) -> tuple[int, int, int]:
    """Decode stub. Real implementation would be PIL.Image.open; the
    deterministic fake derives dimensions from the payload digest so
    tests exercise real data flow."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library not present in "
            "this environment; call with fake=True for plumbing tests"
        )
    d = hashlib.md5(payload).digest()
    return (64 + d[0] % 192, 64 + d[1] % 192, 1 + d[2] % 3)


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode pass: Arrow-batched, one python worker per
    partition, constant memory per batch regardless of table size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "mime_type": pdf["mime_type"],
                "n_bytes": pdf["n_bytes"],
                "width": [],
                "height": [],
                "channels": [],
                "content_digest": [],
            }
            for payload in pdf["payload"]:
                w, h, c = decode_image_stub(bytes(payload), fake=fake)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["content_digest"].append(hashlib.md5(bytes(payload)).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_features(media: DataFrame, dim: int = 16, fake: bool = True) -> DataFrame:
    """Feature-extraction pass: payload bytes -> float vector
    (``array<float>``), Arrow-batched. The real body would run an
    image/audio encoder; the deterministic fake expands the content
    digest into ``dim`` floats in [-1, 1] so the output feeds the
    similarity operators (brute-force/LSH/IVF top-k) unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if not fake:
                    raise NotImplementedError(
                        "feature extraction requires an encoder not present "
                        "in this environment; call with fake=True"
                    )
                raw = hashlib.sha256(bytes(payload)).digest()
                need = (dim + len(raw) - 1) // len(raw)
                raw = (raw * need)[:dim]
                feats.append([b / 127.5 - 1.0 for b in raw])
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.select("media_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_media(
    media: DataFrame, width: int = 224, height: int = 224, fake: bool = True
) -> DataFrame:
    """Resize pass: payload -> payload' at (width, height), keeping the
    MEDIA_SCHEMA shape so passes compose. The fake emits a
    deterministic width*height-byte payload derived from the content
    digest; a real body would decode-resize-reencode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for payload in pdf["payload"]:
                if not fake:
                    raise NotImplementedError(
                        "resize requires an imaging library not present in "
                        "this environment; call with fake=True"
                    )
                seed = hashlib.sha256(bytes(payload)).digest()
                need = width * height
                reps = (need + len(seed) - 1) // len(seed)
                payloads.append((seed * reps)[:need])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime_type": pdf["mime_type"],
                    "n_bytes": [len(p) for p in payloads],
                    "source": pdf["source"],
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_index)
    rows for a downstream decode. Frame count is stubbed as
    n_bytes/1024 (a real container parser would read the header)."""
    n_frames = F.greatest((F.col("n_bytes") / 1024).cast("int"), F.lit(1))
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_index"),
    )
