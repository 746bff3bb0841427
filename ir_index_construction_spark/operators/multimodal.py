"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video are carried as opaque BINARY columns with a typed
metadata struct; decode / feature-extraction run as Arrow-batched
mapInPandas.  The sandbox has no image/audio libraries, so the actual
codec step is STUBBED (NotImplementedError) behind ``decode="real"``,
and ``decode="fake"`` substitutes a deterministic byte-level featurizer
— the Spark-side plumbing (schema, batch shape, partitioning, UDF
signature) is real and tested; swapping in PIL/torchaudio is a
one-function change.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_META = StructType([
    StructField("format", StringType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("channels", IntegerType(), False),
])

MEDIA_FEATURES = StructType([
    StructField("id", LongType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("content_hash", StringType(), False),
    StructField("feature", ArrayType(FloatType()), False),
])

N_FEATURES = 8


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministically synthesize a media column from text (the tests'
    stand-in for real image bytes): payload = utf-8 bytes, metadata
    derived from content length.  Schema matches a real media table."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("id"),
        payload.alias("media"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            (F.octet_length(payload) % 640 + 1).cast("int").alias("width"),
            (F.octet_length(payload) % 480 + 1).cast("int").alias("height"),
            F.lit(3).alias("channels"),
        ).alias("meta"),
    )


def decode_media_real(payload: bytes, fmt: str):
    """Real decoder stub — requires pillow / torchaudio / pyav, none of
    which exist in this sandbox.  The call signature and the batch shape
    around it are the contract."""
    raise NotImplementedError(
        f"decoding {fmt!r} requires an image/audio codec library "
        "(pillow/torchaudio/pyav) which is not available in this environment"
    )


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in featurizer: md5 bytes -> N_FEATURES floats
    in [0, 1).  Pure bytes -> vector, so the pipeline shape (Arrow batch
    in, fixed-width embedding out) matches a real model head."""
    digest = hashlib.md5(payload).digest()
    return (np.frombuffer(digest[:N_FEATURES * 2], np.uint16)
            .astype(np.float32) / 65536.0)


def extract_media_features(media_df: DataFrame, decode: str = "fake") -> DataFrame:
    """mapInPandas featurizer over (id, media, meta) batches ->
    MEDIA_FEATURES.  ``decode='real'`` exercises the stub path."""

    def featurize(batches):
        for pdf in batches:
            feats, hashes, sizes = [], [], []
            for payload in pdf["media"]:
                raw = bytes(payload)
                if decode == "real":
                    decode_media_real(raw, "fake/raw")
                sizes.append(len(raw))
                hashes.append(hashlib.md5(raw).hexdigest())
                feats.append(_fake_features(raw))
            yield pd.DataFrame({
                "id": pdf["id"],
                "n_bytes": pd.Series(sizes, dtype="int64"),
                "content_hash": hashes,
                "feature": feats,
            })

    return media_df.mapInPandas(featurize, schema=MEDIA_FEATURES)


def frame_sample_plan(media_df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode a (deterministic) frame
    index range per media row — the real pipeline would decode those
    frame offsets.  Native explode; no Python."""
    n_frames = (F.octet_length("media") % 300 + 1).cast("int")
    return media_df.select(
        "id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n)))
        .alias("frame_idx"),
    )
