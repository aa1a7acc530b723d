"""Multimodal columns: opaque binary payloads + typed metadata.

Design for image/audio/video attachments riding along transcript turns at
100 TB: the payload is an opaque ``binary`` column (or an object-store URI
for large blobs), with a typed metadata struct (modality, codec, shape,
sample rate) maintained next to it. All heavy per-item work — decode,
resize, frame-sample, feature-extract — runs as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row by
row, and partitioning follows the parent table (conv/day) so attachment
ops co-locate with their turns.

The decode kernels themselves are STUBBED in this environment (no
image/audio libraries in the container — clearly marked below); the
Spark-side plumbing (schema, batch iteration, deterministic fake features,
partition behavior) is real and tested. Swapping a real decoder in changes
one function.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def attach_fake_media(df: DataFrame, id_cols: list[str], modality: str = "image") -> DataFrame:
    """Deterministic synthetic payloads for testing the plumbing: the blob
    is a seeded function of the id columns (so any partitioning produces
    identical bytes)."""
    h = F.abs(F.xxhash64(*[F.col(c) for c in id_cols]))
    blob = F.sha2(F.concat_ws("|", *[F.col(c).cast("string") for c in id_cols]), 256).cast("binary")
    meta = F.struct(
        F.lit(modality).alias("modality"),
        F.lit("fake/1").alias("codec"),
        (h % 640 + 16).cast("int").alias("width"),
        (h % 480 + 16).cast("int").alias("height"),
        (h % 30 + 1).cast("int").alias("n_frames"),
        F.lit(16000).cast("int").alias("sample_rate"),
    )
    return df.withColumn("media", blob).withColumn("media_meta", meta)


def _decode_stub(blob: bytes, meta: dict) -> np.ndarray:
    """STUB — the real implementation would be e.g. PIL/torchaudio/ffmpeg
    decode. This container has no media libraries, so we derive a
    deterministic fake feature map from the bytes; the signature and batch
    shape are what a real decoder must satisfy."""
    if blob is None:
        raise NotImplementedError("real decode requires a media library; got empty payload")
    rng = np.frombuffer(blob[:32], dtype=np.uint8).astype(np.float64)
    return rng / 255.0


def extract_features(
    df: DataFrame,
    id_cols: list[str],
    media_col: str = "media",
    meta_col: str = "media_meta",
    dim: int = 16,
) -> DataFrame:
    """binary payload → fixed-dim float feature vector, Arrow-batched.

    Output: id_cols + ``feature array<double>`` + ``feat_norm double``.
    One ``mapInPandas`` pass; batches of blobs decode vectorized-per-batch,
    no shuffle (features are per-row)."""
    id_struct = [F.col(c) for c in id_cols]
    narrow = df.select(*id_struct, F.col(media_col).alias("__blob"), F.col(f"{meta_col}.modality").alias("__mod"))
    by_name = {f.name: f.dataType.simpleString() for f in narrow.schema.fields}
    key_schema = ", ".join(f"{c} {by_name[c]}" for c in id_cols)
    schema = f"{key_schema}, feature array<double>, feat_norm double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = []
            for blob, mod in zip(pdf["__blob"], pdf["__mod"]):
                raw = _decode_stub(bytes(blob), {"modality": mod})
                v = np.resize(raw, dim)
                feats.append(v.tolist())
            out = pdf[id_cols].copy()
            out["feature"] = feats
            out["feat_norm"] = [float(np.sqrt(np.dot(np.array(f), np.array(f)))) for f in feats]
            yield out

    return narrow.mapInPandas(run, schema)


def frame_sample(
    df: DataFrame,
    id_cols: list[str],
    meta_col: str = "media_meta",
    every_n: int = 10,
) -> DataFrame:
    """Video frame sampling schedule: explode frame indices 0, n, 2n, …
    per clip — pure column math (the real pipeline feeds these indices to
    the decode stage), no UDF."""
    n_frames = F.col(f"{meta_col}.n_frames")
    idxs = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select(*[F.col(c) for c in id_cols], F.explode(idxs).alias("frame_idx"))
