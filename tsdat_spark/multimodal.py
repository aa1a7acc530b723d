"""Multimodal columns: opaque binary payloads + typed metadata.

Design for image/audio/video attachments riding along transcript turns at
100 TB: the payload is an opaque ``binary`` column (or an object-store URI
for large blobs), with a typed metadata struct (modality, codec, shape,
sample rate) maintained next to it. All heavy per-item work — decode,
resize, frame-sample, feature-extract — runs as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row by
row, and partitioning follows the parent table (conv/day) so attachment
ops co-locate with their turns.

Decode is REAL for the dependency-free formats implemented in
:mod:`tsdat_spark.media` (binary PPM, 24-bit BMP, PCM-16 WAV — pure numpy
parsers): ``extract_features`` runs a true bytes→array→descriptor kernel
for those codecs. Codecs that genuinely need external libraries (JPEG,
MP4, …) raise ``MediaError`` at the same dispatch point a real deployment
would swap PIL/ffmpeg into; the legacy ``fake/1`` codec keeps a
deterministic hash-derived feature for plumbing/partitioning tests.
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


def attach_synth_media(
    df: DataFrame, id_cols: list[str], codec: str = "image/ppm",
    width: int = 32, height: int = 24, n_samples: int = 4000,
) -> DataFrame:
    """Deterministic REAL payloads (PPM/WAV bytes seeded by the id columns)
    for exercising the true decode path at test scale. Arrow-batched; any
    partitioning yields identical bytes per id."""
    from .media import encode_ppm, encode_wav

    narrow = df.select(*[F.col(c) for c in id_cols],
                       F.abs(F.xxhash64(*[F.col(c) for c in id_cols])).alias("__seed"))
    by_name = {f.name: f.dataType.simpleString() for f in narrow.schema.fields}
    key_schema = ", ".join(f"{c} {by_name[c]}" for c in id_cols)
    schema = f"{key_schema}, media binary, media_meta struct<modality:string,codec:string,width:int,height:int,n_frames:int,sample_rate:int>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            blobs, metas = [], []
            for seed in pdf["__seed"]:
                rng = np.random.default_rng(int(seed) % (2**63))
                if codec.startswith("image/"):
                    img = rng.integers(0, 256, (height, width, 3), dtype=np.uint8)
                    blobs.append(encode_ppm(img))
                    metas.append(("image", codec, width, height, 1, 0))
                else:
                    wave = rng.uniform(-0.8, 0.8, n_samples)
                    blobs.append(encode_wav(wave, 16000))
                    metas.append(("audio", codec, 0, 0, 0, 16000))
            out = pdf[id_cols].copy()
            out["media"] = blobs
            out["media_meta"] = [
                {"modality": m[0], "codec": m[1], "width": m[2], "height": m[3],
                 "n_frames": m[4], "sample_rate": m[5]} for m in metas
            ]
            yield out

    return narrow.mapInPandas(run, schema)


def _decode_features(blob: bytes, codec: str, dim: int) -> np.ndarray:
    """Real decode for the numpy-native formats; ``fake/1`` keeps the
    deterministic hash-feature path for plumbing tests; anything else is a
    genuinely external codec and raises (swap PIL/ffmpeg in here)."""
    from .media import media_features

    if codec == "fake/1":
        rng = np.frombuffer(blob[:32], dtype=np.uint8).astype(np.float64)
        return np.resize(rng / 255.0, dim)
    return np.resize(media_features(bytes(blob), codec, dim), dim)


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
    narrow = df.select(*id_struct, F.col(media_col).alias("__blob"), F.col(f"{meta_col}.codec").alias("__codec"))
    by_name = {f.name: f.dataType.simpleString() for f in narrow.schema.fields}
    key_schema = ", ".join(f"{c} {by_name[c]}" for c in id_cols)
    schema = f"{key_schema}, feature array<double>, feat_norm double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [
                _decode_features(blob, codec, dim).tolist()
                for blob, codec in zip(pdf["__blob"], pdf["__codec"])
            ]
            mat = np.asarray(feats, dtype=np.float64)
            out = pdf[id_cols].copy()
            out["feature"] = feats
            out["feat_norm"] = np.sqrt((mat * mat).sum(axis=1))
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
