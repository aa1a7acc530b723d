"""Multimodal: schema, determinism across partitionings, frame sampling,
and the REAL bytes→array decode path (numpy PPM/BMP/WAV codecs)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tsdat_spark.multimodal import (
    attach_fake_media,
    attach_synth_media,
    extract_features,
    frame_sample,
)
from tsdat_spark.synth import SynthSpec, generate_transcripts


@pytest.fixture(scope="module")
def media_df(spark):
    df = generate_transcripts(spark, SynthSpec(n_convs=8, base_turns=20, n_mega=0, mega_turns=0))
    df = attach_fake_media(df, ["conv_id", "turn_idx"])
    df.persist(); df.count()
    yield df
    df.unpersist()


def test_media_schema(media_df):
    assert dict(media_df.dtypes)["media"] == "binary"
    meta = media_df.select("media_meta.*").first()
    assert meta["modality"] == "image"
    assert meta["width"] >= 16 and meta["n_frames"] >= 1


def test_features_deterministic_across_partitioning(media_df):
    a = extract_features(media_df, ["conv_id", "turn_idx"]).orderBy("conv_id", "turn_idx")
    b = extract_features(media_df.repartition(13), ["conv_id", "turn_idx"]).orderBy("conv_id", "turn_idx")
    ra, rb = a.collect(), b.collect()
    assert len(ra) == media_df.count()
    assert ra == rb
    assert all(len(r["feature"]) == 16 for r in ra)
    assert all(r["feat_norm"] >= 0 for r in ra)


def test_frame_sample_schedule(media_df):
    frames = frame_sample(media_df, ["conv_id", "turn_idx"], every_n=7)
    j = frames.groupBy("conv_id", "turn_idx").agg(
        F.count("*").alias("n"), F.max("frame_idx").alias("mx")
    ).join(media_df.select("conv_id", "turn_idx", F.col("media_meta.n_frames").alias("nf")),
           ["conv_id", "turn_idx"])
    for r in j.collect():
        assert r["n"] == (r["nf"] - 1) // 7 + 1
        assert r["mx"] <= r["nf"] - 1


def test_unsupported_codec_raises():
    from tsdat_spark.media import MediaError
    from tsdat_spark.multimodal import _decode_features

    with pytest.raises(MediaError):
        _decode_features(b"\xff\xd8junk", "image/jpeg", 16)


def test_real_image_decode_features(spark):
    """extract_features over real PPM payloads: Spark-side feature vectors
    must equal driver-side decode+describe of the very same bytes."""
    from tsdat_spark.media import decode_ppm, image_features

    base = generate_transcripts(spark, SynthSpec(n_convs=4, base_turns=6, n_mega=0, mega_turns=0))
    media = attach_synth_media(base, ["conv_id", "turn_idx"], codec="image/ppm")
    feats = extract_features(media, ["conv_id", "turn_idx"]).orderBy("conv_id", "turn_idx")
    blobs = {(r["conv_id"], r["turn_idx"]): bytes(r["media"]) for r in media.collect()}
    for r in feats.collect():
        img = decode_ppm(blobs[(r["conv_id"], r["turn_idx"])])
        assert img.shape == (24, 32, 3)
        expected = np.resize(image_features(img, 16), 16)
        assert np.allclose(np.array(r["feature"]), expected)


def test_real_audio_decode_features(spark):
    from tsdat_spark.media import audio_features, decode_wav

    base = generate_transcripts(spark, SynthSpec(n_convs=3, base_turns=4, n_mega=0, mega_turns=0))
    media = attach_synth_media(base, ["conv_id", "turn_idx"], codec="audio/wav")
    feats = extract_features(media, ["conv_id", "turn_idx"])
    blobs = {(r["conv_id"], r["turn_idx"]): bytes(r["media"]) for r in media.collect()}
    for r in feats.collect():
        samples, rate = decode_wav(blobs[(r["conv_id"], r["turn_idx"])])
        assert rate == 16000 and samples.size == 4000
        expected = np.resize(audio_features(samples, 16), 16)
        assert np.allclose(np.array(r["feature"]), expected)
        assert r["feat_norm"] > 0
