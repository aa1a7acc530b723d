"""Multimodal plumbing: schema, determinism across partitionings, frame
sampling, stub decode contract."""

import pytest
from pyspark.sql import functions as F

from tsdat_spark.multimodal import attach_fake_media, extract_features, frame_sample
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


def test_decode_stub_raises_on_missing_payload():
    from tsdat_spark.multimodal import _decode_stub

    with pytest.raises(NotImplementedError):
        _decode_stub(None, {})
