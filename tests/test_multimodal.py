"""Multimodal operators: schema, determinism, Arrow batch plumbing, and the
stubbed-codec gates."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from language_diversity_common_crawler_spark.functions import multimodal as mm  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return mm.media_from_documents(docs)


def test_media_schema_and_kinds(spark, media):
    assert [f.name for f in media.schema.fields] == [
        f.name for f in mm.MEDIA_SCHEMA.fields
    ]
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_image_features_deterministic(spark, media):
    a = {r["media_id"]: (r["mean_px"], r["std_px"], r["decoded_h"])
         for r in mm.image_features(media).collect()}
    b = {r["media_id"]: (r["mean_px"], r["std_px"], r["decoded_h"])
         for r in mm.image_features(
             mm.repartition_for_media(media, 7)).collect()}
    assert a == b and len(a) > 0
    # every image row present, none of other kinds
    n_img = media.filter(F.col("kind") == "image").count()
    assert len(a) == n_img


def test_resize_shapes(spark, media):
    out = mm.resize_images(media, width=8, height=6).collect()
    assert all(len(bytes(r["payload"])) == 8 * 6 for r in out)
    assert all((r["width"], r["height"]) == (8, 6) for r in out)


def test_audio_features(spark, media):
    rows = mm.audio_features(media).collect()
    n_audio = media.filter(F.col("kind") == "audio").count()
    assert len(rows) == n_audio
    for r in rows:
        assert 0.0 <= r["rms"] <= 1.0
        assert r["n_samples"] > 0


def test_frame_sampling_counts(spark, media):
    vids = {r["media_id"]: r["n_frames"]
            for r in media.filter(F.col("kind") == "video").collect()}
    frames = mm.sample_frames(media, every_n=1).collect()
    per_vid = {}
    for r in frames:
        per_vid[r["media_id"]] = per_vid.get(r["media_id"], 0) + 1
    assert per_vid == vids  # one row per frame
    # subsampling halves (ceil) the count
    half = mm.sample_frames(media, every_n=2).groupBy("media_id").count()
    for r in half.collect():
        assert r["count"] == (vids[r["media_id"]] + 1) // 2


def test_codec_gate_raises(spark, media):
    with pytest.raises(Exception) as exc_info:
        mm.image_features(media, require_codecs=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_decode_stats_matches_sql(spark, media):
    got = {
        r["media_id"]: (r["kind"], r["byte_len"], r["width"])
        for r in mm.media_decode_stats(media).collect()
    }
    want = {
        r["media_id"]: (r["kind"], r["byte_len"], r["width"])
        for r in media.select(
            "media_id", "kind",
            F.length("payload").cast("bigint").alias("byte_len"), "width"
        ).collect()
    }
    assert got == want
