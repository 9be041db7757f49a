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


# ---------------------------------------------------------------------------
# real-codec delegation contracts, pinned with injected API-faithful fakes
# (pillow / soundfile / av are absent in this container; same strategy as
# tests/test_real_model_delegation.py). These run the codec cores directly
# (driver-side, no Spark) because sys.modules injection does not propagate
# into executor Python workers.
# ---------------------------------------------------------------------------

import types  # noqa: E402

import numpy as np  # noqa: E402


@pytest.fixture()
def fake_pil(monkeypatch):
    """PIL.Image.open(BytesIO) -> Image; .convert('L') -> 2-D uint8 via
    np.asarray. Records the call sequence the delegation must make."""
    calls = []

    class _FakeImg:
        def __init__(self, data):
            self._data = data
            self.converted = None

        def convert(self, mode):
            calls.append(("convert", mode))
            out = _FakeImg(self._data)
            out.converted = mode
            return out

        def __array__(self, dtype=None, copy=None):
            raw = np.frombuffer(self._data, dtype=np.uint8)
            side = max(int(len(raw) ** 0.5), 1)
            arr = np.resize(raw, (side, side + 1))  # non-square: w != h
            return arr.astype(dtype) if dtype else arr

    image_mod = types.ModuleType("PIL.Image")

    def _open(fp):
        calls.append(("open",))
        return _FakeImg(fp.read())

    image_mod.open = _open
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil_mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    return calls


def test_real_image_delegation_contract(fake_pil):
    arr = mm._decode_image_stub(b"0123456789abcdef", require_codecs=True)
    assert fake_pil == [("open",), ("convert", "L")]
    assert arr.dtype == np.uint8
    assert arr.ndim == 2 and arr.shape == (4, 5)
    # features downstream rely on shape[0]=h, shape[1]=w of the converted
    # grayscale image, exactly what the fake emitted


def test_real_audio_delegation_contract(monkeypatch):
    calls = []
    sf_mod = types.ModuleType("soundfile")

    def _read(fp, dtype=None, always_2d=None):
        calls.append(("read", dtype, always_2d))
        # stereo float64 on purpose: the delegation must downmix to mono
        # float32
        data = np.array([[0.5, -0.5], [1.0, 0.0]], dtype=np.float64)
        return data, 16000

    sf_mod.read = _read
    monkeypatch.setitem(sys.modules, "soundfile", sf_mod)
    sig = mm._decode_audio_stub(b"\x00\x01", require_codecs=True)
    assert calls == [("read", "float32", False)]
    assert sig.dtype == np.float32
    assert sig.tolist() == [0.0, 0.5]  # per-frame channel mean


def test_real_video_delegation_contract(monkeypatch):
    calls = []

    class _FakeFrame:
        def __init__(self, i):
            self.i = i

        def to_ndarray(self, format=None):
            calls.append(("to_ndarray", format))
            return np.full((2, 2), self.i, dtype=np.uint8)

    class _FakeContainer:
        def decode(self, video=None):
            calls.append(("decode", video))
            return iter([_FakeFrame(1), _FakeFrame(2), _FakeFrame(3)])

        def __enter__(self):
            return self

        def __exit__(self, *a):
            calls.append(("close",))
            return False

    av_mod = types.ModuleType("av")

    def _open(fp):
        calls.append(("open",))
        return _FakeContainer()

    av_mod.open = _open
    monkeypatch.setitem(sys.modules, "av", av_mod)
    frames = mm._split_frames_stub(b"xyz", 99, require_codecs=True)
    # the real decoder emits what the container holds, not declared counts
    assert len(frames) == 3
    assert frames[0] == bytes([1] * 4)
    assert calls[0] == ("open",)
    assert ("decode", 0) in calls
    assert calls[-1] == ("close",)


def test_missing_codec_raises_not_implemented_with_guidance():
    """In this container the libs are genuinely absent: the delegation
    path must degrade to the guarded NotImplementedError (not a raw
    ImportError) for all three codecs."""
    for fn, kwargs in [
        (lambda: mm._decode_image_stub(b"x", True), "pillow"),
        (lambda: mm._decode_audio_stub(b"x", True), "soundfile"),
        (lambda: mm._split_frames_stub(b"x", 1, True), "install av"),
    ]:
        with pytest.raises(NotImplementedError, match=kwargs):
            fn()
