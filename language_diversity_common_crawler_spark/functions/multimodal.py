"""Multimodal (image/audio/video) columns for a training-data pipeline.

Media ride as opaque ``binary`` payload columns with typed metadata, exactly
like the ``html: binary`` column of the pages table (input_hint). All
operators are ``mapInPandas`` stages: one Python invocation per Arrow batch,
schemas declared up front, zero per-row Python.

The actual codec work (JPEG decode, resampling, H.264 frame extraction) is
STUBBED — the image/audio libraries are not in this container. Each stub is
clearly marked and either raises ``NotImplementedError`` (when
``require_codecs=True``) or substitutes a DETERMINISTIC fake derived from
the payload bytes, so the Spark-side plumbing — schema, partitioning, UDF
signature, Arrow batch shape — is real and testable. Swapping in PIL/
librosa/pyav is a local change inside the marked functions.

Scale notes:
- payloads are large; operators select only (id, payload) — column pruning
  keeps other columns out of the Arrow transfer;
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
  (session.py sets 10k; at ~1 MB media that conf should drop to ~64 —
  exposed as ``repartition_for_media``'s advice);
- frame sampling explodes rows; pass ``n_partitions`` to shuffle the
  exploded frames when a hot video would skew downstream work (and use
  repartition_for_media on the input when payload sizes are heavy-tailed).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media table from the documents table: the
    payload is the utf-8 text bytes (a stand-in blob the DuckDB oracle can
    reproduce with encode()). Kind/mime/meta derive from doc_id."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    mime = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/jpeg"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
    )
    # coalesce: a NULL text row must still yield a (zero-byte) payload —
    # MEDIA_SCHEMA declares payload/width/height non-nullable and the codec
    # stubs call bytes(payload)
    payload = F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8")
    blen = F.length(payload)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        mime.alias("mime"),
        payload.alias("payload"),
        (blen % 640 + 16).cast("int").alias("width"),
        (blen % 480 + 16).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (blen % 24 + 1).cast("int").alias("n_frames"),
    )


def repartition_for_media(df: DataFrame, n_partitions: int) -> DataFrame:
    """Hash-repartition by media_id so large payloads spread evenly (media
    sizes are heavy-tailed; input file splits correlate with size)."""
    return df.repartition(n_partitions, "media_id")


# ---------------------------------------------------------------------------
# codec cores: real-library delegation with deterministic sandbox fallback
#
# ``require_codecs=False`` (the default, and what every queries()/oracle
# path uses) is the deterministic fake — environment-independent, so the
# DuckDB value-hash gate stays meaningful on any box. ``require_codecs=
# True`` DELEGATES to the real codec libraries (pillow / soundfile / av),
# imported lazily INSIDE the core so the import happens in the executor's
# Python worker, mirroring langid_models._predict_real; a missing library
# raises NotImplementedError with install guidance. The delegation call
# contracts are pinned by injected API-faithful fakes in
# tests/test_multimodal.py (same strategy as test_real_model_delegation —
# the libs are absent in this container).
# ---------------------------------------------------------------------------

def _real_image_decode(payload: bytes) -> np.ndarray:
    """PIL delegation: open → grayscale ('L') → uint8 (h, w) array. The
    'L' convert gives every downstream feature a single-channel array,
    matching the stub's 2-D shape contract."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    return np.asarray(img.convert("L"), dtype=np.uint8)


def _real_audio_decode(payload: bytes) -> np.ndarray:
    """soundfile delegation: decode to float32 samples, downmixing
    multi-channel to mono by mean (the features are channel-agnostic)."""
    import io

    import soundfile as sf

    data, _sr = sf.read(io.BytesIO(payload), dtype="float32",
                        always_2d=False)
    arr = np.asarray(data, dtype=np.float32)
    if arr.ndim > 1:
        arr = arr.mean(axis=1).astype(np.float32)
    return arr


def _real_split_frames(payload: bytes) -> list[bytes]:
    """pyav delegation: decode the first video stream, one grayscale
    ndarray payload per frame (frame order = decode order)."""
    import io

    import av

    out = []
    with av.open(io.BytesIO(payload)) as container:
        for frame in container.decode(video=0):
            out.append(frame.to_ndarray(format="gray").tobytes())
    return out


def _decode_image_stub(payload: bytes, require_codecs: bool) -> np.ndarray:
    """require_codecs=True → PIL (NotImplementedError if not installed);
    False → deterministic fake: payload bytes tiled into a (h, w) uint8
    array."""
    if require_codecs:
        try:
            return _real_image_decode(payload)
        except ImportError as e:
            raise NotImplementedError(
                "image codec not available in this container; "
                "install pillow to enable real decode"
            ) from e
    raw = np.frombuffer(payload, dtype=np.uint8)
    side = max(int(len(raw) ** 0.5), 1)
    return np.resize(raw, (side, side))


def _decode_audio_stub(payload: bytes, require_codecs: bool) -> np.ndarray:
    """require_codecs=True → soundfile (NotImplementedError if not
    installed); False → deterministic fake: payload bytes as centered
    float32 samples in [-1, 1)."""
    if require_codecs:
        try:
            return _real_audio_decode(payload)
        except ImportError as e:
            raise NotImplementedError(
                "audio codec not available; install soundfile to enable "
                "real decode"
            ) from e
    raw = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    return (raw - 128.0) / 128.0


def _split_frames_stub(payload: bytes, n_frames: int,
                       require_codecs: bool) -> list[bytes]:
    """require_codecs=True → pyav (NotImplementedError if not installed;
    the real decoder ignores the declared n_frames and emits what the
    container holds); False → deterministic fake: payload sliced into
    n_frames contiguous chunks."""
    if require_codecs:
        try:
            return _real_split_frames(payload)
        except ImportError as e:
            raise NotImplementedError(
                "video codec not available; install av to enable real "
                "frame decode"
            ) from e
    n = max(n_frames, 1)
    step = max(len(payload) // n, 1)
    return [payload[i * step: (i + 1) * step] for i in range(n)]


# ---------------------------------------------------------------------------
# operators (mapInPandas — real plumbing)
# ---------------------------------------------------------------------------

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("byte_len", LongType(), False),
        StructField("decoded_h", IntegerType(), False),
        StructField("decoded_w", IntegerType(), False),
        StructField("mean_px", DoubleType(), False),
        StructField("std_px", DoubleType(), False),
    ]
)


def image_features(media: DataFrame, require_codecs: bool = False) -> DataFrame:
    """Decode + feature-extract images: (media_id, byte_len, h, w, mean,
    std). Arrow-batched; only (media_id, payload) crosses into Python."""
    src = media.filter(F.col("kind") == "image").select("media_id", "payload")

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = _decode_image_stub(bytes(payload), require_codecs)
                out.append(
                    (int(mid), len(payload), img.shape[0], img.shape[1],
                     float(img.mean()), float(img.std()))
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return src.mapInPandas(_gen, IMAGE_FEATURES_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("payload", BinaryType(), False),
    ]
)


def resize_images(media: DataFrame, width: int, height: int,
                  require_codecs: bool = False) -> DataFrame:
    """Resize stub: decode → nearest-neighbor resample → re-encode (fake
    re-encode = raw bytes). Output schema/meta update is the real part."""
    src = media.filter(F.col("kind") == "image").select("media_id", "payload")

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = _decode_image_stub(bytes(payload), require_codecs)
                ys = (np.linspace(0, img.shape[0] - 1, height)).astype(int)
                xs = (np.linspace(0, img.shape[1] - 1, width)).astype(int)
                resized = img[np.ix_(ys, xs)]
                rows.append((int(mid), width, height, resized.tobytes()))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZE_SCHEMA.fields]
            )

    return src.mapInPandas(_gen, RESIZE_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("rms", DoubleType(), False),
        StructField("zero_crossings", LongType(), False),
    ]
)


def audio_features(media: DataFrame, require_codecs: bool = False) -> DataFrame:
    """Audio decode + features: sample count, RMS, zero-crossing count."""
    src = media.filter(F.col("kind") == "audio").select("media_id", "payload")

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                sig = _decode_audio_stub(bytes(payload), require_codecs)
                zc = int(np.sum(np.signbit(sig[:-1]) != np.signbit(sig[1:])))
                rms = float(np.sqrt(np.mean(sig**2))) if len(sig) else 0.0
                rows.append((int(mid), len(sig), rms, zc))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return src.mapInPandas(_gen, AUDIO_FEATURES_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_payload", BinaryType(), False),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 1,
                  require_codecs: bool = False,
                  n_partitions: int | None = None) -> DataFrame:
    """Frame sampling: one output row per kept frame (row explosion inside
    mapInPandas — output batch is larger than input batch, which is why
    this is mapInPandas and not a scalar UDF). Frames stay in their source
    row's partition by default; pass ``n_partitions`` to shuffle the
    exploded frames by (media_id, frame_idx) when a hot video would skew
    downstream work."""
    src = media.filter(F.col("kind") == "video").select(
        "media_id", "n_frames", "payload"
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, nf, payload in zip(
                pdf["media_id"], pdf["n_frames"], pdf["payload"]
            ):
                frames = _split_frames_stub(bytes(payload), int(nf),
                                            require_codecs)
                for i in range(0, len(frames), every_n):
                    rows.append((int(mid), i, frames[i]))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    out = src.mapInPandas(_gen, FRAME_SCHEMA)
    if n_partitions:
        out = out.repartition(n_partitions, "media_id", "frame_idx")
    return out


def media_decode_stats(media: DataFrame) -> DataFrame:
    """Oracle-checkable decode summary over ALL media kinds: byte length +
    60-bit payload hash + declared dims. The mapInPandas stage carries the
    payload through Python (proving the binary plumbing); every output
    value is also computable in plain SQL for the DuckDB oracle."""
    src = media.select("media_id", "kind", "mime", "payload", "width", "height")

    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("mime", StringType(), False),
            StructField("byte_len", LongType(), False),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
        ]
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "mime": pdf["mime"],
                    "byte_len": [len(bytes(p)) for p in pdf["payload"]],
                    "width": pdf["width"],
                    "height": pdf["height"],
                }
            )

    return src.mapInPandas(_gen, out_schema)
