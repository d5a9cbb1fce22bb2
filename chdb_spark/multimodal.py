"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

A training-data pipeline treats media as ``binary`` payloads flowing beside
typed metadata; decode/feature steps run as Arrow-batched pandas functions
over ``mapInPandas`` so the JVM↔Python crossing moves columnar batches, not
rows. The actual codecs (PIL/torchaudio/ffmpeg) are NOT in this container,
so the decode kernels are STUBBED behind ``_HAVE_CODECS`` with a
deterministic fake — the Spark-side plumbing (schema, batch iteration,
partitioning, output contract) is real and tested; swapping in a real codec
is editing one pandas function.

Scale posture: media bytes never pass through the driver; mapInPandas
preserves partitioning (no shuffle), and ``repartition`` before decode
controls decode-task granularity so one giant tar-shard doesn't serialize a
whole executor.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HAVE_CODECS = False  # PIL / torchaudio / ffmpeg absent in this environment

#: canonical media-row schema: payload + typed metadata travel together
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)


def _fake_decode_image(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for a real image decode: derives (w, h, luma)
    from the payload bytes. Replace the body with PIL when codecs exist."""
    if not payload:
        return 0, 0, 0.0
    h = hash(bytes(payload)) & 0xFFFFFFFF
    w = 64 + (h % 1024)
    ht = 64 + ((h >> 10) % 1024)
    luma = (sum(payload[:256]) % 25600) / 100.0
    return int(w), int(ht), float(luma)


def decode_images(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """binary payload → image features via mapInPandas (Arrow batches).

    With real codecs this is where PIL.Image.open(BytesIO(payload)) goes;
    the iterator contract (stream of pandas DataFrames in, stream out)
    keeps peak memory at one Arrow batch per task regardless of file count.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "n_bytes": [], "mean_luma": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if _HAVE_CODECS:  # pragma: no cover
                    raise NotImplementedError("real image decode requires PIL")
                w, h, luma = _fake_decode_image(payload or b"")
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(payload or b""))
                out["mean_luma"].append(luma)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        _decode, IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(
    media: DataFrame, every_n_seconds: float = 1.0, max_frames: int = 16
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame.

    Real impl: ffmpeg/OpenCV seek-decode inside the pandas iterator. The
    stub emits deterministic frame indices from metadata duration so the
    explode shape (media → frames) and schema are exercised."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("ts_offset_s", T.DoubleType(), False),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "ts_offset_s": []}
            for mid, meta in zip(pdf["media_id"], pdf["meta"]):
                dur = float((meta or {}).get("duration_s", "0"))
                n = min(max_frames, max(0, int(dur / every_n_seconds)))
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["ts_offset_s"].append(i * every_n_seconds)
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "video").select("media_id", "meta").mapInPandas(
        _sample, schema
    )


def audio_features(media: DataFrame) -> DataFrame:
    """Audio feature extraction plumbing (stub kernel, real batch shape)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("est_duration_s", T.DoubleType(), True),
            T.StructField("rms_energy", T.DoubleType(), True),
        ]
    )

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "n_bytes": [], "est_duration_s": [], "rms_energy": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = payload or b""
                out["media_id"].append(mid)
                out["n_bytes"].append(len(b))
                out["est_duration_s"].append(len(b) / 32000.0)  # 16kHz 16-bit mono
                out["rms_energy"].append(float(sum(b[:1024]) % 1000) / 1000.0)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").select("media_id", "payload").mapInPandas(
        _feat, schema
    )
