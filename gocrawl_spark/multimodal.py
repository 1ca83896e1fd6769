"""Multimodal columns: image/audio/video as opaque binary + metadata.

A training-data pipeline at 100 TB carries media as `binary` columns
with typed metadata structs, processed by Arrow-batched `mapInPandas`
stages. This module makes the Spark-side plumbing real — schemas,
deterministic synthetic payload generation, UDF signatures, batch
shapes, partition behavior — while the codec calls themselves are
stubbed (PIL/ffmpeg/librosa are not in this container):

- real decode is gated behind `_HAVE_PIL`-style import-tries and
  raises NotImplementedError when absent;
- `fake_decode=True` (default) derives deterministic features from the
  payload bytes (md5-seeded), so tests pin the full distributed path
  end-to-end — schema, batching, ordering — with stable values.

Layout rule at scale: media rows are 10^3-10^6 × larger than text
rows, so media tables are partitioned by (modality, bucket(doc_id))
and feature extraction is a narrow map — never shuffle the bytes;
shuffle only the extracted features.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real decoders, absent in this container
    import PIL.Image  # type: ignore # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("doc_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),  # image/video
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),  # audio/video
    ]
)

FEATURES_SCHEMA = (
    "media_id long, modality string, payload_sha string, n_bytes long, "
    "feat array<float>, frames_sampled int"
)

FEAT_DIM = 8


def synth_media(spark, documents: DataFrame, modality: str = "image") -> DataFrame:
    """Deterministic fake media table derived from documents: payload =
    repeated md5 bytes of the doc text; metadata a pure function of
    doc_id. Pure narrow map — safe at any scale/partitioning."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "doc_id", "modality", "payload", "mime", "width", "height", "duration_ms")}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(doc_id)
                seed = hashlib.md5((text or "").encode("utf-8")).digest()
                rows["media_id"].append(did * 10 + hash(modality) % 7 % 10)
                rows["doc_id"].append(did)
                rows["modality"].append(modality)
                rows["payload"].append(seed * (4 + did % 13))
                rows["mime"].append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[modality])
                rows["width"].append(64 + (did % 8) * 32 if modality != "audio" else None)
                rows["height"].append(64 + (did % 5) * 32 if modality != "audio" else None)
                rows["duration_ms"].append(1000 + did % 9000 if modality != "image" else None)
            yield pd.DataFrame(rows)

    return documents.select("doc_id", "text").mapInPandas(gen, schema=MEDIA)


def _fake_features(payload: bytes, dim: int = FEAT_DIM) -> list[float]:
    """Deterministic stand-in for a decoded-image/audio feature vector:
    dim floats in [-1,1) from the payload digest."""
    d = hashlib.sha256(payload or b"").digest()
    return [int.from_bytes(d[4 * i : 4 * i + 4], "big") / 2**31 - 1.0 for i in range(dim)]


def extract_features(
    media: DataFrame, frame_stride_ms: int = 1000, fake_decode: bool = True
) -> DataFrame:
    """Decode → (resize/frame-sample) → feature vector, as one
    mapInPandas stage over (media_id, modality, payload, duration_ms).

    With real codecs installed the image branch would decode+resize and
    the video branch sample one frame per `frame_stride_ms`; here those
    calls are stubbed (NotImplementedError) unless fake_decode, which
    derives features from the bytes so the distributed plumbing is
    testable end-to-end.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "modality", "payload_sha", "n_bytes", "feat", "frames_sampled")}
            for mid, modality, payload, dur in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"], pdf["duration_ms"]
            ):
                payload = bytes(payload) if payload is not None else b""
                if not fake_decode:
                    if not _HAVE_PIL:
                        raise NotImplementedError(
                            "real media decode requires PIL/ffmpeg (not in this container); "
                            "use fake_decode=True for the deterministic test path"
                        )
                    raise NotImplementedError("real decode path not wired in this sandbox")
                frames = 1
                if modality in ("video", "audio") and dur is not None and not pd.isna(dur):
                    frames = max(1, int(dur) // max(1, frame_stride_ms))
                out["media_id"].append(int(mid))
                out["modality"].append(modality)
                out["payload_sha"].append(hashlib.sha256(payload).hexdigest())
                out["n_bytes"].append(len(payload))
                out["feat"].append(_fake_features(payload))
                out["frames_sampled"].append(frames)
            yield pd.DataFrame(out)

    return media.select("media_id", "modality", "payload", "duration_ms").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def media_stats(features: DataFrame) -> DataFrame:
    """Per-modality rollup of the extracted features (the metrics-table
    shape a curation run reports)."""
    return features.groupBy("modality").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("frames_sampled").alias("total_frames"),
        F.countDistinct("payload_sha").alias("distinct_payloads"),
    )


__all__ = ["MEDIA", "FEATURES_SCHEMA", "FEAT_DIM", "synth_media", "extract_features", "media_stats"]
