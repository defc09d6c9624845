"""Multimodal columns: opaque ``binary`` payloads + typed metadata, with the
decode / feature-extract stages as Arrow-batched ``mapInPandas`` pipelines.

The Spark-side plumbing here is real and tested — schemas, partitioning,
UDF signatures, batch shapes. The codec internals (JPEG decode, audio
resample, video frame-sample) are STUBBED: the image/audio libraries are
not in this container, so ``decode_image(..., fake=False)`` raises
``NotImplementedError`` and ``fake=True`` produces a deterministic payload
derived from the bytes — enough to exercise the distributed pipeline
end-to-end without the codecs.
"""

from __future__ import annotations

from collections.abc import Iterator

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

#: canonical schema for a media asset row — binary payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("content_hash", StringType(), True),
    ]
)

DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("height", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("decode_ok", StringType(), True),
    ]
)


def as_media_table(df: DataFrame, id_col: str, payload_col: str,
                   media_type: str = "image") -> DataFrame:
    """Wrap an arbitrary binary column into the canonical media schema,
    attaching byte length + content hash (all JVM-side)."""
    p = F.col(payload_col)
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit(media_type).alias("media_type"),
        p.alias("payload"),
        F.octet_length(p).cast("long").alias("n_bytes"),
        F.md5(p).alias("content_hash"),
    )


def fake_media_from_text(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Deterministic stand-in media: utf-8 bytes of the text as payload —
    lets every downstream stage run on the driver test tables."""
    return as_media_table(
        df.select(F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("_payload")),
        id_col,
        "_payload",
    )


def decode_image(media: DataFrame, *, fake: bool = False,
                 batch_hint: int | None = None) -> DataFrame:
    """Decode image payloads to (height, width, channels) via an
    Arrow-batched ``mapInPandas`` pipeline.

    Real decoding requires an image codec library not present in this
    container — STUB: ``fake=False`` raises ``NotImplementedError`` at plan
    time; ``fake=True`` derives deterministic dimensions from the payload
    hash so the distributed plumbing (schema, batching, partition layout)
    runs for real.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass fake=True to "
            "exercise the pipeline with deterministic fake decodes"
        )

    def decode_batches(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            hs = [
                hashlib.md5(p if p is not None else b"").digest()
                for p in pdf["payload"]
            ]
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "height": [16 + h[0] % 64 for h in hs],
                    "width": [16 + h[1] % 64 for h in hs],
                    "channels": [3 for _ in hs],
                    "decode_ok": ["fake" for _ in hs],
                }
            )
            yield out

    return media.mapInPandas(decode_batches, DECODED_IMAGE_SCHEMA)


RESIZED_IMAGE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("height", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("duration_ms", LongType(), True),
        StructField("rms", StringType(), True),  # stub: codec-less placeholder
    ]
)


def resize_image(decoded_media: DataFrame, target: tuple[int, int] = (224, 224),
                 *, fake: bool = False) -> DataFrame:
    """Resize stage as ``mapInPandas``. STUB: real resampling needs an image
    library; ``fake=True`` passes the payload through and rewrites the
    dimension metadata — the batch shape, schema, and partitioning are the
    real pipeline's."""
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable; pass fake=True to exercise the pipeline"
        )
    th, tw = int(target[0]), int(target[1])

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "height": [th] * len(pdf),
                "width": [tw] * len(pdf),
                "payload": pdf["payload"],
            })

    return decoded_media.mapInPandas(batches, RESIZED_IMAGE_SCHEMA)


def audio_features(media: DataFrame, *, fake: bool = False) -> DataFrame:
    """Audio feature extraction stage (duration + RMS energy). STUB: no
    audio codec in this container; ``fake=True`` derives deterministic
    features from the payload bytes."""
    if not fake:
        raise NotImplementedError(
            "audio codecs unavailable; pass fake=True to exercise the pipeline"
        )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            sizes = [len(p) if p is not None else 0 for p in pdf["payload"]]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "duration_ms": [s // 16 for s in sizes],  # fake: 16 B/ms
                "rms": [f"{(s % 1000) / 1000.0:.3f}" for s in sizes],
            })

    return media.mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index,
    derived from metadata only (decoder stubbed). Shows the explode shape a
    real sampler would produce; partition count follows the input."""
    n_frames = (F.col("n_bytes") / 1000).cast("int")  # fake: 1 frame ~ 1KB
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return media.where(F.col("media_type") == "video").select(
        "asset_id", F.explode(idx).alias("frame_index")
    )
