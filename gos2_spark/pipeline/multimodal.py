"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side machinery (schemas, batch iteration via mapInPandas, partition
sizing) is real and tested. The codec step itself is STUBBED: this container
has no image/audio libraries, so ``decode`` produces a deterministic fake
derived from the payload bytes (clearly marked), and ``decode_real`` raises
NotImplementedError where PIL/ffmpeg would be called. Swapping in a real
decoder changes one function, not the pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, StringType, StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("mime", StringType()),
    StructField("payload", BinaryType()),
    StructField("meta_width", IntegerType()),  # typed metadata columns
    StructField("meta_height", IntegerType()),
    StructField("meta_duration_ms", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("kind", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("features", ArrayType(FloatType())),
])


def synth_media(spark, num_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = hash-derived bytes)."""
    return (
        spark.range(num_rows)
        .select(
            F.concat(F.lit("m"), F.col("id")).alias("media_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("kind"),
            F.lit("application/octet-stream").alias("mime"),
            F.sha2(F.concat(F.lit(seed), F.col("id")), 256).cast("binary").alias("payload"),
            (F.col("id") % 640 + 16).cast("int").alias("meta_width"),
            (F.col("id") % 480 + 16).cast("int").alias("meta_height"),
            (F.col("id") % 90000).cast("int").alias("meta_duration_ms"),
        )
    )


def decode_real(payload: bytes, kind: str):
    """The real decoder hook — intentionally unimplemented in this container.

    A production deployment implements this with PIL / torchaudio / pyav and
    the surrounding mapInPandas pipeline is unchanged.
    """
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use extract_features(deterministic_fake=True)"
    )


def _fake_decode_batch(payloads: pd.Series, dim: int) -> np.ndarray:
    """Deterministic fake 'decode': features derived from payload bytes.

    Stands in for the decoder so the distributed plumbing (Arrow batches,
    schema, partitioning) is exercised end to end with reproducible values.
    """
    out = np.zeros((len(payloads), dim), dtype=np.float32)
    for i, p in enumerate(payloads):
        b = np.frombuffer(bytes(p), dtype=np.uint8)
        reps = int(np.ceil(dim / len(b)))
        out[i] = (np.tile(b, reps)[:dim].astype(np.float32) - 127.5) / 127.5
    return out


def extract_features(
    media: DataFrame,
    feature_dim: int = 64,
    frame_sample_every_ms: int = 1000,
    deterministic_fake: bool = True,
    batch_size_hint: int = 256,
) -> DataFrame:
    """media table -> per-item feature rows via mapInPandas.

    The generator iterates Arrow batches (bounded memory per task — required
    for multi-MB payloads at scale); video rows fan out to sampled frames.
    """
    if not deterministic_fake:
        # route through the real decoder (raises in this container)
        decode_real(b"", "image")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _fake_decode_batch(pdf["payload"], feature_dim)
            n_frames = np.where(
                pdf["kind"].to_numpy() == "video",
                np.maximum(1, pdf["meta_duration_ms"].to_numpy() // frame_sample_every_ms),
                1,
            ).astype(np.int32)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "width": pdf["meta_width"].astype("int32"),
                "height": pdf["meta_height"].astype("int32"),
                "n_frames": n_frames,
                "features": list(feats),
            })

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Pure-SQL resize planning: target dims preserving aspect ratio.

    The actual pixel resample belongs in the decode hook; the plan (and its
    partition-friendly arithmetic) is native."""
    w, h = F.col("meta_width"), F.col("meta_height")
    scale = F.least(F.lit(max_side) / w, F.lit(max_side) / h, F.lit(1.0))
    return media.select(
        "media_id",
        w.alias("src_width"), h.alias("src_height"),
        F.greatest(F.round(w * scale).cast("int"), F.lit(1)).alias("dst_width"),
        F.greatest(F.round(h * scale).cast("int"), F.lit(1)).alias("dst_height"),
    )
