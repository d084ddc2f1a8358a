"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` columns with a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` stages. The decode step itself is STUBBED in this
environment (no image/audio codecs installed): `deterministic_fake=True`
produces a seeded, content-derived pseudo-decode so the Spark-side
plumbing — schema, partitioning, UDF signature, batch shape — is real
and tested end-to-end; with it False, the stage raises
NotImplementedError where a codec (PIL/ffmpeg) would plug in.

Scale notes: media bytes dominate row size, so stages select only the
columns they need (binary column pruned away after feature extraction),
and mapInPandas streams Arrow batches without materializing a partition.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("media_type", StringType()),  # image|audio|video
        StructField("format", StringType()),  # png|jpeg|wav|mp4|...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_media_meta(
    df: DataFrame,
    media_type: str,
    fmt: str,
    width: int = 0,
    height: int = 0,
    sample_rate: int = 0,
    n_frames: int = 0,
) -> DataFrame:
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(sample_rate).alias("sample_rate"),
            F.lit(n_frames).alias("n_frames"),
        ),
    )


def _fake_decode(blob: bytes, n: int) -> np.ndarray:
    """Deterministic content-derived pseudo-pixels: sha256 counter stream.
    Stands in for a real codec so downstream math is testable."""
    out = np.empty(n, dtype=np.uint8)
    pos = 0
    counter = 0
    while pos < n:
        h = hashlib.sha256(blob[:64] + counter.to_bytes(4, "big")).digest()
        take = min(len(h), n - pos)
        out[pos: pos + take] = np.frombuffer(h[:take], dtype=np.uint8)
        pos += take
        counter += 1
    return out


def image_features(
    df: DataFrame,
    blob_col: str = "media",
    id_col: str = "doc_id",
    thumb: int = 8,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Decode -> resize(thumb x thumb, grayscale) -> basic stats + a
    thumbnail vector usable for embedding-style dedup. Arrow-batched."""
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("n_bytes", LongType()),
            StructField("mean_px", DoubleType()),
            StructField("std_px", DoubleType()),
            StructField("thumb_vec", ArrayType(DoubleType())),
        ]
    )
    n_px = thumb * thumb

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids, nb, mean_px, std_px, thumbs = [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    continue
                b = bytes(blob)
                if not deterministic_fake:
                    raise NotImplementedError(
                        "image decode requires a codec (PIL); enable "
                        "deterministic_fake for the stub pipeline"
                    )
                px = _fake_decode(b, n_px).astype(np.float64)
                ids.append(i)
                nb.append(len(b))
                mean_px.append(float(px.mean()))
                std_px.append(float(px.std()))
                thumbs.append(px / 255.0)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_bytes": nb,
                    "mean_px": mean_px,
                    "std_px": std_px,
                    "thumb_vec": thumbs,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema)


def audio_frame_stats(
    df: DataFrame,
    blob_col: str = "media",
    id_col: str = "doc_id",
    frame_len: int = 256,
    max_frames: int = 16,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Decode -> frame-sample -> per-frame RMS energy (the t2f abs_energy
    kernel applied to pseudo-samples). Output: one row per (doc, frame)."""
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("frame", IntegerType()),
            StructField("rms", DoubleType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids, frames, rms = [], [], []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    continue
                if not deterministic_fake:
                    raise NotImplementedError(
                        "audio decode requires a codec (ffmpeg/soundfile)"
                    )
                b = bytes(blob)
                n = min(max_frames, max(1, len(b) // frame_len))
                samples = _fake_decode(b, n * frame_len).astype(np.float64)
                samples = (samples - 127.5) / 127.5
                mat = samples.reshape(n, frame_len)
                fr = np.sqrt((mat * mat).mean(axis=1))
                ids.extend([i] * n)
                frames.extend(range(n))
                rms.extend(fr.tolist())
            yield pd.DataFrame({id_col: ids, "frame": frames, "rms": rms})

    return df.select(id_col, blob_col).mapInPandas(run, schema)
