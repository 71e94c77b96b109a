"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow-batched mapInPandas
decode, partition-preserving transforms, batch shapes — while the actual
codec step is STUBBED: this container has no image/audio libraries, so
``decode_media`` tries the real decoder imports and falls back to a
clearly-marked deterministic fake (hash-derived pixels/samples). Swapping
the fake for PIL/torchaudio is a one-function change; every downstream
operator (resize, frame sampling, feature extraction, ANN over features)
is already exercised against the fake.

At 100 TB: blobs stay columnar parquet binary; decode is a map-only stage
(no shuffle); features feed the similarity operators' bucketed ANN.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image|audio|video
        T.StructField("data", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("decoder", T.StringType()),  # 'fake' until libs exist
    ]
)

FEATURE_DIM = 64


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake corpus: blob bytes derived from md5(media_id)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        seed = hashlib.md5(f"media:{i}".encode()).digest()
        data = (seed * ((64 + i) // len(seed) + 1))[: 64 + i]
        meta = {
            "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
            "width": 32 + (i % 8) * 16 if kind != "audio" else None,
            "height": 24 + (i % 8) * 12 if kind != "audio" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": (i % 30) + 1 if kind == "video" else 1,
        }
        rows.append((i, kind, bytearray(data), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(media_id: int, kind: str, data: bytes, meta) -> dict:
    """Deterministic stand-in for the codec: statistics derived from the
    raw bytes, so downstream plumbing has stable, testable values."""
    h = hashlib.md5(data).hexdigest()
    return {
        "media_id": media_id,
        "kind": kind,
        "width": meta["width"] if meta is not None else None,
        "height": meta["height"] if meta is not None else None,
        "n_frames": meta["n_frames"] if meta is not None else 1,
        "n_bytes": len(data),
        "checksum": h,
        "mean_intensity": sum(data) / len(data) / 255.0 if data else 0.0,
        "decoder": "fake",
    }


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode stage (mapInPandas): one partition-preserving
    pass, no shuffle. Tries real decoders first; this environment has
    none, so the deterministic fake runs (marked in the 'decoder' col)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # real codec path — not available in this container
            import PIL.Image  # noqa: F401

            raise NotImplementedError(
                "real image decode is stubbed: wire PIL.Image.open(BytesIO) "
                "here when the imaging stack is installed"
            )
        except ImportError:
            real = False
        for pdf in batches:
            out = [
                _fake_decode(
                    int(r.media_id), r.kind, bytes(r.data), r.meta
                )
                for r in pdf.itertuples()
            ]
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])
        _ = real

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def resize_plan(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: target geometry + scale factors land in the plan;
    the pixel transform itself is the stubbed codec step."""
    return media.select(
        "media_id",
        "kind",
        F.lit(width).alias("target_width"),
        F.lit(height).alias("target_height"),
        (F.lit(width) / F.col("meta.width")).alias("scale_x"),
        (F.lit(height) / F.col("meta.height")).alias("scale_y"),
        "data",
    ).filter(F.col("kind") == "image")


def sample_frames(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Video frame sampling: explode the sampled frame index list —
    JVM-side sequence+filter, one row per retained frame."""
    frames = F.sequence(F.lit(0), F.col("meta.n_frames") - 1)
    sampled = F.filter(frames, lambda i: i % every_n == 0)
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(sampled).alias("frame_idx"), "data")
    )


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Binary → fixed-dim float feature vector (deterministic hash
    projection as the embedding-model stand-in). Output feeds the ANN
    operators directly (array<float> like the embeddings table)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            vecs = []
            for r in pdf.itertuples():
                seed = int.from_bytes(
                    hashlib.md5(bytes(r.data)).digest()[:8], "little"
                )
                rng = np.random.default_rng(seed)
                vecs.append(rng.standard_normal(dim).astype("float32"))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": [list(v) for v in vecs]}
            )

    return media.mapInPandas(
        feats, schema="media_id long, feature array<float>"
    )
