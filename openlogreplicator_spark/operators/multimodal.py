"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The decode stage is REAL: pure-Python codecs
(`functions/imagecodec.py`) parse BMP/PPM/PNG stills, RIFF/WAVE PCM
audio and the MPNG multi-frame container from their public
specifications — decoded statistics come from actual pixels/samples,
not from the blob bytes. Unknown formats pass through as ``raw`` with
byte-level statistics (the opaque-blob contract).

At 100 TB: blobs stay columnar parquet binary; decode is a map-only
Arrow-batched stage (no shuffle); features feed the similarity
operators' bucketed ANN. Frame sampling never inflates skipped frames
(MPNG random access).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from openlogreplicator_spark.functions import imagecodec as ic

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
        T.StructField("decoder", T.StringType()),  # bmp|ppm|png|wav|mpng|raw
    ]
)

FEATURE_DIM = 64


def _synth_pixels(i: int, w: int, h: int):
    """Deterministic test pixels: a two-band image (left/right halves in
    different solid colors) so means are exactly recomputable."""
    import numpy as np

    left = np.array([i % 256, (i * 7) % 256, (i * 13) % 256], np.uint8)
    right = np.array([(i * 31) % 256, (i * 3) % 256, (i * 17) % 256], np.uint8)
    px = np.zeros((h, w, 3), np.uint8)
    px[:, : w // 2] = left
    px[:, w // 2:] = right
    return px


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic corpus of REAL encodings: stills cycle PNG/BMP/PPM,
    audio is PCM16 WAV, video is the MPNG multi-frame container."""
    import numpy as np

    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = 32 + (i % 8) * 16, 24 + (i % 8) * 12
            px = _synth_pixels(i, w, h)
            fmt = ("png", "bmp", "ppm")[(i // 3) % 3]
            data = {
                "png": ic.encode_png, "bmp": ic.encode_bmp,
                "ppm": ic.encode_ppm,
            }[fmt](px)
            meta = {"format": fmt, "width": w, "height": h,
                    "sample_rate": None, "n_frames": 1}
        elif kind == "audio":
            sr = 16000
            t = np.arange(400 + 40 * (i % 10))
            samples = (
                np.sin(t * (220 + i) * 2 * np.pi / sr) * 12000
            ).astype("<i2")
            data = ic.encode_wav(samples, sr)
            meta = {"format": "wav", "width": None, "height": None,
                    "sample_rate": sr, "n_frames": 1}
        else:
            w, h = 16, 12
            nf = (i % 6) + 2
            frames = [_synth_pixels(i + k, w, h) for k in range(nf)]
            data = ic.encode_mpng(frames)
            meta = {"format": "mpng", "width": w, "height": h,
                    "sample_rate": None, "n_frames": nf}
        rows.append((i, kind, bytearray(data), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_one(media_id: int, kind: str, data: bytes) -> dict:
    """One blob → decoded statistics via the real codecs; unknown bytes
    degrade to the raw byte-level contract. The sniff keys on 2-byte
    magic prefixes ('BM', 'P6'), so ordinary text can FALSE-POSITIVE as
    media — a failed decode therefore falls back to the raw branch
    instead of killing the Spark stage (r12 review-pass-9: a document
    starting 'BMW…' crashed the whole query)."""
    import numpy as np

    fmt = ic.sniff_format(data)
    out = {
        "media_id": media_id,
        "kind": kind,
        "width": None,
        "height": None,
        "n_frames": 1,
        "n_bytes": len(data),
        "checksum": hashlib.md5(data).hexdigest(),
        "decoder": fmt,
    }
    try:
        if fmt in ("png", "bmp", "ppm"):
            px = ic.decode_image(data)
            out["height"], out["width"] = px.shape[0], px.shape[1]
            out["mean_intensity"] = float(px.mean()) / 255.0
            return out
        if fmt == "wav":
            samples, sr = ic.decode_wav(data)
            out["width"] = sr
            out["mean_intensity"] = (
                float(np.abs(samples.astype(np.float64)).mean()) / 32768.0
                if len(samples)
                else 0.0
            )
            return out
        if fmt == "mpng":
            frames = ic.decode_mpng(data)
            out["n_frames"] = len(frames)
            if frames:
                out["height"], out["width"] = frames[0].shape[:2]
                out["mean_intensity"] = float(
                    np.mean([f.mean() for f in frames])
                ) / 255.0
            else:
                out["mean_intensity"] = 0.0
            return out
    except Exception:
        out["decoder"] = "raw"
        out["width"] = out["height"] = None
        out["n_frames"] = 1
    # raw passthrough — byte statistics
    out["mean_intensity"] = (
        sum(data) / len(data) / 255.0 if data else 0.0
    )
    return out


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode stage (mapInPandas): one partition-preserving
    pass, no shuffle; real pixel/sample decode per blob."""

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                _decode_one(int(r.media_id), r.kind, bytes(r.data))
                for r in pdf.itertuples()
            ]
            yield pd.DataFrame(
                out, columns=[f.name for f in DECODED_SCHEMA.fields]
            )

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL resize: decode still → nearest-neighbor resample → re-encode
    PPM. Map-only Arrow stage; non-image rows are filtered JVM-side
    before any Python runs."""

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for r in pdf.itertuples():
                px = ic.decode_image(bytes(r.data))
                ids.append(int(r.media_id))
                blobs.append(
                    bytearray(ic.encode_ppm(ic.resize_nearest(px, width, height)))
                )
            yield pd.DataFrame({"media_id": ids, "data": blobs})

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "data")
        .mapInPandas(rz, schema="media_id long, data binary")
    )


def resize_plan(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize geometry planning (scale factors in the JVM plan); the
    pixel transform itself is :func:`resize_media`."""
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


def decode_sampled_frames(sampled: DataFrame) -> DataFrame:
    """Per-sampled-frame pixel statistics: MPNG random access decodes
    ONLY the requested frame (skipped frames are never inflated)."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                px = ic.mpng_frame(bytes(r.data), int(r.frame_idx))
                rows.append(
                    {
                        "media_id": int(r.media_id),
                        "frame_idx": int(r.frame_idx),
                        "width": px.shape[1],
                        "height": px.shape[0],
                        "mean_intensity": float(px.mean()) / 255.0,
                    }
                )
            yield pd.DataFrame(rows)

    return sampled.mapInPandas(
        dec,
        schema=(
            "media_id long, frame_idx int, width int, height int, "
            "mean_intensity double"
        ),
    )


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Binary → fixed-dim float feature vector. Stills get REAL
    8×8 grayscale block means (the classic tiny-image descriptor);
    non-image blobs fall back to a deterministic hash projection (the
    embedding-model stand-in). Output feeds the ANN operators directly
    (array<float> like the embeddings table)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        side = int(dim ** 0.5)
        for pdf in batches:
            vecs = []
            for r in pdf.itertuples():
                data = bytes(r.data)
                fmt = ic.sniff_format(data)
                if fmt in ("png", "bmp", "ppm"):
                    px = ic.decode_image(data)
                    gray = px.mean(axis=2)
                    pooled = ic.resize_nearest(
                        np.repeat(gray[:, :, None], 3, axis=2).astype(
                            np.uint8
                        ),
                        side,
                        side,
                    )[:, :, 0]
                    # +1 bias keeps an all-black image off the zero
                    # vector (cosine downstream divides by the norm)
                    v = (pooled.astype("float32") + 1.0).reshape(-1) / 256.0
                    if len(v) < dim:
                        v = np.pad(v, (0, dim - len(v)))
                    vecs.append(v[:dim])
                else:
                    seed = int.from_bytes(
                        hashlib.md5(data).digest()[:8], "little"
                    )
                    rng = np.random.default_rng(seed)
                    vecs.append(rng.standard_normal(dim).astype("float32"))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [list(v) for v in vecs],
                }
            )

    return media.mapInPandas(
        feats, schema="media_id long, feature array<float>"
    )
