"""Multimodal columns for training-data pipelines (driver brief): treat
image/audio/video as opaque `binary` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over mapInPandas.

The container has no image/audio codecs (PIL/cv2/librosa absent — verified),
so the DECODE step is stubbed exactly as the brief mandates: real Spark-side
plumbing (schemas, batch iteration, partitioning, UDF signatures) with (a) a
deterministic fake decoder for the synthetic in-repo format, and (b) a
clearly-marked NotImplementedError for real codecs. Swapping in PIL/ffmpeg
changes only the body of `_decode_real`.

Synthetic binary format (deterministic test payloads, gen_media):
    b"SYNM" | kind(1B: 0=img 1=aud 2=vid) | width u16 | height u16 |
    n_frames u16 | payload bytes (xxhash-seeded)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, meta struct<"
    "width:int, height:int, n_frames:int, bytes:long>"
)
_MAGIC = b"SYNM"
_KINDS = ("image", "audio", "video")

FEATURE_DIM = 16


def gen_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (media_id, kind, payload, meta).

    Payload bytes derive from xxhash64 streams — distributed generation,
    no driver-side blobs, stable across partitioning.
    """
    df = spark.range(0, n).withColumnRenamed("id", "media_id")
    h = lambda tag: F.xxhash64(F.lit(tag), F.col("media_id"), F.lit(seed))  # noqa: E731
    kind_i = F.pmod(h("kind"), 3)
    width = (F.pmod(h("w"), 64) + 8).cast("int")
    height = (F.pmod(h("h"), 64) + 8).cast("int")
    n_frames = F.when(kind_i == 2, (F.pmod(h("f"), 30) + 2)).otherwise(F.lit(1)).cast("int")
    # header: magic + kind byte + 3 x u16 little-endian, then 32 payload bytes
    header = F.concat(
        F.lit(_MAGIC),
        _u8(kind_i),
        _u16le(width),
        _u16le(height),
        _u16le(n_frames),
        F.unhex(F.concat(*[F.lpad(F.hex(F.abs(h(f"p{i}"))), 16, "0") for i in range(4)])),
    )
    kind = F.element_at(F.array(*[F.lit(k) for k in _KINDS]), (kind_i + 1).cast("int"))
    return df.select(
        "media_id",
        kind.alias("kind"),
        header.alias("payload"),
        F.struct(
            width.alias("width"),
            height.alias("height"),
            n_frames.alias("n_frames"),
            F.lit(4 + 1 + 6 + 32).cast("long").alias("bytes"),
        ).alias("meta"),
    )


def _u8(col) -> F.Column:
    return F.unhex(F.lpad(F.hex(col.cast("int")), 2, "0"))


def _u16le(col) -> F.Column:
    c = col.cast("int")
    lo = c.bitwiseAND(0xFF)
    hi = F.shiftright(c, 8).bitwiseAND(0xFF)
    return F.concat(_u8(lo), _u8(hi))


def _parse_header(b: bytes) -> tuple[int, int, int, int] | None:
    if b is None or len(b) < 11 or b[:4] != _MAGIC:
        return None
    kind = b[4]
    width, height, n_frames = struct.unpack_from("<HHH", b, 5)
    return kind, width, height, n_frames


def _decode_real(payload: bytes):  # pragma: no cover - codec-less container
    raise NotImplementedError(
        "real media decode requires PIL/ffmpeg/librosa, absent in this "
        "container; only the SYNM synthetic format decodes here"
    )


DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, "
    "ok boolean"
)


def decode_media(media: DataFrame) -> DataFrame:
    """mapInPandas decode: parses headers batch-wise (Arrow), falling back
    to NotImplementedError for non-synthetic payloads."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": pdf["media_id"], "kind": pdf["kind"]}
            parsed = pdf["payload"].map(_parse_header)
            out["width"] = parsed.map(lambda p: p[1] if p else None).astype("Int32")
            out["height"] = parsed.map(lambda p: p[2] if p else None).astype("Int32")
            out["n_frames"] = parsed.map(lambda p: p[3] if p else None).astype("Int32")
            out["ok"] = parsed.map(lambda p: p is not None)
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, schema=DECODED_SCHEMA
    )


FEATURES_SCHEMA = f"media_id long, features array<float>"


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Deterministic fake feature extraction (stands in for an image/audio
    embedding model): numpy vectorized over the Arrow batch — the real
    model call would replace `_featurize` only."""

    def _featurize(payloads: pd.Series) -> pd.Series:
        def one(b):
            if _parse_header(b) is None:
                return None
            rng = np.random.RandomState(
                np.frombuffer(b[-8:], dtype=np.uint32)[0]
            )
            return rng.randn(dim).astype(np.float32).tolist()

        return payloads.map(one)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": _featurize(pdf["payload"])}
            )

    return media.select("media_id", "payload").mapInPandas(fn, schema=FEATURES_SCHEMA)


RESIZE_SCHEMA = "media_id long, width int, height int, payload binary"


def resize_images(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize plumbing: recomputes target dims JVM-side-compatible semantics
    inside the batch (aspect-preserving clamp); payload passthrough (a real
    implementation re-encodes pixels here)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = pdf["payload"].map(_parse_header)

            def dims(p):
                if p is None:
                    return (None, None)
                _, w, h, _ = p
                s = max(w, h)
                if s <= max_side:
                    return (w, h)
                return (max(1, w * max_side // s), max(1, h * max_side // s))

            wh = parsed.map(dims)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": wh.map(lambda x: x[0]).astype("Int32"),
                    "height": wh.map(lambda x: x[1]).astype("Int32"),
                    "payload": pdf["payload"],
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(fn, schema=RESIZE_SCHEMA)
    )


FRAMES_SCHEMA = "media_id long, frame_idx int"


def sample_frames(media: DataFrame, every: int = 5) -> DataFrame:
    """Frame sampling for video rows — pure built-ins (sequence + explode):
    the per-frame pixel decode would plug into decode_media."""
    v = media.filter(F.col("kind") == "video")
    idx = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every))
    return v.select("media_id", F.explode(idx).alias("_i")).select(
        "media_id", F.col("_i").cast("int").alias("frame_idx")
    )
