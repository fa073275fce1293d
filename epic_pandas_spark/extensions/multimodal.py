"""Multimodal column plumbing (extension layer): image/audio/video as
opaque BinaryType payloads + typed metadata structs, with decode /
feature-extract / resize / frame-sample stages as Arrow-batched
mapInPandas operators.

The container has no image/audio codecs, so the actual decode kernels are
STUBS: `decode_image`/`decode_audio` raise NotImplementedError unless the
optional libs import, and `fake_feature_extractor` provides a
deterministic stand-in so the Spark-side plumbing (schema, batching,
partitioning, UDF signatures) is fully real and testable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "id long, payload binary, media_type string, "
    "meta struct<byte_len: long, content_hash: long, declared_format: string>"
)


def with_media_metadata(df: DataFrame, payload_col: str, fmt_col=None) -> DataFrame:
    """Attach the typed metadata struct computed from the raw payload —
    pure expressions (length/xxhash64), no decode needed. `fmt_col` takes
    a column name (like `payload_col`) or a Column; None → "unknown"."""
    if fmt_col is None:
        fmt = F.lit("unknown")
    elif isinstance(fmt_col, str):
        fmt = F.col(fmt_col)
    else:
        fmt = fmt_col
    return df.withColumn(
        "meta",
        F.struct(
            F.length(F.col(payload_col)).cast("long").alias("byte_len"),
            F.xxhash64(F.col(payload_col)).alias("content_hash"),
            fmt.alias("declared_format"),
        ),
    )


def _try_pillow():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """Real decode stage (width/height/mode) — STUB: needs Pillow, which
    this container doesn't ship. The mapInPandas wiring around it is live."""
    Image = _try_pillow()
    if Image is None:
        raise NotImplementedError(
            "image decode requires Pillow; not available in this environment — "
            "use fake_feature_extractor for pipeline testing"
        )
    import io

    out = []
    for p in payloads:
        img = Image.open(io.BytesIO(p))
        out.append((img.width, img.height, img.mode))
    return pd.DataFrame(out, columns=["width", "height", "mode"])


def fake_feature_extractor(n_features: int = 4):
    """Deterministic stand-in for a decode+embed kernel: maps payload bytes
    to n_features floats (length, first, last, byte-sum mod 256, padded).
    Batch shape, Arrow transfer, and schema behave exactly like a real
    extractor."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = np.zeros((len(pdf), n_features), dtype=np.float64)
            for i, p in enumerate(pdf["payload"]):
                b = np.frombuffer(bytes(p), dtype=np.uint8)
                vals = [float(len(b)), float(b[0]) if len(b) else 0.0,
                        float(b[-1]) if len(b) else 0.0, float(b.sum() % 256)]
                feats[i, : min(n_features, 4)] = vals[:n_features]
            yield pd.DataFrame({"id": pdf["id"], "features": list(feats)})

    return extract


def extract_features(df: DataFrame, id_col: str = "id", payload_col: str = "payload", n_features: int = 4) -> DataFrame:
    """Feature-extraction stage: mapInPandas over (id, payload) batches →
    (id, features array<double>). Narrow transformation — no shuffle; each
    Arrow batch is processed where it lives."""
    src = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(
        fake_feature_extractor(n_features), schema="id long, features array<double>"
    )


def sample_frames(df: DataFrame, payload_col: str, frame_size: int, every_n: int) -> DataFrame:
    """Frame-sampling for fixed-frame-size video payloads: take every n-th
    frame_size-byte slice — pure substring expressions over binary, the
    distributed analog of strided frame decoding. Emits (frame_idx,
    frame_bytes) rows via posexplode."""
    n_frames = F.floor(F.length(F.col(payload_col)) / frame_size).cast("int")
    idxs = F.when(
        n_frames > 0, F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    ).otherwise(F.array().cast("array<int>"))  # short payload => no full frame
    frames = F.transform(
        idxs, lambda i: F.substring(F.col(payload_col), i * frame_size + 1, frame_size)
    )
    return df.select(
        *df.columns, F.posexplode(frames).alias("frame_idx", "frame_bytes")
    )
