"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

The decode step is STUBBED (no image/audio libraries in this
container): ``decode=\"fake\"`` produces deterministic features from the
bytes themselves so the Spark-side plumbing — schema evolution,
batching, partitioning, UDF signatures — is fully real and tested;
``decode=\"real\"`` raises ``NotImplementedError`` where a PIL/ffmpeg
call would go.

Scale design: media bytes never pass through a shuffle — enrichment is
a map-only stage over the scan (mapInPandas), feature columns are tiny
relative to payloads, and downstream joins/aggs select features only
(column pruning drops the binary from the scan when untouched).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_SUFFIX = (
    "media binary, media_type string, media_w int, media_h int, media_ms int"
)

FEATURE_DDL = (
    "doc_id bigint, media_type string, byte_len int, sha1 string,"
    " brightness double, histogram array<int>, frames_sampled int"
)


def attach_fake_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic stand-in media: the utf-8 bytes of the text plus a
    typed metadata struct derived from the id. Stands in for a real
    (path → bytes) loader."""
    mt = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        mt.alias("media_type"),
        (F.col(id_col) % 640 + 16).cast("int").alias("media_w"),
        (F.col(id_col) % 480 + 16).cast("int").alias("media_h"),
        (F.col(id_col) % 30_000).cast("int").alias("media_ms"),
    )


def _decode_real(media_type: str, payload: bytes):
    raise NotImplementedError(
        "real decoders (PIL/soundfile/ffmpeg) are not available in this "
        "environment; use decode='fake' for the deterministic test path"
    )


def extract_features(
    media_df: DataFrame,
    decode: str = "fake",
    frame_stride: int = 10,
    batch_hint: int = 256,
) -> DataFrame:
    """Per-item features via ``mapInPandas`` (Arrow batches in/out —
    the only sane shape for multi-MB binaries; one Python worker per
    partition, vectorized inside the batch)."""
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")
    use_real = decode == "real"
    stride = max(1, frame_stride)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            if use_real:
                _decode_real(pdf["media_type"].iloc[0], b"")
            payloads = pdf["media"].tolist()
            lens = np.array([len(p) for p in payloads], dtype=np.int64)
            sha1 = [hashlib.sha1(p).hexdigest() for p in payloads]
            bright = np.array(
                [float(np.frombuffer(p, dtype=np.uint8).mean()) if len(p) else 0.0 for p in payloads]
            )
            hists = [
                np.bincount(np.frombuffer(p, dtype=np.uint8) >> 5, minlength=8).astype(
                    "int32"
                ).tolist()
                if len(p)
                else [0] * 8
                for p in payloads
            ]
            frames = np.where(
                pdf["media_type"].str.startswith("video").to_numpy(),
                np.maximum(pdf["media_ms"].to_numpy() // (33 * stride), 1),
                1,
            ).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": lens.astype("int32"),
                    "sha1": sha1,
                    "brightness": bright,
                    "histogram": hists,
                    "frames_sampled": frames,
                }
            )

    return media_df.mapInPandas(gen, schema=FEATURE_DDL)


def resize_stub(media_df: DataFrame, w: int, h: int) -> DataFrame:
    """Resize plumbing: passes metadata through with the new target
    dims; the pixel transform itself is behind the decode stub."""
    return media_df.withColumn("media_w", F.lit(w)).withColumn("media_h", F.lit(h))
