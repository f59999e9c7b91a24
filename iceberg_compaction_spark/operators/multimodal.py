"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

The decode step probes for PIL AT RUNTIME: with PIL installed,
``decode=\"real\"`` decodes ``image/*`` payloads (brightness, 8-bin
luma histogram, real resize) with no code changes; without it (this
container), or for media types that would need soundfile/ffmpeg, it
raises ``NotImplementedError``. ``decode=\"fake\"`` always works:
deterministic features from the bytes themselves, so the Spark-side
plumbing — schema evolution, batching, partitioning, UDF signatures —
is fully real and tested either way.

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


def _pil():
    """Runtime import probe: PIL.Image or None. Never cached as a
    module constant so an environment gaining PIL mid-session works."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _soundfile():
    """Runtime probe for the audio decoder (soundfile), mirroring
    ``_pil``: module or None, probed per call."""
    try:
        import soundfile  # noqa: PLC0415

        return soundfile
    except ImportError:
        return None


def _ffmpeg():
    """Runtime probe for a video decoder: the ffmpeg binary's path, or
    None when absent from PATH."""
    import shutil

    return shutil.which("ffmpeg")


def _probe_for(media_type: str):
    """(decoder handle, library name) for a media type — the handle is
    None when the environment lacks the decoder."""
    mt = str(media_type)
    if mt.startswith("image"):
        return _pil(), "PIL"
    if mt.startswith("audio"):
        return _soundfile(), "soundfile"
    if mt.startswith("video"):
        return _ffmpeg(), "ffmpeg"
    return None, "unknown-media-type"


def _decode_real(media_type: str, payload: bytes):
    """Real image decode when PIL is importable; NotImplementedError
    with the missing decoder named otherwise. Audio/video real decode
    goes through ``_features_real`` (features, not an object handle)."""
    handle, lib = _probe_for(media_type)
    if handle is None:
        raise NotImplementedError(
            f"real decoder for {media_type} needs {lib}, which is not "
            "available in this environment; use decode='fake' for the "
            "deterministic test path"
        )
    if not str(media_type).startswith("image"):
        raise NotImplementedError(
            f"{media_type} has no decode-to-object form; use "
            "_features_real/extract_features(decode='real')"
        )
    import io

    return handle.open(io.BytesIO(payload))


def _features_real(media_type: str, payload: bytes) -> tuple[float, list[int]]:
    """(brightness, 8-bin histogram) from a REAL decode: luma for
    image/* (PIL), |amplitude| for audio/* (soundfile), first-frame
    luma for video/* (ffmpeg rawvideo pipe). Each path engages when
    its probe finds the decoder; otherwise NotImplementedError names
    the missing library."""
    handle, lib = _probe_for(media_type)
    if handle is None:
        raise NotImplementedError(
            f"real decoder for {media_type} needs {lib}, which is not "
            "available in this environment; use decode='fake' for the "
            "deterministic test path"
        )
    mt = str(media_type)
    if mt.startswith("image"):
        gray = np.asarray(_decode_real(media_type, payload).convert("L"), dtype=np.uint8)
        return float(gray.mean()), np.bincount(
            (gray >> 5).ravel(), minlength=8
        ).astype("int32").tolist()
    if mt.startswith("audio"):
        import io

        data, _sr = handle.read(io.BytesIO(payload))
        mono = np.abs(np.asarray(data, dtype=np.float64))
        if mono.ndim > 1:
            mono = mono.mean(axis=1)
        if mono.size == 0:
            return 0.0, [0] * 8
        bins = np.minimum((np.clip(mono, 0.0, 1.0) * 8).astype(np.int64), 7)
        return float(mono.mean()), np.bincount(bins, minlength=8).astype(
            "int32"
        ).tolist()
    # video/*: decode the first frame to 8-bit gray via an ffmpeg pipe
    import subprocess

    out = subprocess.run(
        [handle, "-v", "error", "-i", "pipe:0", "-frames:v", "1",
         "-f", "rawvideo", "-pix_fmt", "gray", "pipe:1"],
        input=payload, capture_output=True, check=True,
    ).stdout
    gray = np.frombuffer(out, dtype=np.uint8)
    if gray.size == 0:
        return 0.0, [0] * 8
    return float(gray.mean()), np.bincount(gray >> 5, minlength=8).astype(
        "int32"
    ).tolist()


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
    if use_real and _pil() is None and _soundfile() is None and _ffmpeg() is None:
        # no decoder of any modality: fail fast driver-side with the
        # canonical message instead of per-task executor errors
        _decode_real("image/*", b"")
    stride = max(1, frame_stride)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            payloads = pdf["media"].tolist()
            lens = np.array([len(p) for p in payloads], dtype=np.int64)
            sha1 = [hashlib.sha1(p).hexdigest() for p in payloads]
            if use_real:
                real = [
                    _features_real(mt, p)
                    for mt, p in zip(pdf["media_type"], payloads)
                ]
                bright = np.array([r[0] for r in real])
                hists = [r[1] for r in real]
            else:
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


def resize(media_df: DataFrame, w: int, h: int, decode: str = "fake") -> DataFrame:
    """Resize as a map-only ``mapInPandas`` stage with the full
    bytes-in/bytes-out shape a real PIL resize would have. The pixel
    transform is behind the decode probe: ``fake`` produces a
    deterministic w×h-byte surrogate (payload tiled/truncated — sized
    and batched exactly like real output); ``real`` does a genuine
    PIL decode→resize→PNG-encode when PIL is importable and raises
    NotImplementedError otherwise. Binary columns never shuffle; the
    output schema equals the input schema with updated dims."""
    use_real = decode == "real"
    if use_real and _pil() is None:
        _decode_real("image/*", b"")  # raises the canonical message
    target = max(1, w * h)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf.copy()
            if use_real:
                resized = []
                for mt, p in zip(pdf["media_type"], pdf["media"]):
                    img = _decode_real(mt, p).resize((w, h))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    resized.append(buf.getvalue())
                out["media"] = resized
            else:
                out["media"] = [
                    bytes((np.frombuffer(p, dtype=np.uint8) if len(p) else np.zeros(1, np.uint8))[
                        np.arange(target) % max(len(p), 1)
                    ])
                    for p in pdf["media"]
                ]
            out["media_w"] = np.int32(w)
            out["media_h"] = np.int32(h)
            yield out

    return media_df.mapInPandas(gen, schema=media_df.schema)


resize_stub = resize  # back-compat alias


FRAME_DDL = "doc_id bigint, frame_idx int, frame_ms int, frame bytes".replace(
    "bytes", "binary"
)


def sample_frames(
    media_df: DataFrame, stride_ms: int = 330, max_frames: int = 16
) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    (doc_id, frame_idx, frame_ms, frame bytes), every ``stride_ms``
    up to ``max_frames``. Decode is stubbed: each fake frame is a
    deterministic slice of the payload keyed by the frame index, so
    ordering/batching/explosion plumbing is fully real. Non-video rows
    produce no frames. Map-only; the fan-out happens inside the Arrow
    batch, never via a join."""
    stride = max(1, stride_ms)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        empty = pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"), "frame_idx": pd.Series(dtype="int32"),
             "frame_ms": pd.Series(dtype="int32"), "frame": pd.Series(dtype=object)}
        )
        for pdf in batches:
            vid = pdf[pdf["media_type"].astype(str).str.startswith("video")]
            if len(vid) == 0:
                yield empty
                continue
            # numpy repeat/explode: per-row frame counts → flat arrays
            counts = np.minimum(
                max_frames,
                np.maximum(1, vid["media_ms"].to_numpy(dtype=np.int64) // stride),
            )
            total = int(counts.sum())
            starts = np.repeat(np.cumsum(counts) - counts, counts)
            idx = (np.arange(total) - starts).astype(np.int64)
            payloads = [p if p else b"\x00" for p in vid["media"]]
            plens = np.repeat(
                np.fromiter((len(p) for p in payloads), dtype=np.int64), counts
            )
            los = (idx * 97) % plens
            parr = np.empty(len(payloads), dtype=object)
            parr[:] = payloads  # bytes stay scalars (asarray would 2-D equal-length bytes)
            rep = np.repeat(parr, counts)
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(vid["doc_id"].to_numpy(), counts),
                    "frame_idx": idx.astype("int32"),
                    "frame_ms": (idx * stride).astype("int32"),
                    "frame": [
                        bytes(p[lo : lo + 64] or b"\x00")
                        for p, lo in zip(rep, los)
                    ],
                }
            )

    return media_df.mapInPandas(gen, schema=FRAME_DDL)
