"""Per-file bloom filters for point-lookup file pruning.

Min/max bounds prune RANGE predicates well but are useless for point
lookups on hash-distributed keys: every file of a partition spans
nearly the full ``conv_id`` range, so ``conv_id = 'conv_000042'`` scans
all of them. A small per-file bloom over the key column lets the
planner drop every file that provably does not contain the key — the
Iceberg/parquet bloom idea lifted to FILE granularity so pruning
happens in the manifest, before any footer or row group is opened.
(Parquet-level blooms are additionally written for row-group skipping
inside surviving files; see ``Table`` write options.)

Discipline: bits are SET executor-side from JVM ``F.xxhash64`` values
(one narrow column scan, numpy per Arrow batch, no per-row Python) and
PROBED driver-side with the pure-Python ``xxh64`` twin — the two hash
identically (pinned by tests). Blooms have no false negatives, so
pruning on "definitely absent" is always safe; false positives only
cost a scanned file.

Layout inside a manifest ``stats_json`` column entry::

    {"min": …, "max": …, "nulls": …,
     "bloom": {"m": bits, "k": hashes, "b64": base64(bitmap)}}

Sizing: m = n·ln(1/fpp)/ln(2)² bits (≈9.6 bits/key at 1% fpp), k = 7.
A 10^6-distinct-key file costs ~1.2 MB of manifest at 1% fpp — use a
coarser fpp or restrict bloom columns when manifests must stay lean.
"""

from __future__ import annotations

import base64
import math

import numpy as np

from iceberg_compaction_spark.functions.xxh import xxh64

_K = 7
_U64 = np.uint64


def bloom_params(n_distinct: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m bits, k hashes) for ``n_distinct`` keys at ``fpp``; m is
    rounded up to a multiple of 64, floored at 1024."""
    n = max(n_distinct, 1)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(1024, (m + 63) // 64 * 64)
    return m, _K


def _positions_np(hs: np.ndarray, m: int) -> np.ndarray:
    """(len(hs), k) bit positions via double hashing — uint64 wraparound
    is the shared contract with the driver-side prober."""
    h1 = hs.astype(_U64)
    h2 = ((h1 >> _U64(33)) << _U64(1)) | _U64(1)
    out = np.empty((len(hs), _K), dtype=np.int64)
    for i in range(_K):
        out[:, i] = ((h1 + _U64(i) * h2) % _U64(m)).astype(np.int64)
    return out


def _positions_one(h: int, m: int) -> list[int]:
    mask = (1 << 64) - 1
    h1 = h & mask
    h2 = (((h1 >> 33) << 1) | 1) & mask
    return [((h1 + i * h2) & mask) % m for i in range(_K)]


def build_bitmap(hs: np.ndarray, fpp: float = 0.01) -> tuple[str, int, int]:
    """(base64 bitmap, m, k) from an array of xxhash64 values."""
    hs = np.unique(hs.astype(_U64))
    m, k = bloom_params(len(hs), fpp)
    bits = np.zeros(m, dtype=bool)
    if len(hs):
        bits[_positions_np(hs, m).ravel()] = True
    packed = np.packbits(bits, bitorder="little")
    return base64.b64encode(packed.tobytes()).decode("ascii"), m, k


def maybe_contains(bloom: dict, value) -> bool:
    """Driver-side probe: False ⇒ the file DEFINITELY lacks ``value``
    (safe to prune); True ⇒ maybe present. Malformed blooms, or a value
    whose type doesn't match the bloom's key type, → True.

    Key encodings mirror Spark's ``xxhash64`` input layout exactly
    (pinned by tests): strings hash their UTF-8 bytes; long keys hash
    8-byte little-endian two's complement (the build side casts
    integral columns to long for the same reason)."""
    try:
        m = int(bloom["m"])
        raw = base64.b64decode(bloom["b64"])
    except (KeyError, TypeError, ValueError):
        return True
    t = bloom.get("t", "str")
    if t == "str":
        if not isinstance(value, str):
            return True
        data = value.encode("utf-8")
    elif t == "long":
        if isinstance(value, bool) or not isinstance(value, int):
            return True
        if not (-(1 << 63) <= value < (1 << 63)):
            return False  # outside long range: definitely absent
        import struct

        data = struct.pack("<q", value)
    else:
        return True
    h = xxh64(data)
    for pos in _positions_one(h, m):
        if not (raw[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


def compute_file_blooms(spark, paths, column: str, fpp: float = 0.01) -> dict:
    """{file path: bloom dict} for ``column`` across ``paths`` — ONE
    narrow column scan (path + jvm xxhash64 only reach Python, as Arrow
    batches grouped per file). Cost at scale: re-reads just the key
    column of freshly written files; gate via table config."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from iceberg_compaction_spark.sources import scan as scan_mod

    import pandas as pd

    src = spark.read.parquet(*paths)
    dtype = src.schema[column].dataType
    if isinstance(dtype, T.StringType):
        key_col, key_t = F.col(column), "str"
    elif isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        # hash as LONG so the driver-side probe's 8-byte little-endian
        # packing matches regardless of the column's declared width
        key_col, key_t = F.col(column).cast("long"), "long"
    else:
        return {}  # unsupported key type: no blooms, pruning untouched

    df = src.filter(F.col(column).isNotNull()).select(
        scan_mod.norm_file_path(F.input_file_name()).alias("_file"),
        F.xxhash64(key_col).alias("_h"),
    )

    def fn(key, pdf):
        b64, m, k = build_bitmap(pdf["_h"].to_numpy())
        return pd.DataFrame({"_file": [key[0]], "b64": [b64], "m": [m], "k": [k]})

    rows = (
        df.groupBy("_file")
        .applyInPandas(fn, "_file string, b64 string, m long, k long")
        .collect()  # one row per FILE: manifest-sized, never data-sized
    )
    return {
        r["_file"]: {"m": r["m"], "k": r["k"], "t": key_t, "b64": r["b64"]} for r in rows
    }
