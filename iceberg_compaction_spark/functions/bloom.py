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
     "bloom": {"m": bits, "k": hashes, "t": "str"|"long",
               "ref": sidecar_path, "key": data_file_path}}

The BITMAP lives OUT OF LINE in a sidecar file (Puffin-style, one
sidecar per write batch per column, ``meta/blooms/``), loaded lazily —
and only for files that survive min/max pruning. The manifest carries
just the ~100-byte descriptor, so a 10⁴-file bloomed table's
driver-resolved manifest stays manifest-sized instead of gaining
~1.2 MB/file of base64 (m = n·ln(1/fpp)/ln(2)² ≈ 9.6 bits/key at 1%
fpp, k = 7). Sidecars are immutable (uuid names): the probe-side cache
never goes stale; orphan cleanup sweeps unreferenced ones. Inline
``{"b64": …}`` blooms from older manifests still probe (back-compat).
"""

from __future__ import annotations

import base64
import json
import math
import os
import uuid as _uuid
from threading import Lock

import numpy as np

from iceberg_compaction_spark.functions.xxh import xxh64
from iceberg_compaction_spark.metrics import GLOBAL as METRICS

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


# sidecar bitmap cache: path → {data file path: decoded bitmap bytes}.
# Sidecars are immutable (uuid-named), so entries never go stale; a
# small LRU bounds driver memory at many-table sessions.
_SIDECAR_CACHE: dict = {}
_SIDECAR_CACHE_MAX = 64
_SIDECAR_LOCK = Lock()


def _load_sidecar(path: str) -> dict | None:
    """{key: bitmap bytes} for one sidecar file (cached), or None when
    the sidecar is missing/corrupt (probe degrades to 'maybe').
    Failures are NOT cached: a transient IO error must not pin every
    later probe through this sidecar to 'maybe present' for the
    process lifetime — the next probe retries the read. Hits move to
    the end of the (ordered) dict so eviction is true LRU."""
    with _SIDECAR_LOCK:
        if path in _SIDECAR_CACHE:
            _SIDECAR_CACHE[path] = _SIDECAR_CACHE.pop(path)  # LRU touch
            return _SIDECAR_CACHE[path]
    try:
        with open(path) as f:
            payload = json.load(f)
        decoded = {k: base64.b64decode(v) for k, v in payload.items()}
    except (OSError, ValueError, TypeError):
        return None  # uncached: transient failures retry on next probe
    METRICS.inc("bloom.sidecar_loads")
    with _SIDECAR_LOCK:
        while len(_SIDECAR_CACHE) >= _SIDECAR_CACHE_MAX:
            _SIDECAR_CACHE.pop(next(iter(_SIDECAR_CACHE)))
        _SIDECAR_CACHE[path] = decoded
    return decoded


def write_sidecar(blooms: dict, dir_path: str, column: str) -> dict:
    """Write ``{file path: {"b64","m","k","t"}}`` bitmaps as ONE
    sidecar file under ``dir_path`` → {file path: manifest descriptor}
    (``{"m","k","t","ref","key"}``, no bitmap). Atomic (tmp + replace);
    uuid-named so sidecars are immutable."""
    if not blooms:
        return {}
    os.makedirs(dir_path, exist_ok=True)
    path = os.path.join(dir_path, f"bloom-{_uuid.uuid4().hex[:12]}-{column}.json")
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({p: b["b64"] for p, b in blooms.items()}, f)
    os.replace(tmp, path)
    return {
        p: {"m": b["m"], "k": b["k"], "t": b["t"], "ref": path, "key": p}
        for p, b in blooms.items()
    }


def maybe_contains(bloom: dict, value) -> bool:
    """Driver-side probe: False ⇒ the file DEFINITELY lacks ``value``
    (safe to prune); True ⇒ maybe present. Malformed blooms, a missing
    sidecar, or a value whose type doesn't match the bloom's key type
    → True. The bitmap is fetched lazily: inline ``b64`` (legacy
    manifests) or a cached sidecar load via ``ref``/``key`` — callers
    only probe files that already survived min/max pruning, so sidecar
    IO is bounded by the survivor count, not the table's file count.

    Key encodings mirror Spark's ``xxhash64`` input layout exactly
    (pinned by tests): strings hash their UTF-8 bytes; long keys hash
    8-byte little-endian two's complement (the build side casts
    integral columns to long for the same reason)."""
    try:
        m = int(bloom["m"])
        if "b64" in bloom:
            raw = base64.b64decode(bloom["b64"])
        else:
            side = _load_sidecar(bloom["ref"])
            raw = None if side is None else side.get(bloom["key"])
            if raw is None:
                return True
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
