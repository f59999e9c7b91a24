"""Z-order / Hilbert clustering keys as vectorized pandas UDFs.

The reference has no clustering operator; the north rule adds
"Z-order and Hilbert-curve clustering via bit-interleaved sort keys
computed in vectorized Arrow/pandas UDFs" (BASELINE.json). Design:

  1. normalize each key column to an unsigned rank in [0, 2^bits) via
     driver-computed quantile boundaries (sampled, deterministic seed)
     + ``np.searchsorted`` inside the UDF — scale-safe because the
     boundary array (≤65k cut points/col) broadcasts in the closure;
  2. bit-interleave the ranks (Z-order), or run Skilling's public
     axes→transpose algorithm ("Programming the Hilbert curve", AIP
     2004) vectorized over numpy arrays (Hilbert);
  3. the resulting int64 key drives ``repartitionByRange(_cluster)`` +
     ``sortWithinPartitions(_cluster)`` — the plan shape mandated by
     the north star.

No per-row Python anywhere: the UDFs are Arrow-batched and the inner
loops run over *bit positions* (≤16 iterations), not rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

CLUSTER_COL = "_cluster"


# ----------------------------------------------------------------------
# bit math (vectorized over rows; loops are over bit positions only)
def interleave_bits(coords: np.ndarray, bits: int) -> np.ndarray:
    """Z-order: MSB-first interleave of ``coords`` (n, d) uints into an
    int64 per row. Dimension 0 contributes the most-significant bit of
    each round."""
    n, d = coords.shape
    out = np.zeros(n, dtype=np.int64)
    for q in range(bits - 1, -1, -1):
        for i in range(d):
            out = (out << 1) | ((coords[:, i] >> q) & 1).astype(np.int64)
    return out


def hilbert_index(coords: np.ndarray, bits: int) -> np.ndarray:
    """Hilbert curve index for (n, d) uint coordinates, ``bits`` per
    dimension. Vectorized form of Skilling's AxesToTranspose (public
    algorithm), followed by MSB-first bit interleave of the transposed
    coordinates."""
    X = coords.astype(np.int64).copy()
    n, d = X.shape
    M = 1 << (bits - 1)

    # Inverse undo (Skilling)
    Q = M
    while Q > 1:
        P = Q - 1
        for i in range(d):
            has = (X[:, i] & Q) != 0
            # invert low bits of X[:,0] where bit set
            X[has, 0] ^= P
            # exchange low bits of X[:,0] and X[:,i] where bit not set
            t = (X[~has, 0] ^ X[~has, i]) & P
            X[~has, 0] ^= t
            X[~has, i] ^= t
        Q >>= 1

    # Gray encode
    for i in range(1, d):
        X[:, i] ^= X[:, i - 1]
    t = np.zeros(n, dtype=np.int64)
    Q = M
    while Q > 1:
        sel = (X[:, d - 1] & Q) != 0
        t[sel] ^= Q - 1
        Q >>= 1
    for i in range(d):
        X[:, i] ^= t

    return interleave_bits(X.astype(np.uint32), bits)


# ----------------------------------------------------------------------
# rank normalization
def _to_numeric_array(s: pd.Series) -> np.ndarray:
    if pd.api.types.is_datetime64_any_dtype(s):
        return s.astype("int64").to_numpy()
    if pd.api.types.is_numeric_dtype(s):
        return s.fillna(0).to_numpy()
    return s.fillna("").astype(str).to_numpy()


def compute_boundaries(
    df: DataFrame, cols: list[str], bits: int, sample_rows: int = 200_000, seed: int = 42
) -> dict[str, np.ndarray]:
    """Per-column quantile cut points (2^bits − 1) from a deterministic
    sample. Sampling keeps the driver payload O(sample), independent of
    table size."""
    total = df.count()
    frac = min(1.0, (sample_rows * 1.25) / max(total, 1))
    sample = df.select(*cols).sample(fraction=frac, seed=seed).limit(sample_rows).toPandas()
    n_cuts = (1 << bits) - 1
    out: dict[str, np.ndarray] = {}
    for c in cols:
        arr = _to_numeric_array(sample[c])
        arr = np.sort(arr)
        if len(arr) == 0:
            out[c] = arr
            continue
        idx = np.linspace(0, len(arr) - 1, num=min(n_cuts, len(arr))).astype(np.int64)
        out[c] = np.unique(arr[idx])
    return out


def add_cluster_key(
    df: DataFrame,
    cols: list[str],
    curve: str = "zorder",
    bits: int | None = None,
    boundaries: dict[str, np.ndarray] | None = None,
) -> DataFrame:
    """Append an int64 ``_cluster`` column. ``curve`` ∈ {"linear",
    "zorder", "hilbert"}. Linear needs no key computation (callers sort
    by the columns themselves)."""
    if curve == "linear":
        return df
    d = len(cols)
    if d == 1:
        curve = "zorder"  # degenerate: plain rank
    bits = bits or max(4, min(16, 63 // max(d, 1)))
    bnds = boundaries or compute_boundaries(df, cols, bits)
    bnd_list = [bnds[c] for c in cols]
    use_hilbert = curve == "hilbert"
    nbits = bits

    @pandas_udf("long")
    def _key(*series: pd.Series) -> pd.Series:
        n = len(series[0])
        coords = np.zeros((n, d), dtype=np.uint32)
        for i, s in enumerate(series):
            arr = _to_numeric_array(s)
            b = bnd_list[i]
            # side='right' ⇒ cut points (1..2^bits−1) map value v of an
            # identity-bucketed domain to rank v exactly
            coords[:, i] = (
                np.searchsorted(b, arr, side="right").astype(np.uint32)
                if len(b)
                else np.zeros(n, dtype=np.uint32)
            )
        key = hilbert_index(coords, nbits) if use_hilbert else interleave_bits(coords, nbits)
        return pd.Series(key)

    return df.withColumn(CLUSTER_COL, _key(*[F.col(c) for c in cols]))
