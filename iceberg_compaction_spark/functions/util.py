"""Small scalar helpers (SURVEY.md §2.8 peripheral functions)."""

from __future__ import annotations

import re

_UNITS = {
    "b": 1,
    "kb": 1 << 10,
    "mb": 1 << 20,
    "gb": 1 << 30,
    "tb": 1 << 40,
    "k": 1 << 10,
    "m": 1 << 20,
    "g": 1 << 30,
    "t": 1 << 40,
}


def parse_size(s: str | int) -> int:
    """'1GB' → bytes (F3, reference data_generator.rs:647-663)."""
    if isinstance(s, int):
        return s
    m = re.fullmatch(r"\s*([0-9]+(?:\.[0-9]+)?)\s*([a-zA-Z]*)\s*", str(s))
    if not m:
        raise ValueError(f"unparseable size: {s!r}")
    num, unit = float(m.group(1)), m.group(2).lower() or "b"
    if unit not in _UNITS:
        raise ValueError(f"unknown size unit in {s!r}")
    return int(num * _UNITS[unit])


def space_savings(input_bytes: int, output_bytes: int) -> float:
    """F8 (reference metrics.rs:205-212): fraction of bytes saved."""
    if input_bytes <= 0:
        return 0.0
    return round(1.0 - output_bytes / input_bytes, 6)


class EwmaRowSize:
    """Bytes-per-row EWMA (F7, reference writer.rs:246-254, smoothing
    0.2). Spark's maxRecordsPerFile consumes the estimate."""

    def __init__(self, smoothing: float = 0.2, initial: float | None = None):
        self.alpha = smoothing
        self.value = initial

    def update(self, bytes_written: int, rows: int) -> float:
        if rows <= 0:
            return self.value or 0.0
        obs = bytes_written / rows
        self.value = obs if self.value is None else (
            self.alpha * obs + (1 - self.alpha) * self.value
        )
        return self.value


def spread_small_input(df):
    """Scale-adaptive parallelism floor for compute-heavy map stages
    (round 9, guide §2.5 input skew): a small table often arrives as
    fewer parquet splits than the session has cores, and everything
    map-side downstream (tokenization, shingling, hashing, vector
    math) then runs on one or two tasks. Round-robin the rows across
    ``defaultParallelism`` when the plan has fewer partitions; at real
    scale the scan already has more splits than cores and this returns
    the input unchanged."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
