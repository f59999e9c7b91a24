"""Parallelism calculation (C3).

Exact arithmetic of the reference
(``/root/reference/crates/planner/src/file_selection.rs:156-177``)::

    executor_parallelism = clamp(max(ceil(bytes / min_size_per_partition),
                                     ceil(files / max_file_count)),
                                 1, max_parallelism)
    output_parallelism   = clamp(ceil(bytes / target_file_size),
                                 1, max_parallelism)

Defaults 256 MB / 100 files / 16 / 1 GB (``config.rs:36-47``).
"""

from __future__ import annotations

import math

from iceberg_compaction_spark.config import CompactionConfig


def calculate_parallelism(
    total_bytes: int, file_count: int, config: CompactionConfig
) -> tuple[int, int]:
    by_size = math.ceil(total_bytes / config.min_size_per_partition_bytes) if total_bytes else 1
    by_files = (
        math.ceil(file_count / config.max_file_count_per_partition) if file_count else 1
    )
    executor = max(1, min(max(by_size, by_files), config.max_parallelism))
    out = math.ceil(total_bytes / config.target_file_size_bytes) if total_bytes else 1
    output = max(1, min(out, config.max_parallelism))
    return executor, output
