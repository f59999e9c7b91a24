"""Engine configuration.

Defaults mirror the reference's planning/execution defaults
(``/root/reference/crates/common/src/config.rs:36-47,73-84``):
target file 1 GB, small-file threshold 32 MB, max parallelism 16,
min 256 MB per partition, <=100 files per partition, BinPack grouping.
At test scale the thresholds are overridden per-table.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Optional


class SelectionStrategy(str, Enum):
    """File-selection strategies (reference
    ``crates/planner/src/file_selection.rs:180-217``)."""

    FULL = "full"                    # P4: all data files
    SMALL_FILES = "small_files"      # P2: size_bytes <= threshold
    FILES_WITH_DELETES = "files_with_deletes"  # P3: delete_count >= k


class GroupingStrategy(str, Enum):
    """Single group vs bin-packed groups (reference
    ``crates/planner/src/file_selection.rs:57-78``)."""

    SINGLE = "single"
    BIN_PACK = "bin_pack"


class CommitMode(str, Enum):
    """Reference ``crates/proto/src/task.rs:55-68``."""

    PLANNER_COMMIT = "planner_commit"  # default: one atomic commit per run
    WORKER_COMMIT = "worker_commit"    # one commit per bin: finer resume,
    #                                    rewritten work visible immediately
    NO_COMMIT = "no_commit"            # dry run


@dataclass
class CompactionConfig:
    # --- planning (config.rs:36-47) ---
    target_file_size_bytes: int = 1 << 30          # 1 GB
    small_file_threshold_bytes: int = 32 << 20     # 32 MB
    min_delete_count: int = 1                       # P3 threshold
    max_parallelism: int = 16
    min_size_per_partition_bytes: int = 256 << 20  # 256 MB
    max_file_count_per_partition: int = 100
    group_target_size_bytes: int = 1 << 30         # FFD bin target
    selection: SelectionStrategy = SelectionStrategy.SMALL_FILES
    grouping: GroupingStrategy = GroupingStrategy.BIN_PACK
    commit_mode: CommitMode = CommitMode.PLANNER_COMMIT
    # Scope maintenance to specific partitions (None = all): the
    # operational shape for hot-partition compaction — a year-long
    # table maintains today's partition without planning over history.
    partition_filter: Optional[tuple] = None
    # Row-domain predicate scoping selection to data files whose column
    # BOUNDS may match (Iceberg `rewrite_data_files(filter=...)`):
    # matching files are rewritten WHOLE — the filter chooses
    # candidates, it never drops rows. Conservative like scan pruning:
    # an unparseable predicate selects everything.
    row_filter: Optional[str] = None

    # --- execution ---
    # Rows per output file cap (reference writer.rs:139-143 caps 500K
    # rows/file); used when row-size estimate is unavailable.
    max_records_per_file: int = 500_000
    # Inline ("broadcast") delete threshold, reference README.md:60-69.
    inline_delete_threshold_bytes: int = 10 << 20  # 10 MB
    # Sort order applied during rewrite: list of (column, descending).
    sort_order: tuple = (("conv_id", False), ("turn_idx", False))
    # Clustering: None | "linear" | "zorder" | "hilbert"
    clustering: Optional[str] = "linear"
    cluster_columns: tuple = ()
    # Skew note: the rewrite path needs no salt knob — range keys
    # include the tiebreaker column (e.g. turn_idx), so hot keys split
    # across output partitions naturally, and AQE skew-join covers the
    # delete joins. Aggregation-side salting lives in
    # functions/salting.py with its own buckets parameter.

    # --- commit retry (reference crates/common/src/retry.rs:14-101) ---
    commit_max_retries: int = 3
    commit_backoff_base_s: float = 0.05
    commit_backoff_cap_s: float = 30.0

    extra: dict = field(default_factory=dict)

    def records_per_file(self, avg_row_bytes: float) -> int:
        """Target rows/output-file from a bytes-per-row estimate
        (replaces the reference's EWMA size estimator,
        ``writer.rs:246-254`` — Spark's maxRecordsPerFile needs rows)."""
        if avg_row_bytes <= 0:
            return self.max_records_per_file
        est = int(self.target_file_size_bytes / avg_row_bytes)
        return max(1, min(est, self.max_records_per_file))
