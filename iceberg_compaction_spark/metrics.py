"""Run metrics (A5) — counters + snapshot, reference
``crates/common/src/metrics.rs:12-173`` (bytes read/written, rows,
tasks, commits; Prometheus text). Driver-side dict here; per-task
counting comes free from the lineage rows the compaction runner writes
(plans/compaction.py), which is also where the reference's
TaskStats land (``crates/proto/src/task.rs:263-301``)."""

from __future__ import annotations

import threading
from dataclasses import dataclass, field


@dataclass
class Metrics:
    counters: dict = field(default_factory=dict)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def inc(self, name: str, by: int | float = 1) -> None:
        with self._lock:
            self.counters[name] = self.counters.get(name, 0) + by

    def get(self, name: str) -> float:
        return self.counters.get(name, 0)

    def snapshot(self) -> dict:
        with self._lock:
            return dict(self.counters)

    def prometheus_text(self) -> str:
        lines = []
        for k in sorted(self.counters):
            key = k.replace(".", "_")
            lines.append(f"# TYPE {key} counter")
            lines.append(f"{key} {self.counters[k]}")
        return "\n".join(lines) + "\n"


GLOBAL = Metrics()
