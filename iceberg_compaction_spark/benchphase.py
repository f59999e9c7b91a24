"""Per-query phase attribution for the bench harness (round 6,
VERDICT r5 task 1 — carried twice).

Table-backed queries spend most of their wall building a fresh
warehouse fixture before the measured operation runs; a headline sweep
that times the whole callable cannot tell a loaded host from a real
regression. Query functions mark their fixture-construction sections
with ``with benchphase.phase("build"):`` — zero-cost bookkeeping, no
behavior change — and ``bench.py`` resets/snapshots around each timed
rep to report ``{total_s, build_s, op_s}`` per query.

Wall-clock attribution is exact because fixture builds are EAGER
(``Table.create`` / ``append_dataframe`` / delete writes execute
inside the query call); the measured operation is whatever remains —
the eager op actions plus the lazy plan the caller counts.
"""

from __future__ import annotations

import contextlib
import time

_acc: dict[str, float] = {}
_depth: dict[str, int] = {}


@contextlib.contextmanager
def phase(name: str):
    """Accumulate wall time under ``name``. Reentrant: nested phases of
    the same name count once (outermost wins)."""
    _depth[name] = _depth.get(name, 0) + 1
    outermost = _depth[name] == 1
    t0 = time.time()
    try:
        yield
    finally:
        _depth[name] -= 1
        if outermost:
            _acc[name] = _acc.get(name, 0.0) + (time.time() - t0)


def reset() -> None:
    _acc.clear()


def snapshot() -> dict[str, float]:
    return dict(_acc)
