"""File-level pruning from manifest column bounds (scan planning).

The reference gets file pruning for free from Iceberg scan planning:
a pinned snapshot scan yields FileScanTasks whose data files already
carry per-column bounds (``crates/planner/src/file_selection.rs:29``),
decoded for bool/int/long/float/double/string/binary at
``crates/worker/src/datafusion/mod.rs:400-435``. Our manifests store
the same bounds (``sources/manifest.py::_footer_stats``); this module
evaluates a scan predicate against them so a ``ts``-range or key
lookup touches the 1% of files that can match instead of 100% — the
difference between a metadata-sized plan and a full-table scan at
100 TB.

Design rules:
  * **Conservative always.** Pruning may only drop a file when the
    bounds *prove* no row can match. Anything unparseable, any unknown
    bound, any non-conjunctive structure (top-level OR) ⇒ keep.
  * Pruning is an optimization layered under the real filter: the scan
    still applies the full predicate to surviving rows, so a
    no-op pruner is merely slower, never wrong.
  * Supported conjuncts: ``col <op> literal`` for ``= == < <= > >=``,
    ``col IN (...)``, ``col IS NULL`` — ANDed at the top level.
    Literals: numbers, 'strings', TIMESTAMP '...' / DATE '...'.
"""

from __future__ import annotations

import re

_LIT = r"(?:TIMESTAMP\s+'[^']*'|DATE\s+'[^']*'|'[^']*'|\"[^\"]*\"|[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)"
_CMP_RE = re.compile(
    rf"^\s*`?(\w+)`?\s*(<=|>=|==|=|<|>)\s*({_LIT})\s*$", re.IGNORECASE
)
_IN_RE = re.compile(
    rf"^\s*`?(\w+)`?\s+IN\s*\(\s*({_LIT}(?:\s*,\s*{_LIT})*)\s*\)\s*$", re.IGNORECASE
)
_ISNULL_RE = re.compile(r"^\s*`?(\w+)`?\s+IS\s+NULL\s*$", re.IGNORECASE)
_LIT_FINDER = re.compile(_LIT, re.IGNORECASE)


def _split_top_level_and(expr: str) -> list[str] | None:
    """Split on top-level ANDs (outside quotes/parens). A top-level OR
    or NOT makes the whole expression non-conjunctive → None (no
    pruning; the residual filter still enforces it)."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    quote: str | None = None
    tokens = re.split(r"(\s+|\(|\)|'[^']*'|\"[^\"]*\")", expr)
    for tok in tokens:
        if tok is None or tok == "":
            continue
        if quote is None and tok == "(":
            depth += 1
        elif quote is None and tok == ")":
            depth -= 1
        up = tok.upper()
        if depth == 0 and up == "AND":
            parts.append("".join(buf))
            buf = []
            continue
        if depth == 0 and up in ("OR", "NOT"):
            return None
        buf.append(tok)
    parts.append("".join(buf))
    return [p for p in (s.strip() for s in parts) if p]


def _parse_literal(s: str):
    """→ (kind, value) with kind in {'num','str','ts'}."""
    s = s.strip()
    up = s.upper()
    if up.startswith("TIMESTAMP") or up.startswith("DATE"):
        inner = s.split("'", 1)[1].rsplit("'", 1)[0]
        return ("ts", inner.replace(" ", "T"))
    if s and s[0] in "'\"":
        return ("str", s[1:-1])
    return ("num", float(s))


def _strip_outer_parens(s: str) -> str:
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        depth = 0
        for i, ch in enumerate(s):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i != len(s) - 1:
                    return s  # not one balanced wrapper: leave as-is
        s = s[1:-1].strip()
    return s


def parse_conjuncts(expr: str) -> list[tuple]:
    """→ [(col, op, [(kind, value), ...])]; op in {'=','<','<=','>','>=',
    'in','isnull'}. Conjuncts that don't parse are silently dropped
    (they prune nothing; the residual filter enforces them)."""
    parts = _split_top_level_and(expr)
    if parts is None:
        return []
    out: list[tuple] = []
    for p in (_strip_outer_parens(x) for x in parts):
        if (m := _CMP_RE.match(p)) is not None:
            op = "=" if m.group(2) == "==" else m.group(2)
            try:
                out.append((m.group(1), op, [_parse_literal(m.group(3))]))
            except ValueError:
                pass
        elif (m := _IN_RE.match(p)) is not None:
            try:
                lits = [_parse_literal(x) for x in _LIT_FINDER.findall(m.group(2))]
                out.append((m.group(1), "in", lits))
            except ValueError:
                pass
        elif (m := _ISNULL_RE.match(p)) is not None:
            out.append((m.group(1), "isnull", []))
    return out


def _compare(bound, kind: str, lit) -> int | None:
    """cmp(bound, literal) → -1/0/1, or None when incomparable (prune
    nothing). Timestamp bounds are stored isoformat; TIMESTAMP/DATE
    literals are normalized to the same 'T' form, so lexicographic
    order is chronological. Plain string literals compare raw."""
    if bound is None:
        return None
    if kind == "num":
        try:
            bound = float(bound)
        except (TypeError, ValueError):
            return None
    else:
        bound = str(bound)
        if kind == "ts":
            bound = bound.replace(" ", "T")
            # align precision so a DATE literal compares as midnight
            # against timestamp bounds (and vice versa): without this,
            # a file whose min is exactly midnight would be wrongly
            # pruned by `ts <= DATE 'd'` (isoformat 'dT00:00:00' > 'd')
            if "T" in bound and "T" not in lit:
                lit = lit + "T00:00:00"
            elif "T" in lit and "T" not in bound:
                bound = bound + "T00:00:00"
    return (bound > lit) - (bound < lit)


def _eq_possible(st: dict, kind: str, lit) -> bool:
    c_min = _compare(st.get("min"), kind, lit)
    c_max = _compare(st.get("max"), kind, lit)
    if c_min is not None and c_min > 0:
        return False
    if c_max is not None and c_max < 0:
        return False
    return True


def file_may_match(stats: dict, conjuncts: list[tuple]) -> bool:
    """True unless the file's bounds prove a conjunct can't hold."""
    for col, op, lits in conjuncts:
        st = stats.get(col)
        if st is None:
            continue  # no bounds for this column → can't exclude
        if op == "isnull":
            if st.get("nulls") == 0:  # known-zero only; unknown is None
                return False
            continue
        if op == "in":
            if lits and not any(_eq_possible(st, k, v) for k, v in lits):
                return False
            continue
        kind, lit = lits[0]
        c_min = _compare(st.get("min"), kind, lit)
        c_max = _compare(st.get("max"), kind, lit)
        if op == "=" and not _eq_possible(st, kind, lit):
            return False
        if op == "<" and c_min is not None and c_min >= 0:
            return False
        if op == "<=" and c_min is not None and c_min > 0:
            return False
        if op == ">" and c_max is not None and c_max <= 0:
            return False
        if op == ">=" and c_max is not None and c_max < 0:
            return False
    return True


def prune_files(rows: list[dict], filter_expr: str) -> tuple[list[dict], int]:
    """(surviving manifest rows, pruned count) for a scan predicate.
    ``rows`` are data-file manifest entries carrying ``stats_json``."""
    import json

    conjuncts = parse_conjuncts(filter_expr)
    if not conjuncts:
        return rows, 0
    kept = []
    for r in rows:
        try:
            stats = json.loads(r.get("stats_json") or "{}")
        except ValueError:
            stats = {}
        if file_may_match(stats, conjuncts):
            kept.append(r)
    return kept, len(rows) - len(kept)
