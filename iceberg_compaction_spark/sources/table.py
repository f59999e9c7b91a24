"""A minimal Iceberg-semantics table format on plain Parquet + JSON.

Why from scratch: the task mandates it, the sandbox ships no Iceberg
runtime jar, and the reference itself treats table metadata as plain
serialized structs (``crates/planner/src/task_builder.rs:32-49``) with
the real Iceberg transaction left unimplemented
(``crates/planner/src/commit.rs:252-256``). The semantics reproduced
here are the ones the reference actually exercises (SURVEY.md §1):

  * immutable **snapshots** forming a chain; every read/plan pins one
    (``crates/planner/src/file_selection.rs:29``);
  * a **manifest** per snapshot listing live files with size / rows /
    sequence number / partition / column bounds
    (``crates/common/src/file_group.rs:13-28``);
  * **sequence numbers** ordering data vs equality deletes
    (``crates/worker/src/datafusion/sql_builder.rs:136-142``);
  * **atomic commits** with conflict re-validation and retry
    (``crates/planner/src/commit.rs:78-179``) — here a POSIX
    ``O_CREAT|O_EXCL`` lock + atomic ``os.replace`` of the current
    pointer, single-committer (PlannerCommit, ``task.rs:57-61``).

Layout under ``<location>/``::

    data/<commit-uuid>/...parquet      payload files
    deletes/...parquet                 position / equality delete files
    meta/table.json                    schema + partition spec
    meta/current.json                  CAS pointer {current_snapshot_id, sequence_number}
    meta/snap-<sid>.json               snapshot metadata + summary
    meta/manifest-<sid>.parquet/       base manifest: one shard per
                                       partition (dir of parquets)
    meta/delta-<sid>.parquet           delta manifest (adds+tombstones)
    meta/checkpoints/                  per-run lineage (plans/compaction.py)

Partitioning: identity on a *materialized* partition column (default
``_part = date_format(ts, 'yyyy-MM-dd')``). Iceberg hides partition
values in metadata; materializing the column keeps explicit-file-list
scans trivially correct and costs ~10 bytes/row — a documented
deviation. Scans drop it from user-facing output.

Scale notes (reference stretch target ~10^6 files,
``LEARNING_AND_ARCHITECTURE.md:795-799``): commits write delta
manifests (O(changed files)); every ``DELTA_CHAIN_MAX`` commits the
chain collapses into a base manifest SHARDED BY PARTITION, where
untouched partitions hard-link the previous base's shards — so even
the periodic collapse under the commit lock is O(changed partitions),
not O(table files). Planning reads manifests as Spark DataFrames
(``files_df``), so no driver bottleneck in the plan itself.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Collection, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_compaction_spark.errors import (
    CommitConflict,
    StorageError,
    ValidationError,
    with_retry,
)
from iceberg_compaction_spark.metrics import GLOBAL as METRICS
from iceberg_compaction_spark.operators.mor import FILE_COL, POS_COL, SEQ_COL, apply_deletes
from iceberg_compaction_spark.sources import manifest as mf
from iceberg_compaction_spark.sources import scan as scan_mod

PART_COL = "_part"


def bucket_partition_spec(source_col: str, n: int) -> dict:
    """Iceberg-style ``bucket[n]`` hidden-partitioning spec: the
    partition value is ``pmod(hash(col), n)`` as a string. Declaring
    ``source_col`` opts the spec into transform predicate projection
    (``plans/transforms.py``): a ``source_col = X`` / ``IN`` point
    lookup prunes to exactly the matching bucket's files — the
    co-location primitive that turns a 100 TB key lookup into a
    1/n-of-files scan without the caller ever naming ``_part``."""
    return {
        "field": PART_COL,
        "expr": f"CAST(pmod(hash({source_col}), {int(n)}) AS STRING)",
        "source_col": source_col,
    }


class LockBusy(StorageError):
    retryable = True


def _now_ms() -> int:
    return int(time.time() * 1000)


class Table:
    def __init__(self, location: str, meta: dict):
        self.location = os.path.abspath(location)
        self.meta = meta
        # observability for the most recent scan(filter=...) on this
        # handle: how many data files the manifest bounds excluded, and
        # how many delete files survived per-scan scoping (plan tests)
        self.last_scan_pruned_files = 0
        self.last_scan_pos_delete_files = 0
        self.last_scan_eq_delete_files = 0

    # ------------------------------------------------------------------
    # paths
    @property
    def _meta_dir(self) -> str:
        return os.path.join(self.location, "meta")

    @property
    def data_dir(self) -> str:
        return os.path.join(self.location, "data")

    @property
    def deletes_dir(self) -> str:
        return os.path.join(self.location, "deletes")

    def _current_path(self) -> str:
        return os.path.join(self._meta_dir, "current.json")

    def _snap_path(self, sid: int) -> str:
        return os.path.join(self._meta_dir, f"snap-{sid:08d}.json")

    def _manifest_path(self, sid: int) -> str:
        return os.path.join(self._meta_dir, f"manifest-{sid:08d}.parquet")

    def _delta_path(self, sid: int) -> str:
        return os.path.join(self._meta_dir, f"delta-{sid:08d}.parquet")

    # ------------------------------------------------------------------
    # create / load
    @staticmethod
    def create(
        location: str,
        schema_ddl: str,
        partition: dict | None = None,
        name: str | None = None,
        bloom: dict | None = None,
    ) -> "Table":
        """``partition`` e.g. {"field": "_part",
        "expr": "date_format(ts, 'yyyy-MM-dd')"} or None.
        ``bloom`` e.g. {"columns": ["conv_id"], "fpp": 0.01} enables
        per-file manifest blooms (point-lookup file pruning) plus
        parquet-level blooms (row-group skipping) on those columns."""
        location = os.path.abspath(location)
        meta_dir = os.path.join(location, "meta")
        os.makedirs(meta_dir, exist_ok=False)
        os.makedirs(os.path.join(location, "data"), exist_ok=True)
        os.makedirs(os.path.join(location, "deletes"), exist_ok=True)
        meta = {
            "name": name or os.path.basename(location),
            "schema_ddl": schema_ddl,
            "partition": partition,
            "bloom": bloom,
            "created_ms": _now_ms(),
        }
        with open(os.path.join(meta_dir, "table.json"), "w") as f:
            json.dump(meta, f, indent=1)
        cur = {"current_snapshot_id": None, "sequence_number": 0}
        with open(os.path.join(meta_dir, "current.json"), "w") as f:
            json.dump(cur, f)
        return Table(location, meta)

    @staticmethod
    def load(location: str) -> "Table":
        with open(os.path.join(location, "meta", "table.json")) as f:
            return Table(location, json.load(f))

    # ------------------------------------------------------------------
    # schema
    def schema(self) -> T.StructType:
        """Requires an active SparkSession (DDL parsing is JVM-side)."""
        return T.StructType.fromDDL(self.meta["schema_ddl"])

    def schema_fields(self) -> list[tuple[str, str]]:
        """(name, ddl_type) pairs — text-level parse so no SparkSession
        is needed; top-level commas only (nested types contain commas
        inside <>)."""
        cols, depth, cur = [], 0, ""
        for ch in self.meta["schema_ddl"]:
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            if ch == "," and depth == 0:
                cols.append(cur)
                cur = ""
            else:
                cur += ch
        if cur.strip():
            cols.append(cur)
        out = []
        for c in cols:
            name, typ = c.strip().split(None, 1)
            out.append((name.strip("`"), typ.strip()))
        return out

    def user_columns(self) -> list[str]:
        return [name for name, _ in self.schema_fields()]

    # ------------------------------------------------------------------
    # schema evolution: because every read supplies the table schema to
    # the Parquet scan (read_data_files), columns absent from old files
    # surface as nulls automatically — so add/drop are metadata-only,
    # no data rewrite, exactly Iceberg's semantics for these two ops.
    def _write_meta(self) -> None:
        tmp = os.path.join(self._meta_dir, f"table.json.tmp.{os.getpid()}")
        with open(tmp, "w") as f:
            json.dump(self.meta, f, indent=1)
        os.replace(tmp, os.path.join(self._meta_dir, "table.json"))

    def _locked_meta_write(self, mut) -> None:
        """Serialize table.json read-modify-writes under the commit
        lock, refreshing ``self.meta`` from disk first so a concurrent
        writer's update (property set, ANALYZE stats, schema change)
        is never silently lost — the same discipline refs.json already
        follows. ``mut`` mutates ``self.meta`` in place; validation
        errors it raises propagate (only LockBusy retries)."""

        def attempt() -> None:
            with self._lock():
                try:
                    with open(os.path.join(self._meta_dir, "table.json")) as f:
                        self.meta = json.load(f)
                except (FileNotFoundError, ValueError):
                    pass  # keep the in-memory copy (e.g. mid-create)
                mut()
                self._write_meta()

        with_retry(attempt, retries=5, base_s=0.05, cap_s=5.0, retry_on=(LockBusy,))

    # Iceberg-style table properties: persisted per-table configuration
    # that operators read as their defaults (explicit arguments always
    # win). Known keys: write.delete.mode / write.update.mode
    # ('mor'|'cow'), compaction.target-file-size-bytes,
    # compaction.group-target-size-bytes.
    def set_property(self, key: str, value) -> None:
        def mut() -> None:
            props = dict(self.meta.get("properties") or {})
            props[key] = value
            self.meta["properties"] = props

        self._locked_meta_write(mut)

    def unset_property(self, key: str) -> None:
        def mut() -> None:
            props = dict(self.meta.get("properties") or {})
            props.pop(key, None)
            self.meta["properties"] = props

        self._locked_meta_write(mut)

    def get_property(self, key: str, default=None):
        # NOT named 'property': that would shadow the @property decorator
        # for the rest of the class body
        return (self.meta.get("properties") or {}).get(key, default)

    def set_partition_expr(self, expr: str | None) -> None:
        """Partition evolution: change how FUTURE writes derive the
        partition value (e.g. day → month), or stop partitioning with
        ``None``. Existing files keep their old values — legal because
        the partition value is a materialized per-file column, so
        planning (bins never span partition values) and pruning (real
        column bounds) are exact across the mixed layout; a full
        rewrite migrates old files when wanted."""

        def mut() -> None:
            if expr is None:
                self.meta["partition"] = None
            elif self.meta.get("partition"):
                self.meta["partition"] = {**self.meta["partition"], "expr": expr}
            else:
                self.meta["partition"] = {"field": PART_COL, "expr": expr}
            # migration bookkeeping: data files committed at seq ≤ this
            # floor predate the new spec; files written afterwards
            # always derive their partition from the CURRENT expr, so
            # ``migrate_partition_spec`` selects exactly the old-grain
            # files and its own outputs never re-plan (idempotent,
            # bin-granular resume)
            self.meta["partition_spec_floor"] = self.sequence_number

        self._locked_meta_write(mut)

    def set_bloom_columns(
        self, columns: Sequence[str] | None, fpp: float = 0.01, ndv: int = 100_000
    ) -> None:
        """Enable/disable bloom filters for FUTURE writes (existing
        files gain blooms when compaction rewrites them — same
        mixed-layout rule as partition evolution: a file without a
        bloom simply never bloom-prunes)."""

        def mut() -> None:
            self.meta["bloom"] = (
                {"columns": list(columns), "fpp": fpp, "ndv": ndv} if columns else None
            )

        self._locked_meta_write(mut)

    def bloom_write_options(self, writer):
        """Parquet-level bloom filters on configured columns: row groups
        inside files that survive manifest pruning get skipped by the
        scan when the point predicate misses them."""
        spec = self.meta.get("bloom")
        if spec:
            for c in spec.get("columns", ()):
                writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
                writer = writer.option(
                    f"parquet.bloom.filter.expected.ndv#{c}", str(spec.get("ndv", 100_000))
                )
        return writer

    def attach_blooms(self, infos: list, spark: SparkSession) -> list:
        """Merge per-file manifest bloom DESCRIPTORS into freshly
        written files' stats (one narrow column scan per bloom column;
        no-op unless the table configures blooms). The bitmaps
        themselves land in ONE sidecar file per column per call under
        ``meta/blooms/`` — the manifest stays manifest-sized and the
        probe loads bitmaps lazily for bounds-surviving files only."""
        spec = self.meta.get("bloom")
        if not spec or not infos:
            return infos
        from iceberg_compaction_spark.functions import bloom as bloom_mod

        paths = [fi.path for fi in infos]
        for col in spec.get("columns", ()):
            blooms = bloom_mod.compute_file_blooms(
                spark, paths, col, fpp=spec.get("fpp", 0.01)
            )
            descriptors = bloom_mod.write_sidecar(
                blooms, os.path.join(self._meta_dir, "blooms"), col
            )
            for fi in infos:
                b = descriptors.get(fi.path)
                if b is None:
                    continue  # e.g. the column was all-null in this file
                st = json.loads(fi.stats_json or "{}")
                st.setdefault(col, {"min": None, "max": None, "nulls": None})["bloom"] = b
                fi.stats_json = json.dumps(st, sort_keys=True)
        return infos

    #: legal lossless promotions (Iceberg type-promotion table)
    _WIDENINGS = {
        "tinyint": {"smallint", "int", "bigint"},
        "smallint": {"int", "bigint"},
        "int": {"bigint"},
        "float": {"double"},
    }

    def add_column(self, name: str, ddl_type: str, default=None) -> None:
        """Append a nullable column. Existing files never change; scans
        return ``default`` (Iceberg v3 initial-default; NULL when
        unset) for rows written before the column existed — and ONLY
        for those rows: post-add files with genuine NULLs keep them."""

        def mut() -> None:
            if name in self.user_columns():
                raise ValidationError(f"column {name} already exists")
            self.meta["schema_ddl"] = f"{self.meta['schema_ddl']}, {name} {ddl_type}"
            if default is not None:
                self.meta["column_defaults"] = (
                    self.meta.get("column_defaults") or []
                ) + [
                    {
                        "seq": self.sequence_number,
                        "ord": self._next_evo_ord(),
                        "col": name,
                        "value": default,
                    }
                ]

        self._locked_meta_write(mut)

    def _next_evo_ord(self) -> int:
        """Strict recording order across ALL schema-evolution events:
        several can share one commit seq (back-to-back renames with no
        commit between), and epoch resolution must replay them
        newest-first."""
        return (
            len(self.meta.get("renames") or [])
            + len(self.meta.get("widenings") or [])
            + len(self.meta.get("column_defaults") or [])
        )

    def widen_column(self, name: str, new_type: str) -> None:
        """Lossless type promotion (int→bigint, float→double, …),
        metadata-only: old files keep the narrow physical type; reads
        cast per epoch. Iceberg's type-promotion rules gate what's
        legal."""
        new_type_n = new_type.strip().lower()

        def mut() -> None:
            cols = self.user_columns()
            if name not in cols:
                raise ValidationError(f"no such column {name}")
            cur_type = None
            pieces, depth, cur = [], 0, ""
            for ch in self.meta["schema_ddl"]:
                if ch == "<":
                    depth += 1
                elif ch == ">":
                    depth -= 1
                if ch == "," and depth == 0:
                    pieces.append(cur)
                    cur = ""
                else:
                    cur += ch
            if cur.strip():
                pieces.append(cur)
            out = []
            for p in pieces:
                cname, rest = p.strip().split(None, 1)
                if cname.strip("`") == name:
                    cur_type = rest.strip().lower()
                    out.append(f"{name} {new_type_n}")
                else:
                    out.append(p.strip())
            if new_type_n not in Table._WIDENINGS.get(cur_type, set()):
                raise ValidationError(f"cannot widen {name}: {cur_type} → {new_type_n}")
            self.meta["schema_ddl"] = ", ".join(out)
            self.meta["widenings"] = (self.meta.get("widenings") or []) + [
                {
                    "seq": self.sequence_number,
                    "ord": self._next_evo_ord(),
                    "col": name,
                    "from": cur_type,
                    "to": new_type_n,
                }
            ]

        self._locked_meta_write(mut)

    def drop_column(self, name: str) -> None:
        """Remove a column from the schema. Data files keep the bytes
        (dead until compaction rewrites them); scans stop projecting it
        immediately."""

        def mut() -> None:
            part = self.meta.get("partition")
            if part and name == part["field"]:
                raise ValidationError("cannot drop the partition column")
            cols = self.user_columns()
            if name not in cols:
                raise ValidationError(f"no such column {name}")
            if len(cols) == 1:
                raise ValidationError("cannot drop the last column")
            pieces, depth, cur = [], 0, ""
            for ch in self.meta["schema_ddl"]:
                if ch == "<":
                    depth += 1
                elif ch == ">":
                    depth -= 1
                if ch == "," and depth == 0:
                    pieces.append(cur)
                    cur = ""
                else:
                    cur += ch
            if cur.strip():
                pieces.append(cur)
            kept = [p for p in pieces if p.strip().split()[0].strip("`") != name]
            self.meta["schema_ddl"] = ", ".join(p.strip() for p in kept)

        self._locked_meta_write(mut)

    def rename_column(self, old: str, new: str) -> None:
        """Metadata-only column rename, Iceberg-style: no data rewrite.
        Files written before the rename keep the old PHYSICAL name;
        reads group files by name epoch (``read_data_rows``) and
        normalize to current names — Spark's name-based parquet
        resolution would otherwise silently return NULL for the renamed
        column on old files. Old files' manifest stats stay keyed by
        the historic name, so bounds/bloom pruning on the new name is
        simply skipped for them (conservative); compaction rewrites
        migrate files to current names."""

        def mut() -> None:
            cols = self.user_columns()
            if old not in cols:
                raise ValidationError(f"no such column {old}")
            if new in cols:
                raise ValidationError(f"column {new} already exists")
            part = self.meta.get("partition")
            if part and old == part["field"]:
                raise ValidationError("cannot rename the partition column")
            for r in self.files(content=mf.CONTENT_EQ_DEL):
                if old in (r["equality_ids"] or []):
                    raise ValidationError(
                        f"column {old} is referenced by live equality-delete files; "
                        "compact them away first"
                    )
            pieces, depth, cur = [], 0, ""
            for ch in self.meta["schema_ddl"]:
                if ch == "<":
                    depth += 1
                elif ch == ">":
                    depth -= 1
                if ch == "," and depth == 0:
                    pieces.append(cur)
                    cur = ""
                else:
                    cur += ch
            if cur.strip():
                pieces.append(cur)
            out = []
            for p in pieces:
                name, rest = p.strip().split(None, 1)
                out.append(f"{new} {rest}" if name.strip("`") == old else p.strip())
            self.meta["schema_ddl"] = ", ".join(out)
            self.meta["renames"] = (self.meta.get("renames") or []) + [
                {
                    "seq": self.sequence_number,
                    "ord": self._next_evo_ord(),
                    "from": old,
                    "to": new,
                }
            ]

        self._locked_meta_write(mut)

    def _epoch_info(self, file_seq: int) -> tuple[dict, dict, dict]:
        """Schema-evolution view of a file committed at ``file_seq``:
        (current→physical name, current→physical ddl type for widened
        columns, current→initial default for columns added later).
        Events recorded at seq >= file_seq happened AFTER the file was
        written; walking them newest→oldest keeps the tracked name
        aligned with each event's contemporary name, so renames,
        widenings, and defaulted adds compose in any order."""
        events = sorted(
            [("rename", r) for r in (self.meta.get("renames") or [])]
            + [("widen", w) for w in (self.meta.get("widenings") or [])]
            + [("default", d) for d in (self.meta.get("column_defaults") or [])],
            key=lambda e: (e[1]["seq"], e[1].get("ord", 0)),
            reverse=True,
        )
        names: dict = {}
        types: dict = {}
        defaults: dict = {}
        for c in self.user_columns():
            name = c
            for kind, ev in events:
                if ev["seq"] < file_seq:
                    break
                if kind == "rename" and ev["to"] == name:
                    name = ev["from"]
                elif kind == "widen" and ev["col"] == name:
                    types[c] = ev["from"]  # older events narrow further
                elif kind == "default" and ev["col"] == name:
                    defaults[c] = ev["value"]  # file predates the column
            if name != c:
                names[c] = name
        return names, types, defaults

    def read_data_rows(
        self,
        spark: SparkSession,
        rows: Sequence[dict],
        with_file: bool = False,
        with_pos: bool = False,
        seq_by_path: dict | None = None,
    ) -> DataFrame:
        """Epoch-aware data read over manifest ``rows``: files are
        grouped by their historic column names (one extra read per
        rename epoch actually present — zero-cost when the table was
        never renamed) and every group is normalized to CURRENT names
        before the union."""
        phys = self.physical_schema()
        groups: dict[tuple, list] = {}
        for r in rows:
            names, types, defaults = self._epoch_info(r["sequence_number"])
            key = (
                tuple(sorted(names.items())),
                tuple(sorted(types.items())),
                tuple(sorted(defaults.items())),
            )
            groups.setdefault(key, []).append(r)
        parts = []
        # repr-keyed sort: default VALUES can differ in type across
        # epochs, and raw tuple comparison would TypeError on int-vs-str
        for key, grp in sorted(groups.items(), key=lambda kv: repr(kv[0])):
            names, types, defaults = (dict(k) for k in key)
            hist = T.StructType(
                [
                    T.StructField(
                        names.get(f.name, f.name),
                        T.StructType.fromDDL(f"x {types[f.name]}")[0].dataType
                        if f.name in types
                        else f.dataType,
                        f.nullable,
                    )
                    for f in phys.fields
                ]
            )
            paths = [r["path"] for r in grp]
            sub_seq = (
                {p: seq_by_path[p] for p in paths if p in seq_by_path}
                if seq_by_path is not None
                else None
            )
            df = scan_mod.read_data_files(
                spark,
                paths,
                schema=hist,
                with_file=with_file,
                with_pos=with_pos,
                seq_by_path=sub_seq,
            )
            if names or types or defaults:
                # one simultaneous projection — sequential renames would
                # break on name-reuse chains (a→b then c→a); widened
                # columns cast narrow→current; columns added later (with
                # an initial default) materialize the default for these
                # pre-add files only
                inv = {old_name: cur_name for cur_name, old_name in names.items()}
                by_cur = {f.name: f for f in phys.fields}
                cols = []
                for c in df.columns:
                    cur = inv.get(c, c)
                    expr = F.col(c)
                    if cur in defaults:
                        expr = F.lit(defaults[cur])
                    if cur in by_cur and (cur in types or cur in defaults):
                        expr = expr.cast(by_cur[cur].dataType)
                    cols.append(expr.alias(cur))
                df = df.select(cols)
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def physical_schema(self) -> T.StructType:
        s = self.schema()
        if self.meta.get("partition"):
            s = T.StructType(list(s.fields) + [T.StructField(PART_COL, T.StringType())])
        return s

    def column_type_categories(self) -> dict:
        """{column: 'ts'|'str'|'num'|'other'} over the physical schema —
        the type context the stats pruner needs so ts-shaped string
        literals normalize ONLY on real timestamp/date columns (on a
        string column Spark compares them raw, and so must the
        pruner)."""
        from iceberg_compaction_spark.plans import pruning

        return pruning.col_type_categories(self.physical_schema())

    # ------------------------------------------------------------------
    # snapshot state
    def _read_current(self) -> dict:
        with open(self._current_path()) as f:
            return json.load(f)

    @property
    def current_snapshot_id(self) -> int | None:
        return self._read_current()["current_snapshot_id"]

    @property
    def sequence_number(self) -> int:
        return self._read_current()["sequence_number"]

    def snapshot(self, sid: int) -> dict:
        with open(self._snap_path(sid)) as f:
            return json.load(f)

    def snapshot_as_of(self, timestamp_ms: int) -> int:
        """Newest snapshot committed at or before ``timestamp_ms`` on
        the CURRENT branch's ancestry — Iceberg's ``FOR TIMESTAMP AS
        OF``. Walks parent_ids (snapshot JSONs only) so side-branch
        snapshots never leak into main's history."""
        s = self.current_snapshot_id
        while s is not None:
            snap = self.snapshot(s)
            if snap["timestamp_ms"] <= timestamp_ms:
                return s
            s = snap["parent_id"]
        raise ValidationError(
            f"no snapshot at or before {timestamp_ms} (table created later?)"
        )

    def snapshots(self) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(self._meta_dir)):
            if fn.startswith("snap-") and fn.endswith(".json"):
                with open(os.path.join(self._meta_dir, fn)) as f:
                    out.append(json.load(f))
        return out

    # manifest cache (C8, reference ManifestCache metadata.rs:110-260):
    # manifests are immutable per snapshot id, so a bounded cache keyed
    # by manifest/delta path is always coherent; expiry invalidates by
    # existence check. Cached values are FULLY-RESOLVED listings, so a
    # delta chain resolves each ancestor at most once.
    _manifest_cache: dict = {}
    _MANIFEST_CACHE_MAX = 64
    # Delta chains are collapsed into a fresh base every N commits so
    # resolution work and expiry materialization stay bounded.
    DELTA_CHAIN_MAX = 32
    # Above this many live data files, scan-filter pruning runs
    # executor-side over files_df (plans/pruning_df) instead of the
    # driver Python loop — same evaluator, distributed decode.
    PRUNE_DF_THRESHOLD = 4096

    @staticmethod
    def _cache_put(key: str, rows: list[dict]) -> None:
        if len(Table._manifest_cache) >= Table._MANIFEST_CACHE_MAX:
            Table._manifest_cache.pop(next(iter(Table._manifest_cache)))
        Table._manifest_cache[key] = rows

    def _resolve_manifest(self, sid: int) -> list[dict]:
        """Full listing at ``sid``: a base manifest read, or the parent
        resolution patched with this snapshot's delta (removes then
        adds). Recursion depth ≤ DELTA_CHAIN_MAX."""
        try:
            snap = self.snapshot(sid)
        except FileNotFoundError:
            raise ValidationError(f"snapshot {sid} expired or unknown") from None
        kind = snap.get("manifest_kind", "base")
        key = self._manifest_path(sid) if kind == "base" else self._delta_path(sid)
        if not os.path.exists(key):
            Table._manifest_cache.pop(key, None)
            raise ValidationError(f"snapshot {sid} expired or unknown")
        cached = Table._manifest_cache.get(key)
        if cached is not None:
            return cached
        if kind == "base":
            rows = mf.read_manifest(key)
        else:
            parent_rows = self._resolve_manifest(snap["parent_id"])
            adds, removed = mf.read_delta_manifest(key)
            rows = [r for r in parent_rows if r["path"] not in removed] + adds
        self._cache_put(key, rows)
        return rows

    def _chain_context(self, parent: int | None) -> tuple[dict, set | None]:
        """(ancestor base's shard map, partitions touched since it) —
        the inputs for an O(changed-partitions) base collapse. Walks
        snapshot JSONs only, never file rows. ``touched=None`` means
        unknown (a legacy delta without the field): rewrite everything."""
        reuse: dict = {}
        touched: set = set()
        s = parent
        while s is not None:
            snap = self.snapshot(s)
            if snap.get("manifest_kind", "base") == "base":
                reuse = snap.get("shards") or {}
                break
            tp = snap.get("touched_partitions")
            if tp is None:
                return {}, None
            touched |= set(tp)
            s = snap["parent_id"]
        return reuse, touched

    def manifest(self, snapshot_id: int | None = None) -> list[dict]:
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id
        if sid is None:
            return []
        return [dict(r) for r in self._resolve_manifest(sid)]

    def added_files_between(
        self, from_snapshot_id: int | None, to_snapshot_id: int | None = None
    ) -> list[dict]:
        """Data-file manifest rows added by commits AFTER
        ``from_snapshot_id`` up to and including ``to_snapshot_id`` —
        the Iceberg incremental-read primitive. Computed as a manifest
        set difference, so it is exact even across base rewrites.
        ``from_snapshot_id=None`` means from table creation."""
        new_rows = [
            r
            for r in self.manifest(to_snapshot_id)
            if r["content"] == mf.CONTENT_DATA
        ]
        if from_snapshot_id is None:
            return new_rows
        old = {
            r["path"]
            for r in self.manifest(from_snapshot_id)
            if r["content"] == mf.CONTENT_DATA
        }
        return [r for r in new_rows if r["path"] not in old]

    def incremental_scan(
        self,
        spark: SparkSession,
        from_snapshot_id: int | None,
        to_snapshot_id: int | None = None,
        columns: Sequence[str] | None = None,
    ) -> DataFrame:
        """Append-only incremental read: rows in data files added
        between two snapshots (exclusive from, inclusive to). The
        change-capture shape an ingest-then-derive pipeline polls;
        compaction rewrites re-add rows under new paths, so run
        incremental consumers against ingest snapshots or diff against
        the replace commit's inputs."""
        user_cols = list(columns or self.user_columns())
        rows = self.added_files_between(from_snapshot_id, to_snapshot_id)
        if not rows:
            return spark.createDataFrame([], schema=self.schema()).select(*user_cols)
        return self.read_data_rows(spark, rows).select(*user_cols)

    def materialize_base(self, sid: int) -> None:
        """Collapse a delta-chained snapshot into a standalone base
        manifest. Used by snapshot expiry before deleting ancestors a
        retained snapshot's resolution still depends on."""
        snap = self.snapshot(sid)
        if snap.get("manifest_kind", "base") == "base":
            return
        rows = self._resolve_manifest(sid)
        # sharded like a commit-time collapse: untouched partitions
        # hard-link their ancestor base's shards; this snapshot's own
        # delta counts as touched too
        reuse, chain_touched = self._chain_context(snap["parent_id"])
        own = snap.get("touched_partitions")
        if chain_touched is None or own is None:
            reuse, touched = {}, {r.get("partition") or "" for r in rows}
        else:
            touched = chain_touched | set(own)
        shards, n_w, n_r = mf.write_manifest_sharded(
            rows, self._manifest_path(sid), reuse=reuse, touched=touched
        )
        snap["manifest_kind"] = "base"
        snap["delta_depth"] = 0
        snap["manifest"] = self._manifest_path(sid)
        snap["shards"] = shards
        tmp = self._snap_path(sid) + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(snap, f, indent=1)
        os.replace(tmp, self._snap_path(sid))
        delta = self._delta_path(sid)
        Table._manifest_cache.pop(delta, None)
        self._cache_put(self._manifest_path(sid), rows)
        if os.path.exists(delta):
            os.unlink(delta)

    def resolution_ancestors(self, sid: int) -> set:
        """Snapshot ids this snapshot's manifest resolution reads —
        the delta chain up to and including its base (empty for a
        base snapshot)."""
        out: set = set()
        snap = self.snapshot(sid)
        while snap.get("manifest_kind", "base") != "base":
            parent = snap["parent_id"]
            out.add(parent)
            snap = self.snapshot(parent)
        return out

    def files(self, snapshot_id: int | None = None, content: str | None = None) -> list[dict]:
        rows = self.manifest(snapshot_id)
        if content:
            rows = [r for r in rows if r["content"] == content]
        return rows

    def files_df(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        """The manifest as a Spark DataFrame — the ``.files`` metadata
        table (S1); planning jobs stay DataFrame-native at scale.

        Delta chains resolve executor-side: base + delta parquets union
        with a chain ordinal; per path the newest op wins (an add and a
        remove in one commit resolve to the add). The driver walks only
        snapshot JSONs, never file rows."""
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id
        if sid is None:
            return spark.createDataFrame([], schema=self._files_df_schema())
        deltas: list[str] = []
        s = sid
        while True:
            snap = self.snapshot(s)
            if snap.get("manifest_kind", "base") == "base":
                base_path = self._manifest_path(s)
                break
            deltas.append(self._delta_path(s))
            s = snap["parent_id"]
        deltas.reverse()
        df = (
            spark.read.parquet(base_path)
            .withColumn("op", F.lit("add"))
            .withColumn("_ord", F.lit(0))
        )
        for i, p in enumerate(deltas):
            df = df.unionByName(
                spark.read.parquet(p).withColumn("_ord", F.lit(i + 1))
            )
        if not deltas:
            return df.drop("op", "_ord")
        from pyspark.sql import Window

        w = Window.partitionBy("path").orderBy(F.desc("_ord"), F.asc("op"))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & (F.col("op") == "add"))
            .drop("_rn", "_ord", "op")
        )

    @staticmethod
    def _files_df_schema() -> T.StructType:
        return T.StructType.fromDDL(
            "path string, content string, size_bytes bigint, record_count bigint,"
            " sequence_number bigint, partition string, equality_ids array<string>,"
            " stats_json string"
        )

    # ------------------------------------------------------------------
    # tags (autoCreateTags, reference maintainer catalog
    # LEARNING_AND_ARCHITECTURE.md:173-179): named snapshot refs that
    # retention must respect
    def _tags_path(self) -> str:
        return os.path.join(self._meta_dir, "tags.json")

    def tags(self) -> dict:
        try:
            with open(self._tags_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def tag(self, name: str, snapshot_id: int | None = None) -> None:
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id
        if sid is None or not os.path.exists(self._snap_path(sid)):
            raise ValidationError(f"cannot tag unknown snapshot {sid}")
        tags = self.tags()
        tags[name] = sid
        tmp = self._tags_path() + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(tags, f)
        os.replace(tmp, self._tags_path())

    def untag(self, name: str) -> None:
        tags = self.tags()
        tags.pop(name, None)
        tmp = self._tags_path() + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(tags, f)
        os.replace(tmp, self._tags_path())

    # ------------------------------------------------------------------
    # branches (write-audit-publish): a branch is a movable ref commits
    # can target instead of main. Iceberg semantics: snapshot ids stay
    # globally unique (allocated from the shared commit counter, which
    # equals parent+1 on a linear main-only history), every branch
    # snapshot chains via parent_id, and publishing is a FAST-FORWARD of
    # main — only legal when main is still an ancestor of the branch
    # head, i.e. nothing was published meanwhile.
    def _refs_path(self) -> str:
        return os.path.join(self._meta_dir, "refs.json")

    def refs(self) -> dict:
        try:
            with open(self._refs_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def _write_refs(self, refs: dict) -> None:
        tmp = self._refs_path() + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(refs, f)
        os.replace(tmp, self._refs_path())

    def create_branch(self, name: str, snapshot_id: int | None = None) -> int:
        """Branch off ``snapshot_id`` (default: current main head; a
        branch may start from an empty table as ``None``). Mutates
        refs.json UNDER THE COMMIT LOCK: branch commits rewrite the
        same file under the lock, so an unlocked read-modify-write here
        could lose a concurrent branch commit (or vice versa)."""

        def attempt() -> int:
            with self._lock():
                sid = (
                    snapshot_id if snapshot_id is not None else self.current_snapshot_id
                )
                if sid is not None and not os.path.exists(self._snap_path(sid)):
                    raise ValidationError(f"cannot branch from unknown snapshot {sid}")
                refs = self.refs()
                if name in refs:
                    raise ValidationError(f"branch {name} already exists")
                refs[name] = sid
                self._write_refs(refs)
                return sid

        return with_retry(attempt, retries=5, base_s=0.05, cap_s=5.0, retry_on=(LockBusy,))

    def ref_head(self, name: str) -> int | None:
        refs = self.refs()
        if name not in refs:
            raise ValidationError(f"no such branch {name}")
        return refs[name]

    def drop_branch(self, name: str) -> None:
        def attempt() -> None:
            with self._lock():
                refs = self.refs()
                refs.pop(name, None)
                self._write_refs(refs)

        with_retry(attempt, retries=5, base_s=0.05, cap_s=5.0, retry_on=(LockBusy,))

    def _is_ancestor(self, maybe_ancestor: int | None, sid: int | None) -> bool:
        """True when ``maybe_ancestor`` lies on ``sid``'s parent chain
        (None is everyone's ancestor: the empty table). A chain that
        crosses an expired snapshot raises a clean ValidationError
        instead of FileNotFoundError (snapshot expiry retains every
        ref's ancestry, so this only fires on histories expired before
        that invariant existed or on corrupted metadata)."""
        if maybe_ancestor is None:
            return True
        s = sid
        while s is not None:
            if s == maybe_ancestor:
                return True
            try:
                s = self.snapshot(s)["parent_id"]
            except FileNotFoundError:
                raise ValidationError(
                    f"ancestry walk from {sid} crossed expired snapshot {s}"
                ) from None
        return False

    def fast_forward_main(self, branch: str) -> int:
        """Publish: move main to the branch head. Refuses when main
        moved since the branch was cut (the WAP conflict) — rebase by
        re-running the audit pipeline on a fresh branch instead."""
        with self._lock():
            head = self.ref_head(branch)
            if head is None:
                raise ValidationError(f"branch {branch} has no commits")
            cur = self._read_current()
            if not self._is_ancestor(cur["current_snapshot_id"], head):
                raise CommitConflict(
                    f"main at {cur['current_snapshot_id']} is not an ancestor of "
                    f"{branch} head {head}; cannot fast-forward"
                )
            tmp = self._current_path() + f".tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(
                    {"current_snapshot_id": head, "sequence_number": cur["sequence_number"]}, f
                )
            os.replace(tmp, self._current_path())
            return head

    def rollback_to(self, snapshot_id: int) -> int:
        """Roll the table back to an older snapshot's CONTENT as a new
        commit (history preserved, like Iceberg's rollback): the diff
        vs the current listing is committed, so delta-manifest IO stays
        O(changed files). The current snapshot id is captured BEFORE
        the diff and pinned as ``expected_snapshot_id`` — a commit
        racing in between surfaces as CommitConflict instead of being
        silently folded into the 'rollback'."""
        cur_sid = self.current_snapshot_id
        target = {r["path"]: r for r in self.manifest(snapshot_id)}
        current = {r["path"]: r for r in self.manifest(cur_sid)}
        added = [
            mf.FileInfo(**{k: r[k] for k in (
                "path", "content", "size_bytes", "record_count", "sequence_number",
                "partition", "equality_ids", "stats_json",
            )})
            for p, r in sorted(target.items())
            if p not in current
        ]
        removed = sorted(p for p in current if p not in target)
        return self.commit(
            "rollback",
            added=added,
            removed_paths=removed,
            expected_snapshot_id=cur_sid,
            extra_summary={"rolled_back_to": snapshot_id},
        )

    # ------------------------------------------------------------------
    # commit protocol
    def _lock(self):
        lock_path = os.path.join(self._meta_dir, "commit.lock")

        class _Lock:
            def __enter__(inner):
                try:
                    fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                except FileExistsError:
                    # steal stale locks (crashed committer)
                    try:
                        if time.time() - os.path.getmtime(lock_path) > 60:
                            os.unlink(lock_path)
                    except FileNotFoundError:
                        pass
                    raise LockBusy("commit lock held")
                os.write(fd, f"{os.getpid()} {time.time()}".encode())
                os.close(fd)
                return inner

            def __exit__(inner, *exc):
                try:
                    os.unlink(lock_path)
                except FileNotFoundError:
                    pass

        return _Lock()

    def commit(
        self,
        operation: str,
        added: Sequence[mf.FileInfo] = (),
        removed_paths: Sequence[str] = (),
        expected_snapshot_id: int | None = ...,
        retries: int = 5,
        backoff_base_s: float = 0.05,
        backoff_cap_s: float = 30.0,
        extra_summary: dict | None = None,
        force_base: bool = False,
        branch: str | None = None,
    ) -> int:
        """Atomically produce the next snapshot.

        Validation mirrors the reference's conflict re-validation
        (commit.rs:294-327 / TECHNICAL_DEEP_DIVE.md:277-313): every
        ``removed_paths`` entry must still be live in the *current*
        manifest, else ``CommitConflict`` — the caller (compaction
        runner) decides whether the bin became a no-op. Lock contention
        is retried with jittered backoff (retry.rs:73-101).

        Manifest IO is O(changed files): the commit writes a *delta*
        manifest (adds + remove tombstones) chained to the parent; a
        full base manifest is written only at the root, every
        ``DELTA_CHAIN_MAX`` commits, or on ``force_base`` (used by
        rewrite_manifests to collapse the chain).

        ``branch``: target a named branch ref instead of main (the WAP
        audit side). Snapshot ids come from the shared commit counter,
        so they stay globally unique across branches (and equal the
        old parent+1 numbering on a linear main-only history)."""

        removed = set(removed_paths)

        def attempt() -> int:
            METRICS.inc("commit.attempts")
            with self._lock():
                cur = self._read_current()
                if branch is None:
                    parent = cur["current_snapshot_id"]
                else:
                    refs_map = self.refs()
                    if branch not in refs_map:
                        raise ValidationError(f"no such branch {branch}")
                    parent = refs_map[branch]
                if expected_snapshot_id is not ... and parent != expected_snapshot_id:
                    METRICS.inc("commit.conflicts")
                    raise CommitConflict(
                        f"expected parent {expected_snapshot_id}, found {parent}"
                    )
                rows = self.manifest(parent) if parent is not None else []
                live = {r["path"] for r in rows}
                missing = removed - live
                if missing:
                    METRICS.inc("commit.conflicts")
                    raise CommitConflict(f"{len(missing)} input files no longer live")
                new_seq = cur["sequence_number"] + 1
                sid = new_seq
                kept = [r for r in rows if r["path"] not in removed]
                added_rows = []
                for fi in added:
                    row = fi.to_row()
                    if row["sequence_number"] <= 0:
                        row["sequence_number"] = new_seq
                    added_rows.append(row)
                depth = 0
                if parent is not None:
                    depth = self.snapshot(parent).get("delta_depth", 0)
                as_base = (
                    force_base or parent is None or depth + 1 > Table.DELTA_CHAIN_MAX
                )
                # partitions whose row set this commit changes — drives
                # the sharded collapse and is recorded on every snapshot
                removed_parts = {
                    r.get("partition") or "" for r in rows if r["path"] in removed
                }
                this_touched = {
                    r.get("partition") or "" for r in added_rows
                } | removed_parts
                shards = None
                shards_written = shards_reused = 0
                if as_base:
                    manifest_path = self._manifest_path(sid)
                    reuse, chain_touched = self._chain_context(parent)
                    if chain_touched is None:  # unknown history: full write
                        reuse, chain_touched = {}, set(r.get("partition") or "" for r in rows)
                    shards, shards_written, shards_reused = mf.write_manifest_sharded(
                        kept + added_rows,
                        manifest_path,
                        reuse=reuse,
                        touched=chain_touched | this_touched,
                    )
                    kind, new_depth = "base", 0
                else:
                    manifest_path = self._delta_path(sid)
                    mf.write_delta_manifest(added_rows, sorted(removed), manifest_path)
                    kind, new_depth = "delta", depth + 1
                    # warm the cache so the next read patches, not re-walks
                    self._cache_put(manifest_path, kept + added_rows)
                snap = {
                    "snapshot_id": sid,
                    "parent_id": parent,
                    "sequence_number": new_seq,
                    "timestamp_ms": _now_ms(),
                    "operation": operation,
                    "manifest": manifest_path,
                    "manifest_kind": kind,
                    "delta_depth": new_depth,
                    "touched_partitions": sorted(this_touched),
                    "summary": {
                        "added_files": len(added_rows),
                        "added_bytes": sum(r["size_bytes"] for r in added_rows),
                        "added_records": sum(r["record_count"] for r in added_rows),
                        "removed_files": len(removed),
                        "total_files": len(kept) + len(added_rows),
                        **(extra_summary or {}),
                    },
                }
                if shards is not None:
                    snap["shards"] = shards
                    snap["summary"]["base_shards_written"] = shards_written
                    snap["summary"]["base_shards_reused"] = shards_reused
                with open(self._snap_path(sid), "w") as f:
                    json.dump(snap, f, indent=1)
                if branch is None:
                    tmp = self._current_path() + f".tmp.{os.getpid()}"
                    with open(tmp, "w") as f:
                        json.dump(
                            {"current_snapshot_id": sid, "sequence_number": new_seq}, f
                        )
                    os.replace(tmp, self._current_path())  # atomic CAS point
                else:
                    # burn the counter FIRST (a crash between the two
                    # writes wastes one id, never reuses one), then move
                    # the branch ref — main's pointer is untouched
                    tmp = self._current_path() + f".tmp.{os.getpid()}"
                    with open(tmp, "w") as f:
                        json.dump(
                            {
                                "current_snapshot_id": cur["current_snapshot_id"],
                                "sequence_number": new_seq,
                            },
                            f,
                        )
                    os.replace(tmp, self._current_path())
                    refs_map[branch] = sid
                    self._write_refs(refs_map)
                METRICS.inc("commit.success")
                METRICS.inc("commit.files_added", len(added_rows))
                METRICS.inc("commit.files_removed", len(removed))
                METRICS.inc(
                    "commit.bytes_added", sum(r["size_bytes"] for r in added_rows)
                )
                return sid

        return with_retry(
            attempt,
            retries=retries,
            base_s=backoff_base_s,
            cap_s=backoff_cap_s,
            retry_on=(LockBusy,),
        )

    # ------------------------------------------------------------------
    # writes
    def _partition_expr(self):
        p = self.meta.get("partition")
        return (p["field"], p["expr"]) if p else (None, None)

    @staticmethod
    def _partition_of(info: mf.FileInfo) -> str:
        st = json.loads(info.stats_json).get(PART_COL)
        if st and st.get("min") is not None and st["min"] == st.get("max"):
            return st["min"]
        return ""

    def write_data_files(
        self,
        df: DataFrame,
        max_records_per_file: int | None = None,
        subdir: str | None = None,
        distribute: bool = False,
    ) -> list[mf.FileInfo]:
        """Write payload rows as new (uncommitted) data files and return
        their manifest entries. The rolling-file behavior of the
        reference's RollingWriter (writer.rs:100-338) maps to Spark's
        ``maxRecordsPerFile`` + the DataFrame's partition count.

        ``distribute`` (round 9, guide §6 small files): hash-cluster the
        rows by the table's partition value before a partitionBy write,
        so a P-partition table gets ~P files instead of (input
        partitions × P) fragments. Opt-in — compaction outputs arrive
        range-partitioned+sorted and callers that deliberately build
        many-small-file fixtures must keep their layout."""
        field, expr = self._partition_expr()
        if field and field not in df.columns:
            df = df.withColumn(field, F.expr(expr))
        if distribute and field:
            df = df.repartition(F.col(field))
        out_dir = os.path.join(self.data_dir, subdir or uuid.uuid4().hex[:12])
        if field:
            # partition purity: every data file holds exactly one
            # partition value (Iceberg invariant). ``_pdir`` drives the
            # directory layout while ``field`` stays a data column so
            # explicit-file-list scans keep it.
            writer = df.withColumn("_pdir", F.col(field)).write.partitionBy("_pdir")
        else:
            writer = df.write
        writer = self.bloom_write_options(writer.mode("error"))
        if max_records_per_file:
            writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
        writer.parquet(out_dir)
        paths = mf.list_parquet_files(out_dir)
        infos = mf.collect_file_infos(paths, content=mf.CONTENT_DATA, spark=df.sparkSession)
        for fi in infos:
            fi.partition = self._partition_of(fi)
        return self.attach_blooms(infos, df.sparkSession)

    def append_dataframe(
        self,
        df: DataFrame,
        max_records_per_file: int | None = None,
        branch: str | None = None,
        distribute: bool = False,
    ) -> int:
        infos = self.write_data_files(df, max_records_per_file, distribute=distribute)
        return self.commit("append", added=infos, branch=branch)

    # Rows per delete *file*: deletes are narrow (a path + long, or a
    # few key columns), so 8M rows ≈ tens of MB — small enough to
    # broadcast-join, large enough that a 10^9-row MERGE source yields
    # ~128 files instead of funnelling through one task (the old
    # coalesce(1) was a single-task scale ceiling).
    DELETE_ROWS_PER_FILE = 8_000_000

    def write_delete_files(
        self,
        df: DataFrame,
        cols: Sequence[str],
        content: str,
        equality_ids: Sequence[str] = (),
        rows_per_file: int | None = None,
    ) -> list[mf.FileInfo]:
        """Write a delete set as ceil(rows / rows_per_file) files and
        return uncommitted manifest entries. The write parallelism
        follows the delete-set size, never a fixed single task."""
        rows_per_file = rows_per_file or Table.DELETE_ROWS_PER_FILE
        prefix = "pos-" if content == mf.CONTENT_POS_DEL else "eq-"
        out_dir = os.path.join(self.deletes_dir, prefix + uuid.uuid4().hex[:12])
        # persist the narrow projection so the source plan executes ONCE:
        # the count (sizes the fan-out) and the write both read the
        # cache — without it a MERGE whose source is an expensive
        # pipeline would run the whole plan twice
        sel = df.select(*cols).persist()
        try:
            n_rows = sel.count()
            n_files = max(1, -(-n_rows // rows_per_file))
            sel.repartition(n_files).write.parquet(out_dir)
        finally:
            sel.unpersist()
        return mf.collect_file_infos(
            mf.list_parquet_files(out_dir),
            content=content,
            equality_ids=list(equality_ids),
            spark=df.sparkSession,
        )

    def add_position_deletes(self, df: DataFrame) -> int:
        """df: (_file string, _pos long). Writes a position-delete file
        set + commits a ``delete`` snapshot."""
        infos = self.write_delete_files(df, [FILE_COL, POS_COL], mf.CONTENT_POS_DEL)
        return self.commit("delete", added=infos)

    def add_equality_deletes(self, df: DataFrame, keys: Sequence[str]) -> int:
        """df: key columns. The file's sequence number (stamped at
        commit) orders it against data files: only older data dies."""
        infos = self.write_delete_files(
            df, list(keys), mf.CONTENT_EQ_DEL, equality_ids=keys
        )
        return self.commit("delete", added=infos)

    # ------------------------------------------------------------------
    # reads
    def scan(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        columns: Sequence[str] | None = None,
        apply_mor_deletes: bool = True,
        with_hidden: bool = False,
        inline_delete_threshold: int = 10 << 20,
        filter: str | None = None,
        paths: Sequence[str] | None = None,
        as_of_ms: int | None = None,
        partition_values: Collection[str] | None = None,
    ) -> DataFrame:
        """Snapshot-pinned MoR read: data files minus position/equality
        deletes, projected to user columns (SURVEY.md §3.4 grammar).
        Hidden columns are attached only when the matching delete kind
        exists, like the reference (file_scan.rs:195-212). Delete sets
        under ``inline_delete_threshold`` bytes get an explicit
        broadcast hint (InlineDeleteData, README.md:60-69).

        ``paths``: restrict the read to these data files (they must be
        live in the snapshot) — the file-subset scan changelog and
        maintenance use; MoR resolution still applies, scoped to the
        subset.

        Delete files are SCOPED to the surviving data files before any
        are read (``plans/delete_scope``, mirroring the reference's
        per-FileScanTask attached deletes, file_selection.rs:82-131):
        an eq-delete whose sequence or key bounds prove it disjoint
        from every scanned file — or a pos-delete whose ``_file``
        bounds bracket none of them — is never opened. Counts exposed
        via ``last_scan_{pos,eq}_delete_files``.

        ``filter``: a SQL predicate. Two layers, like Iceberg scan
        planning (reference file_selection.rs:29 pins a snapshot scan
        whose tasks carry bounds; decoded at mod.rs:400-435):
        (1) manifest-stats **file pruning** drops whole data files whose
        column bounds prove no row can match — a ts-range query over a
        time-partitioned table opens ~1% of files, not 100%; (2) the
        full predicate is applied to surviving rows (so pruning is never
        a correctness dependency) and still pushes into Parquet row
        groups. The count of pruned files is exposed via
        ``last_scan_pruned_files`` for plan tests."""
        if as_of_ms is not None:
            if snapshot_id is not None:
                raise ValidationError("pass snapshot_id OR as_of_ms, not both")
            snapshot_id = self.snapshot_as_of(as_of_ms)  # FOR TIMESTAMP AS OF
        rows = self.manifest(snapshot_id)
        data_rows = [r for r in rows if r["content"] == mf.CONTENT_DATA]
        pos_rows = [r for r in rows if r["content"] == mf.CONTENT_POS_DEL]
        eq_rows = [r for r in rows if r["content"] == mf.CONTENT_EQ_DEL]
        user_cols = list(columns or self.user_columns())

        if paths is not None:
            want = set(paths)
            data_rows = [r for r in data_rows if r["path"] in want]

        self.last_scan_pruned_files = 0
        if partition_values is not None and data_rows:
            # caller-computed partition restriction (e.g. the LSH index
            # probe projecting the increment's signatures through the
            # bucket spec): keep only files whose materialized partition
            # value is in the set. Files with no recorded value, or
            # written under a pre-evolution spec (seq ≤ floor — their
            # values came from the OLD expr), might hold matching rows
            # and are kept, so the restriction can never change results.
            pv = set(partition_values)
            spec_floor = self.meta.get("partition_spec_floor")
            before = len(data_rows)
            data_rows = [
                r
                for r in data_rows
                if not r.get("partition")
                or (
                    spec_floor is not None
                    and r.get("sequence_number", 0) <= spec_floor
                )
                or r["partition"] in pv
            ]
            self.last_scan_pruned_files += before - len(data_rows)
        if filter and data_rows:
            from iceberg_compaction_spark.plans import pruning

            if len(data_rows) > Table.PRUNE_DF_THRESHOLD and paths is None:
                # large manifest: evaluate the same pruner executor-side
                # over files_df and pull back surviving paths only — the
                # driver never JSON-decodes per-file stats
                from iceberg_compaction_spark.plans.pruning_df import prune_files_df

                fdf = self.files_df(spark, snapshot_id).filter(
                    F.col("content") == mf.CONTENT_DATA
                )
                survivors = prune_files_df(
                    fdf, filter, col_types=self.column_type_categories()
                )
                keep = {r["path"] for r in survivors.select("path").collect()}
                pruned = len(data_rows) - len(keep)
                data_rows = [r for r in data_rows if r["path"] in keep]
                METRICS.inc("scan.prune_df_path")
            else:
                data_rows, pruned = pruning.prune_files(
                    data_rows, filter, col_types=self.column_type_categories()
                )
            # accumulate, don't assign: a scan combining partition_values
            # with a filter (e.g. a filtered index probe) counted its
            # partition-skipped files just above
            self.last_scan_pruned_files += pruned
            # transform predicate projection (Iceberg Projections): an
            # = / IN predicate on the spec's declared source column
            # maps to exact partition values — prunes buckets/dates the
            # stats pruner can't see through the transform. Conservative
            # (None on any doubt) and layered under the residual filter.
            from iceberg_compaction_spark.plans import transforms

            pvals = transforms.project_partition_values(
                spark, self.meta.get("partition"), self.physical_schema(), filter
            )
            if pvals is not None:
                before = len(data_rows)
                # Files written at or below ``partition_spec_floor``
                # predate the current spec (``set_partition_expr``
                # evolution): their recorded partition values were
                # derived by the OLD expr, so comparing them against
                # values projected with the CURRENT expr would silently
                # drop matching rows (e.g. pmod(hash,16) vs
                # pmod(hash,32)). Exempt them — projection only ever
                # prunes files provably written under the live spec,
                # preserving the "projection can never change the
                # result" guarantee; ``migrate_partition_spec`` rewrites
                # the exempt tail so full pruning returns.
                spec_floor = self.meta.get("partition_spec_floor")
                data_rows = [
                    r for r in data_rows
                    # a file with no recorded partition value (mixed or
                    # legacy write) might hold matching rows: keep it
                    if not r.get("partition")
                    or (
                        spec_floor is not None
                        and r.get("sequence_number", 0) <= spec_floor
                    )
                    or r["partition"] in pvals
                ]
                self.last_scan_pruned_files += before - len(data_rows)
            METRICS.inc("scan.files_pruned", self.last_scan_pruned_files)
        METRICS.inc("scan.files_scanned", len(data_rows))

        if apply_mor_deletes and (pos_rows or eq_rows):
            from iceberg_compaction_spark.plans import delete_scope

            pos_rows, eq_rows = delete_scope.scope_deletes(data_rows, pos_rows, eq_rows)
        self.last_scan_pos_delete_files = len(pos_rows)
        self.last_scan_eq_delete_files = len(eq_rows)
        METRICS.inc("scan.delete_files_attached", len(pos_rows) + len(eq_rows))

        if not data_rows:
            # physical schema so a filter referencing the partition
            # column still resolves; user projection applied after
            empty = spark.createDataFrame([], schema=self.physical_schema())
            if filter:
                empty = empty.filter(F.expr(filter))
            return empty.select(*user_cols)

        need_pos = apply_mor_deletes and bool(pos_rows)
        need_eq = apply_mor_deletes and bool(eq_rows)
        df = self.read_data_rows(
            spark,
            data_rows,
            with_file=with_hidden or need_pos,
            with_pos=with_hidden or need_pos,
            seq_by_path={r["path"]: r["sequence_number"] for r in data_rows}
            if (need_eq or with_hidden)
            else None,
        )
        if filter:
            # residual predicate: full filter on surviving files (file
            # pruning is bounds-based and conservative); applied before
            # the MoR joins so delete-join input shrinks too, and pushed
            # into the Parquet scan by Catalyst
            df = df.filter(F.expr(filter))

        pos_df = None
        if need_pos:
            pos_df = scan_mod.read_position_deletes(spark, [r["path"] for r in pos_rows])
        if need_eq:
            # group eq-delete files by key set; chain one anti-join per
            # key set (reference chains one per delete table,
            # sql_builder.rs:120-152)
            by_keys: dict[tuple, list] = {}
            for r in eq_rows:
                by_keys.setdefault(tuple(r["equality_ids"]), []).append(r)
            out = apply_deletes(
                df,
                pos_df,
                None,
                broadcast_pos=bool(pos_rows)
                and sum(r["size_bytes"] for r in pos_rows) < inline_delete_threshold,
            )
            for keys, grp in sorted(by_keys.items()):
                eq_df = scan_mod.read_equality_deletes(
                    spark, [(r["path"], r["sequence_number"]) for r in grp], list(keys)
                )
                small = sum(r["size_bytes"] for r in grp) < inline_delete_threshold
                out = apply_deletes(out, None, eq_df, eq_keys=keys, broadcast_eq=small)
            df = out
        elif need_pos:
            df = apply_deletes(
                df,
                pos_df,
                None,
                broadcast_pos=sum(r["size_bytes"] for r in pos_rows) < inline_delete_threshold,
            )

        if with_hidden:
            extra = [c for c in (FILE_COL, POS_COL, SEQ_COL) if c in df.columns]
            return df.select(*user_cols, *extra)
        return df.select(*user_cols)  # final hidden-col-stripping projection (P1)
