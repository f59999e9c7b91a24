"""Spark 4 Python DataSource connector for the table format.

``spark.read.format("icemaint").load(location)`` gives any Spark user a
full merge-on-read snapshot read — WITHOUT importing this engine's
Table API — and ``spark.readStream.format("icemaint")`` streams newly
appended/merged data files as micro-batches (Iceberg's append-only
streaming-read semantics). Built on PySpark 4's Python Data Source API
(public: pyspark.sql.datasource), the idiomatic way to expose a custom
table format to plain Spark SQL users.

Planning runs on the DRIVER (manifest-sized): per-file partitions
carry their SCOPED delete attachments (plans/delete_scope — the same
rules the native scan uses), and `pushFilters` runs the same manifest
bounds pruner as `Table.scan(filter=…)`, returning every filter
unhandled so Spark still applies the full predicate to surviving rows
(pruning is never a correctness dependency). Per-partition reads run
executor-side on pyarrow: position deletes mask row indices (parquet
physical order == our ``_pos`` convention), equality deletes apply the
``data_seq < delete_seq`` rule with per-row ``_seq`` honored for
consolidated files.

v1 limits (documented, tested): schema evolution is handled by
name-based padding (added columns read as NULL on old files; initial
DEFAULTs and rename epochs need the native ``Table.scan``), and bloom
sidecar pruning is not probed (bounds pruning only).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclass
class _FileSlice(InputPartition):
    """One data file + its scoped delete attachments (all primitives:
    pickled to executors)."""

    path: str
    seq: int
    pos_delete_paths: tuple
    # ((key column names…), ((delete path, file seq), …)) per key set
    eq_groups: tuple
    arrow_schema: object  # pa.Schema (picklable); computed DRIVER-side


def _arrow_schema_of(schema: StructType):
    """Spark schema → arrow schema, DRIVER-side (executors have no
    SparkContext to parse DDL with)."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_type

    return pa.schema(
        [pa.field(f.name, to_arrow_type(f.dataType)) for f in schema.fields]
    )


def _pad_to_schema(tbl, arrow_schema):
    """Arrow table → exactly the reader schema: missing columns become
    typed nulls (add-column evolution), extras drop, order fixed."""
    import pyarrow as pa

    cols = []
    for field in arrow_schema:
        if field.name in tbl.column_names:
            col = tbl.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
        else:
            col = pa.nulls(tbl.num_rows, type=field.type)
        cols.append(col)
    return pa.table(cols, schema=arrow_schema)


def _read_file_with_deletes(part: _FileSlice) -> Iterator:
    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(part.path)
    n = tbl.num_rows
    keep = np.ones(n, dtype=bool)

    if part.pos_delete_paths:
        dead: set[int] = set()
        for p in part.pos_delete_paths:
            d = pq.read_table(p, columns=["_file", "_pos"])
            df = d.to_pandas()
            dead.update(int(x) for x in df.loc[df["_file"] == part.path, "_pos"])
        if dead:
            idx = np.fromiter((i for i in dead if 0 <= i < n), dtype=np.int64)
            keep[idx] = False

    for keys, files in part.eq_groups:
        import pandas as pd

        _NULL = "\x00__icemaint_null__"

        def _null_safe(frame: "pd.DataFrame") -> "pd.DataFrame":
            # match the native anti-join's eqNullSafe semantics AND keep
            # dtypes mergeable: a None in an int64 delete frame would
            # otherwise become float64 and pandas raises on int64-vs-
            # float64 merge keys. Everything joins as object + sentinel.
            for k in keys:
                col = frame[k].astype(object)
                frame[k] = col.where(col.notna(), _NULL)
            return frame

        frames = []
        for dpath, dseq in files:
            d = pq.read_table(dpath).to_pandas()
            if "_seq" not in d.columns:
                d["_seq"] = int(dseq)  # plain file: manifest file-level seq
            frames.append(_null_safe(d[list(keys) + ["_seq"]].copy()))
        if not frames:
            continue
        dels = pd.concat(frames, ignore_index=True)
        dels = dels.groupby(list(keys), dropna=False)["_seq"].max().reset_index()
        data_keys = _null_safe(tbl.select(list(keys)).to_pandas())
        merged = data_keys.merge(dels, on=list(keys), how="left")
        kill = merged["_seq"].notna() & (merged["_seq"] > part.seq)
        keep &= ~kill.to_numpy()

    if not keep.all():
        tbl = tbl.filter(keep)
    out = _pad_to_schema(tbl, part.arrow_schema)
    yield from out.to_batches(max_chunksize=65536)


def _load_table(options):
    from iceberg_compaction_spark.sources.table import Table

    loc = options.get("path") or options.get("location")
    if not loc:
        raise ValueError("icemaint: pass the table location via load(path)")
    return Table.load(loc)


class _BatchReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self._options = options
        self._schema = schema
        self._predicates: list[str] = []

    def pushFilters(self, filters):
        """Translate simple comparisons into the manifest pruner's
        predicate language (file pruning ONLY — every filter is
        returned unhandled, so Spark still applies it to rows)."""

        def lit(v):
            if isinstance(v, str):
                return "'" + v.replace("'", "''") + "'"
            if isinstance(v, bool):
                return "TRUE" if v else "FALSE"
            return str(v)

        for f in filters:
            try:
                col = ".".join(f.attribute)
                if "." not in col and "`" not in col:
                    if isinstance(f, EqualTo):
                        self._predicates.append(f"{col} = {lit(f.value)}")
                    elif isinstance(f, GreaterThan):
                        self._predicates.append(f"{col} > {lit(f.value)}")
                    elif isinstance(f, GreaterThanOrEqual):
                        self._predicates.append(f"{col} >= {lit(f.value)}")
                    elif isinstance(f, LessThan):
                        self._predicates.append(f"{col} < {lit(f.value)}")
                    elif isinstance(f, LessThanOrEqual):
                        self._predicates.append(f"{col} <= {lit(f.value)}")
                    elif isinstance(f, In):
                        vals = " OR ".join(f"{col} = {lit(v)}" for v in f.value)
                        if vals:
                            self._predicates.append(f"({vals})")
                    elif isinstance(f, IsNotNull):
                        pass  # no bounds gain; handled by Spark
            except Exception:
                pass  # unmodelled filter shape: prune nothing for it
            yield f  # ALL filters re-applied by Spark

    def partitions(self):
        from iceberg_compaction_spark.plans import delete_scope
        from iceberg_compaction_spark.sources import manifest as mf

        table = _load_table(self._options)
        snap = self._options.get("snapshot_id")
        rows = table.manifest(int(snap) if snap is not None else None)
        data_rows = [r for r in rows if r["content"] == mf.CONTENT_DATA]
        pos_rows = [r for r in rows if r["content"] == mf.CONTENT_POS_DEL]
        eq_rows = [r for r in rows if r["content"] == mf.CONTENT_EQ_DEL]

        if self._predicates:
            from iceberg_compaction_spark.plans import pruning

            pred = " AND ".join(self._predicates)
            # type categories from the READER schema (already a parsed
            # StructType) — Table.column_type_categories would re-parse
            # DDL, which needs a SparkContext this planning worker
            # doesn't have
            data_rows, _ = pruning.prune_files(
                data_rows, pred, col_types=pruning.col_type_categories(self._schema)
            )

        aschema = _arrow_schema_of(self._schema)
        # global prescope first: one pass shrinks the delete lists to
        # the files-in-scope superset, so the per-file scoping loop is
        # O(files × applicable-deletes), not O(files × all-deletes)
        if pos_rows or eq_rows:
            pos_rows, eq_rows = delete_scope.scope_deletes(
                data_rows, pos_rows, eq_rows
            )
        parts = []
        for r in data_rows:
            if r["record_count"] == 0:
                continue
            pos, eq = delete_scope.scope_deletes([r], pos_rows, eq_rows)
            eq_groups: dict[tuple, list] = {}
            for e in eq:
                eq_groups.setdefault(tuple(e["equality_ids"] or ()), []).append(
                    (e["path"], e["sequence_number"])
                )
            parts.append(
                _FileSlice(
                    path=r["path"],
                    seq=r["sequence_number"],
                    pos_delete_paths=tuple(p["path"] for p in pos),
                    eq_groups=tuple(
                        (k, tuple(v)) for k, v in sorted(eq_groups.items()) if k
                    ),
                    arrow_schema=aschema,
                )
            )
        return parts

    def read(self, partition: _FileSlice):
        yield from _read_file_with_deletes(partition)


class _StreamReader(DataSourceStreamReader):
    """Append-only incremental read: each micro-batch carries the DATA
    files added by append/merge commits since the last offset; replace
    (compaction, migration), delete, and maintenance commits are
    skipped — Iceberg's streaming-read semantics (rewritten rows do
    not re-stream)."""

    def __init__(self, options, schema: StructType):
        self._options = options
        self._schema = schema
        # Spark source convention (Kafka's failOnDataLoss): by default a
        # checkpointed start snapshot that has been expired fails the
        # stream loudly; failOnDataLoss=false resumes from the earliest
        # retained ancestor instead (the expired gap is skipped — the
        # documented at-most-once trade of the option).
        raw = options.get("failondataloss", options.get("failOnDataLoss", "true"))
        self._fail_on_loss = str(raw).lower() != "false"

    def initialOffset(self) -> dict:
        start = self._options.get("starting_snapshot_id")
        if start is not None:
            if str(start).lower() == "earliest":
                return {"snapshot_id": None}
            return {"snapshot_id": int(start)}
        t = _load_table(self._options)
        return {"snapshot_id": t.current_snapshot_id}

    def latestOffset(self) -> dict:
        t = _load_table(self._options)
        return {"snapshot_id": t.current_snapshot_id}

    def _added_data_rows(self, table, start_sid, end_sid):
        """Data-file rows added by append/merge commits on the chain
        (start, end] — manifest set differences per commit, exact even
        across base-manifest collapses."""
        from iceberg_compaction_spark.sources import manifest as mf

        chain, s, expired = [], end_sid, False
        while s is not None and s != start_sid:
            try:
                snap = table.snapshot(s)
            except FileNotFoundError:
                expired = True  # ancestor expired mid-chain
                break
            chain.append(snap)
            s = snap.get("parent_id")
        # walked to the root without meeting start: the recorded offset
        # is on a DIVERGED history (rollback past it, branch swap) —
        # a different failure from mid-chain expiry and handled apart
        diverged = not expired and s is None and start_sid is not None
        if expired or diverged:
            if self._fail_on_loss:
                raise ValueError(
                    f"start snapshot {start_sid} is not a retained ancestor of "
                    f"{end_sid} (expired or divergent); restart the stream, or "
                    "set failOnDataLoss=false to resume from the earliest "
                    "retained snapshot (skipping the expired range)"
                )
            if expired and chain:
                # earliest-retained fallback (Kafka's auto.offset.reset
                # earliest shape): keep the retained suffix of the
                # chain. The walk broke on a missing parent, and the
                # boundary snapshot's own diff needs that parent's
                # manifest — gone — so its adds sit inside the skipped
                # range too.
                chain.pop()
            if diverged:
                # no retained suffix exists to anchor on: the fallback
                # replays the ENTIRE retained history, so previously
                # emitted rows ARE re-delivered (at-least-once, broader
                # than the expiry skip). Surface it instead of passing
                # it off as a clean resume.
                import warnings

                from iceberg_compaction_spark.metrics import GLOBAL

                GLOBAL.inc("datasource.divergent_history_replay")
                warnings.warn(
                    f"stream offset {start_sid} is not an ancestor of "
                    f"{end_sid} (history diverged): failOnDataLoss=false "
                    "replays the whole retained history — expect "
                    "duplicate rows downstream",
                    stacklevel=2,
                )
        out = []
        for snap in reversed(chain):
            if snap.get("operation") not in ("append", "merge"):
                continue
            sid, parent = snap["snapshot_id"], snap.get("parent_id")
            cur = {
                r["path"]: r
                for r in table.manifest(sid)
                if r["content"] == mf.CONTENT_DATA
            }
            prev = (
                {
                    r["path"]
                    for r in table.manifest(parent)
                    if r["content"] == mf.CONTENT_DATA
                }
                if parent is not None
                else set()
            )
            out += [r for p, r in sorted(cur.items()) if p not in prev]
        return out

    def partitions(self, start: dict, end: dict):
        table = _load_table(self._options)
        start_sid, end_sid = start.get("snapshot_id"), end.get("snapshot_id")
        aschema = _arrow_schema_of(self._schema)
        parts = [
            _FileSlice(
                path=r["path"],
                seq=r["sequence_number"],
                pos_delete_paths=(),
                eq_groups=(),
                arrow_schema=aschema,
            )
            for r in self._added_data_rows(table, start_sid, end_sid)
            if r["record_count"] > 0
        ]
        if not parts:
            # Spark requires ≥1 partition per batch; an empty marker
            # partition reads zero rows
            parts = [
                _FileSlice(
                    path="", seq=0, pos_delete_paths=(), eq_groups=(),
                    arrow_schema=aschema,
                )
            ]
        return parts

    def read(self, partition: _FileSlice):
        if not partition.path:
            return iter(())
        return _read_file_with_deletes(partition)

    def commit(self, end: dict) -> None:
        pass  # snapshots are retained by table retention policy

    def stop(self) -> None:
        pass


def _ddl_columns(ddl: str) -> list[tuple[str, str]]:
    """(name, normalized type) pairs from a DDL string, depth-aware on
    nested ``<...>`` types — parsed textually because this code runs in
    Python workers with no SparkContext to call StructType.fromDDL."""
    pieces, depth, cur = [], 0, ""
    for ch in ddl:
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
        name, typ = p.strip().split(None, 1)
        out.append((name.strip("`"), typ.strip().lower().replace(" ", "")))
    return out


@dataclass
class _WriteMessage(WriterCommitMessage):
    paths: tuple


class _BatchWriter(DataSourceArrowWriter):
    """``df.write.format("icemaint").mode("append").save(location)`` —
    executor tasks stage parquet files under the table's data dir
    (Arrow RecordBatches straight into ``pq.ParquetWriter``; no per-row
    Python, no Spark session needed), and ``commit`` turns the staged
    files into ONE atomic append snapshot via the engine's commit
    protocol (footer stats → manifest rows driver-side; a crash before
    commit leaves unreferenced staged files for clean_orphan_files).

    Partitioned tables: the partition value is a materialized data
    column (``_part``) derived by a Spark SQL expr, which these
    SparkContext-free arrow tasks cannot evaluate — so the write must
    carry the column, derived Spark-side by the caller
    (``df.withColumn(field, F.expr(expr))``; the error message spells
    out the exact call). Each task then runs an Iceberg-style fanout:
    one file per partition value it sees, preserving the engine's
    partition-purity invariant (``Table.write_data_files``)."""

    def __init__(self, options, schema: StructType, overwrite: bool):
        import uuid

        if overwrite:
            raise NotImplementedError(
                "icemaint writer is append-only; use the engine's DML "
                "(delete_where / merge_into / compaction) for rewrites"
            )
        self._options = options
        table = _load_table(options)
        part = table.meta.get("partition")
        self._part_field = part["field"] if part else None
        want_types = dict(_ddl_columns(table.meta["schema_ddl"]))
        have_types = {
            f.name: f.dataType.simpleString().lower().replace(" ", "")
            for f in schema.fields
        }
        if self._part_field:
            if self._part_field not in have_types:
                raise ValueError(
                    f"partitioned table: derive the partition column "
                    f"Spark-side before the write — df.withColumn("
                    f"{self._part_field!r}, F.expr({part['expr']!r})) — or "
                    "use Table.append_dataframe"
                )
            want_types[self._part_field] = "string"
        want = list(want_types)
        if sorted(want) != sorted(have_types):
            raise ValueError(
                f"schema mismatch: table columns {sorted(want)}, dataframe "
                f"{sorted(have_types)}"
            )
        # types too — name-only validation would let an int64 frame
        # append into a string column, committing parquet files every
        # later scan chokes on
        bad = {
            c: (have_types[c], want_types[c])
            for c in want
            if have_types[c] != want_types[c]
        }
        if bad:
            raise ValueError(
                "type mismatch (dataframe vs table): "
                + ", ".join(f"{c}: {a} vs {b}" for c, (a, b) in sorted(bad.items()))
            )
        self._ordered = want
        self._arrow_schema = _arrow_schema_of(
            StructType([schema[c] for c in want])
        )
        self._stage = os.path.join(table.data_dir, f"dsw-{uuid.uuid4().hex[:12]}")

    def write(self, iterator):
        import os as _os
        import uuid

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        _os.makedirs(self._stage, exist_ok=True)
        writers: dict = {}  # partition value (None for unpartitioned) → writer
        paths: list[str] = []
        # per-key row-group buffering: one write_table per ~64k rows,
        # not one per (batch × partition)
        pending: dict = {}

        def flush(key):
            tables, _n = pending.pop(key, (None, 0))
            if not tables:
                return
            if key not in writers:
                p = _os.path.join(
                    self._stage, f"part-{uuid.uuid4().hex[:12]}.parquet"
                )
                writers[key] = pq.ParquetWriter(p, self._arrow_schema)
                paths.append(p)
            writers[key].write_table(pa.concat_tables(tables))

        def buffer(key, tbl):
            tables, n = pending.get(key, ([], 0))
            tables.append(tbl)
            n += tbl.num_rows
            pending[key] = (tables, n)
            if n >= 65536:
                flush(key)

        for batch in iterator:
            if batch.num_rows == 0:
                continue
            # reorder + cast to the table's arrow schema (the incoming
            # batch follows the dataframe's column order/session tz)
            tbl = _pad_to_schema(pa.Table.from_batches([batch]), self._arrow_schema)
            if self._part_field is None:
                buffer(None, tbl)
                continue
            keys = tbl.column(self._part_field)
            for v in pc.unique(keys).to_pylist():
                mask = pc.is_null(keys) if v is None else pc.equal(keys, v)
                buffer(v, tbl.filter(mask))
        for key in list(pending):
            flush(key)
        for w in writers.values():
            w.close()
        return _WriteMessage(paths=tuple(paths))

    def commit(self, messages) -> None:
        from iceberg_compaction_spark.sources import manifest as mf
        from iceberg_compaction_spark.sources.table import Table

        paths = [p for m in messages if m is not None for p in m.paths]
        table = _load_table(self._options)
        infos = [
            fi
            for fi in mf.collect_file_infos(paths, content=mf.CONTENT_DATA)
            if fi.record_count > 0
        ]
        for fi in infos:
            fi.partition = Table._partition_of(fi)
        if infos:
            table.commit("append", added=infos)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self._stage, ignore_errors=True)


class IcemaintDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "icemaint"

    def schema(self):
        return _load_table(self.options).meta["schema_ddl"]

    def reader(self, schema: StructType) -> DataSourceReader:
        return _BatchReader(self.options, schema)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _StreamReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _BatchWriter(self.options, schema, overwrite)


def register(spark) -> None:
    """Make ``format("icemaint")`` available on this session (and turn
    on Python-datasource filter pushdown, which gates the
    ``pushFilters`` file-pruning hook — a plain SQL conf, default
    false in Spark 4.1)."""
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # locked-down conf: reads still work, pruning hook off
    spark.dataSource.register(IcemaintDataSource)
