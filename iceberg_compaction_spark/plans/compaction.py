"""The compaction service: plan → rewrite → checkpoint → atomic commit.

End-to-end restatement of the reference's lifecycle (SURVEY.md §3):

  plan files (FileSelector, file_selection.rs:22-54)
  → FFD bins (ListPacker, packer.rs:36-76)
  → parallelism (file_selection.rs:156-177)
  → per-bin rewrite (WorkerExecutor → DataFusion anti-join SQL →
    RollingWriter, mod.rs:89-237)
  → atomic commit + conflict validation (CommitCoordinator,
    commit.rs:78-179)

Spark-first shape per bin (SURVEY.md §3.1 restatement)::

    read.parquet(bin files) [+ hidden cols]
      → anti-join position deletes → anti-join equality deletes
      → repartitionByRange(output_parallelism, sort keys)
      → sortWithinPartitions(sort keys)
      → write.option(maxRecordsPerFile, target rows).parquet(bin dir)

The gRPC task distribution of the reference (§3.2 boundaries #1–#2) is
replaced by Spark's own scheduler: bins run as jobs against one
SparkSession (optionally in parallel via driver threads — Spark
multiplexes concurrent jobs fine). Boundary #3 (commit) remains a
single-writer driver-side atomic snapshot.

Resumability (C7 + north rule): every finished bin writes one lineage
row (input files → output files, rows, bytes, timings) as its own
Parquet file under ``meta/checkpoints/run-<id>/`` — crash-safe at bin
granularity, and bins never span table partitions, so resume is
per-partition. Re-running with the same ``run_id`` skips finished bins
and commits the union.
"""

from __future__ import annotations

import os
import time
import uuid
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from iceberg_compaction_spark.config import (
    CommitMode,
    CompactionConfig,
    GroupingStrategy,
    SelectionStrategy,
)
from iceberg_compaction_spark.errors import ValidationError
from iceberg_compaction_spark.metrics import GLOBAL
from iceberg_compaction_spark.functions.clustering import CLUSTER_COL, add_cluster_key
from iceberg_compaction_spark.operators.mor import FILE_COL
from iceberg_compaction_spark.plans.packer import plan_bins_df
from iceberg_compaction_spark.plans.parallelism import calculate_parallelism
from iceberg_compaction_spark.plans.selection import select_files
from iceberg_compaction_spark.sources import manifest as mf
from iceberg_compaction_spark.sources import scan as scan_mod
from iceberg_compaction_spark.sources.table import Table
from iceberg_compaction_spark.operators.mor import apply_deletes

_CKPT_SCHEMA = pa.schema(
    [
        ("run_id", pa.string()),
        ("snapshot_id", pa.int64()),
        ("bin", pa.string()),
        ("partition", pa.string()),
        ("status", pa.string()),
        ("input_paths", pa.list_(pa.string())),
        ("output_paths", pa.list_(pa.string())),
        ("input_bytes", pa.int64()),
        ("output_bytes", pa.int64()),
        ("input_files", pa.int64()),
        ("output_files", pa.int64()),
        ("rows_processed", pa.int64()),
        ("execution_time_ms", pa.int64()),
        ("started_ms", pa.int64()),
        ("finished_ms", pa.int64()),
    ]
)


@dataclass
class BinPlan:
    bin: str
    partition: str
    paths: list
    total_bytes: int
    record_count: int
    executor_parallelism: int = 1
    output_parallelism: int = 1


@dataclass
class CompactionResult:
    run_id: str
    snapshot_before: int | None
    snapshot_after: int | None
    bins_total: int = 0
    bins_executed: int = 0
    bins_skipped: int = 0
    input_files: int = 0
    output_files: int = 0
    input_bytes: int = 0
    output_bytes: int = 0
    rows_processed: int = 0
    removed_delete_files: int = 0
    wall_s: float = 0.0
    lineage: list = field(default_factory=list)

    @property
    def space_savings(self) -> float:
        """F8 (reference metrics.rs:205-212)."""
        from iceberg_compaction_spark.functions.util import space_savings

        return space_savings(self.input_bytes, self.output_bytes)

    def summary(self) -> dict:
        out = {
            k: getattr(self, k)
            for k in (
                "run_id",
                "snapshot_before",
                "snapshot_after",
                "bins_total",
                "bins_executed",
                "bins_skipped",
                "input_files",
                "output_files",
                "input_bytes",
                "output_bytes",
                "rows_processed",
                "removed_delete_files",
                "wall_s",
            )
        }
        out["space_savings"] = self.space_savings
        return out


class CompactionRunner:
    def __init__(self, spark: SparkSession, table: Table, config: CompactionConfig | None = None):
        self.spark = spark
        self.table = table
        if config is None:
            # table properties supply per-table defaults (Iceberg
            # write.target-file-size idiom); an explicit config wins
            import dataclasses

            config = CompactionConfig()
            overrides = {}
            tfs = table.get_property("compaction.target-file-size-bytes")
            gts = table.get_property("compaction.group-target-size-bytes")
            if tfs is not None:
                overrides["target_file_size_bytes"] = int(tfs)
            if gts is not None:
                overrides["group_target_size_bytes"] = int(gts)
            if overrides:
                config = dataclasses.replace(config, **overrides)
        self.config = config
        self._info_cache: dict[str, list] = {}
        # F7 (reference writer.rs:246-254): observed *output* bytes/row
        # across bins refines rows-per-file for later bins — the input
        # estimate is wrong exactly when compaction changes compression
        # (small snappy files → big sorted files). Lock: bins may run on
        # driver threads.
        import threading

        from iceberg_compaction_spark.functions.util import EwmaRowSize

        self._row_size = EwmaRowSize()
        self._row_size_lock = threading.Lock()

    # ------------------------------------------------------------------
    def plan(self, snapshot_id: int | None = None) -> list[BinPlan]:
        """Planning as a DataFrame job over the manifest metadata table
        (S1 + P2/P3 + C1 + C3). Collects only the *plan* (one row per
        selected file), never data."""
        cfg = self.config
        # round 9 (guide §5/§7.3): planning over a MODEST manifest is
        # driver-side python — the manifest rows are already resolved
        # on the driver, and a Spark job (shuffle + applyInPandas) for
        # a few hundred rows costs seconds of pure overhead per
        # compaction. The DataFrame path remains the production shape
        # for manifests past the threshold (10^5+ files plan
        # partition-parallel with no driver bottleneck). Both paths run
        # the identical selection predicate and the same ffd_pack
        # greedy with the same (size desc, path asc) order, so the bin
        # schedule is byte-identical.
        man_data = [
            r
            for r in self.table.manifest(snapshot_id)
            if r["content"] == mf.CONTENT_DATA
        ]
        fast = (
            not cfg.row_filter
            and cfg.selection
            in (SelectionStrategy.FULL, SelectionStrategy.SMALL_FILES)
            and len(man_data) <= 65_536
        )
        if fast:
            sel = man_data
            if cfg.partition_filter:
                allowed = set(cfg.partition_filter)
                sel = [r for r in sel if r["partition"] in allowed]
            if cfg.selection == SelectionStrategy.SMALL_FILES:
                sel = [
                    r
                    for r in sel
                    if r["size_bytes"] <= cfg.small_file_threshold_bytes
                ]
            rows = []
            if cfg.grouping == GroupingStrategy.SINGLE:
                for r in sel:
                    rows.append(
                        {
                            "path": r["path"],
                            "partition": r["partition"],
                            "size_bytes": r["size_bytes"],
                            "record_count": r["record_count"],
                            "bin": f"{r['partition']}#0",
                        }
                    )
            else:
                from iceberg_compaction_spark.plans.packer import ffd_pack

                by_part: dict[str, list[dict]] = {}
                for r in sel:
                    by_part.setdefault(r["partition"], []).append(r)
                for part, members in by_part.items():
                    members.sort(key=lambda r: (-r["size_bytes"], r["path"]))
                    packed = ffd_pack(
                        [r["size_bytes"] for r in members],
                        cfg.group_target_size_bytes,
                    )
                    for k, idxs in enumerate(packed):
                        for i in idxs:
                            r = members[i]
                            rows.append(
                                {
                                    "path": r["path"],
                                    "partition": part,
                                    "size_bytes": r["size_bytes"],
                                    "record_count": r["record_count"],
                                    "bin": f"{part}#{k}",
                                }
                            )
        else:
            files_df = self.table.files_df(self.spark, snapshot_id)
            selected = select_files(
                self.spark,
                files_df,
                cfg,
                col_types=self.table.column_type_categories() if cfg.row_filter else None,
            )
            if cfg.grouping == GroupingStrategy.SINGLE:
                assigned = selected.select(
                    "path",
                    "partition",
                    "size_bytes",
                    "record_count",
                    "sequence_number",
                    F.concat(F.col("partition"), F.lit("#0")).alias("bin"),
                    F.lit(0).alias("bin_index"),
                )
            else:
                assigned = plan_bins_df(selected, cfg.group_target_size_bytes)
            rows = assigned.collect()
        bins: dict[str, BinPlan] = {}
        for r in rows:
            b = bins.setdefault(
                r["bin"], BinPlan(bin=r["bin"], partition=r["partition"], paths=[], total_bytes=0, record_count=0)
            )
            b.paths.append(r["path"])
            b.total_bytes += r["size_bytes"]
            b.record_count += r["record_count"]
        for b in bins.values():
            b.paths.sort()
            b.executor_parallelism, b.output_parallelism = calculate_parallelism(
                b.total_bytes, len(b.paths), cfg
            )
        # skip single-file bins with no deletes to resolve: rewriting
        # one file into one file is pure churn (reference leaves these
        # out via strategy thresholds). Round 4: "deletes to resolve"
        # is judged PER BIN via delete scoping — a one-partition MERGE
        # no longer drags every other partition's single-file bins into
        # the rewrite.
        from iceberg_compaction_spark.plans import delete_scope

        man = self.table.manifest(snapshot_id)
        pos_all = [r for r in man if r["content"] == mf.CONTENT_POS_DEL]
        eq_all = [r for r in man if r["content"] == mf.CONTENT_EQ_DEL]
        by_path = {r["path"]: r for r in man if r["content"] == mf.CONTENT_DATA}

        def bin_has_deletes(b: BinPlan) -> bool:
            if not (pos_all or eq_all):
                return False
            data = [by_path[p] for p in b.paths if p in by_path]
            pos, eq = delete_scope.scope_deletes(data, pos_all, eq_all)
            return bool(pos or eq)

        out = [
            b
            for b in sorted(bins.values(), key=lambda x: x.bin)
            if len(b.paths) > 1 or bin_has_deletes(b)
        ]
        return out

    # ------------------------------------------------------------------
    # checkpoints
    def _ckpt_dir(self, run_id: str) -> str:
        return os.path.join(self.table.location, "meta", "checkpoints", f"run-{run_id}")

    def _load_checkpoint(self, run_id: str) -> dict[str, dict]:
        d = self._ckpt_dir(run_id)
        done: dict[str, dict] = {}
        if not os.path.isdir(d):
            return done
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".parquet"):
                for row in pq.read_table(os.path.join(d, fn)).to_pylist():
                    if row["status"] == "done":
                        done[row["bin"]] = row
        return done

    def _write_checkpoint_row(self, run_id: str, row: dict) -> None:
        d = self._ckpt_dir(run_id)
        os.makedirs(d, exist_ok=True)
        safe = row["bin"].replace("/", "_").replace("#", "_")
        tmp = os.path.join(d, f".tmp-{safe}.parquet")
        pq.write_table(pa.Table.from_pylist([row], schema=_CKPT_SCHEMA), tmp)
        os.replace(tmp, os.path.join(d, f"bin-{safe}.parquet"))

    # ------------------------------------------------------------------
    def _delete_frames(self, snapshot_id: int, bin_paths: list[str]):
        """Delete DataFrames relevant to one bin + broadcast hints.

        Deletes are SCOPED to the bin's data files before being read
        (``plans/delete_scope``, mirroring the reference's per-task
        attached deletes, file_selection.rs:82-131): a bin only opens
        pos-delete files whose ``_file`` bounds bracket one of its
        paths and eq-delete files whose seq exceeds the bin's min data
        seq with key bounds overlapping the bin's — so a one-partition
        MERGE's delete set is read by that partition's bins only, not
        by every bin of the table."""
        from iceberg_compaction_spark.plans import delete_scope

        man = self.table.manifest(snapshot_id)
        bin_set = set(bin_paths)
        data_rows = [
            r for r in man if r["content"] == mf.CONTENT_DATA and r["path"] in bin_set
        ]
        pos_rows, eq_rows = delete_scope.scope_deletes(
            data_rows,
            [r for r in man if r["content"] == mf.CONTENT_POS_DEL],
            [r for r in man if r["content"] == mf.CONTENT_EQ_DEL],
        )
        pos_df = None
        broadcast_pos = False
        if pos_rows:
            pos_df = scan_mod.read_position_deletes(
                self.spark, [r["path"] for r in pos_rows]
            ).filter(F.col(FILE_COL).isin(bin_paths))
            broadcast_pos = (
                sum(r["size_bytes"] for r in pos_rows) < self.config.inline_delete_threshold_bytes
            )
        eq_groups = []
        if eq_rows:
            by_keys: dict[tuple, list] = {}
            for r in eq_rows:
                by_keys.setdefault(tuple(r["equality_ids"]), []).append(r)
            for keys, grp in sorted(by_keys.items()):
                eq_df = scan_mod.read_equality_deletes(
                    self.spark, [(r["path"], r["sequence_number"]) for r in grp], list(keys)
                )
                small = (
                    sum(r["size_bytes"] for r in grp) < self.config.inline_delete_threshold_bytes
                )
                eq_groups.append((keys, eq_df, small))
        GLOBAL.inc("compaction.delete_files_attached", len(pos_rows) + len(eq_rows))
        return pos_df, broadcast_pos, eq_groups

    @staticmethod
    def _split_bytes(b: BinPlan) -> int:
        """C3's executor_parallelism, realized: size the scan splits so
        the bin fans out to ≈executor_parallelism map tasks (Spark's
        default 128 MB split would coalesce a small-file bin into a
        handful of tasks and strand cores; the reference sets
        target_partitions the same way, mod.rs:93-95)."""
        return max(
            4 << 20,
            min(128 << 20, b.total_bytes // max(b.executor_parallelism, 1) + 1),
        )

    def _rewrite_bin(
        self,
        run_id: str,
        snapshot_id: int,
        b: BinPlan,
        seq_by_path: dict,
        commit_each: bool = False,
    ) -> dict:
        cfg = self.config
        t0 = time.time()
        need_eq = bool(seq_by_path)
        pos_df, bpos, eq_groups = self._delete_frames(snapshot_id, b.paths)
        # epoch-aware read: rewrites migrate pre-rename files' physical
        # column names to the current schema
        df = self.table.read_data_rows(
            self.spark,
            [{"path": p, "sequence_number": seq_by_path[p]} for p in b.paths],
            with_file=pos_df is not None,
            with_pos=pos_df is not None,
            seq_by_path=seq_by_path if eq_groups else None,
        )
        df = apply_deletes(df, pos_df, None, broadcast_pos=bpos)
        for keys, eq_df, small in eq_groups:
            df = apply_deletes(df, None, eq_df, eq_keys=keys, broadcast_eq=small)

        phys_cols = [f.name for f in self.table.physical_schema().fields]
        df = df.select(*phys_cols)

        sort_cols = [
            F.col(c).desc() if desc else F.col(c).asc() for c, desc in cfg.sort_order
        ]
        plain_sort = [c for c, _ in cfg.sort_order]
        if cfg.clustering in ("zorder", "hilbert") and cfg.cluster_columns:
            df = add_cluster_key(df, list(cfg.cluster_columns), curve=cfg.clustering)
            df = df.repartitionByRange(b.output_parallelism, CLUSTER_COL).sortWithinPartitions(
                CLUSTER_COL, *plain_sort
            ).drop(CLUSTER_COL)
        else:
            # range keys include turn_idx ⇒ hot conversations split
            # across output partitions (explicit skew handling)
            df = df.repartitionByRange(b.output_parallelism, *sort_cols).sortWithinPartitions(
                *sort_cols
            )

        # 1.5× slack: output partitions are already ≈target-sized by
        # output_parallelism; the row cap only splits pathological skew,
        # not the expected partition (which would shed tiny remainders)
        with self._row_size_lock:
            avg_row = self._row_size.value
        if avg_row is None:  # no output observed yet: input-size estimate
            avg_row = b.total_bytes / max(b.record_count, 1)
        rows_per_file = int(cfg.records_per_file(avg_row) * 1.5)
        safe = b.bin.replace("/", "_").replace("#", "_")
        # out_dir is unique PER ATTEMPT (uuid suffix), never reused:
        # in WorkerCommit mode a resumed run re-plans from the current
        # snapshot with an empty checkpoint, so a bin NAME can recur
        # while its previous attempt's files are already committed and
        # live — deleting a name-keyed dir would unlink live data.
        # A crash mid-write leaves a partial dir that nothing
        # references; clean_orphan_files sweeps it.
        out_dir = os.path.join(
            self.table.data_dir,
            f"run-{run_id}",
            f"bin-{safe}-{uuid.uuid4().hex[:8]}",
        )
        tw = time.time()
        (
            self.table.bloom_write_options(df.write.mode("error"))
            .option("maxRecordsPerFile", rows_per_file)
            .parquet(out_dir)
        )
        GLOBAL.inc("compaction.write_s", time.time() - tw)
        ts_ = time.time()
        infos = mf.collect_file_infos(
            mf.list_parquet_files(out_dir), content=mf.CONTENT_DATA, spark=self.spark
        )
        infos = self.table.attach_blooms(infos, self.spark)
        GLOBAL.inc("compaction.stats_s", time.time() - ts_)
        for fi in infos:
            fi.partition = Table._partition_of(fi)
        self._info_cache[b.bin] = infos
        with self._row_size_lock:
            self._row_size.update(
                sum(fi.size_bytes for fi in infos),
                sum(fi.record_count for fi in infos),
            )
        if commit_each:
            # WorkerCommit (reference task.rs:62-64): the bin's replace
            # snapshot lands immediately. No expected-parent pin —
            # sibling bins advance the table concurrently; safety comes
            # from removed-paths-still-live validation (bins never
            # share inputs). Commits serialize on the table lock, so
            # with parallel bins every sibling contends at once — the
            # retry budget must cover the whole convoy, not the default
            # single-writer setting.
            self.table.commit(
                "replace",
                added=infos,
                removed_paths=sorted(b.paths),
                retries=max(16, cfg.commit_max_retries),
                backoff_base_s=cfg.commit_backoff_base_s,
                backoff_cap_s=cfg.commit_backoff_cap_s,
            )
        t1 = time.time()
        row = {
            "run_id": run_id,
            "snapshot_id": snapshot_id,
            "bin": b.bin,
            "partition": b.partition,
            "status": "done",
            "input_paths": b.paths,
            "output_paths": [fi.path for fi in infos],
            "input_bytes": b.total_bytes,
            "output_bytes": sum(fi.size_bytes for fi in infos),
            "input_files": len(b.paths),
            "output_files": len(infos),
            "rows_processed": sum(fi.record_count for fi in infos),
            "execution_time_ms": int((t1 - t0) * 1000),
            "started_ms": int(t0 * 1000),
            "finished_ms": int(t1 * 1000),
        }
        self._write_checkpoint_row(run_id, row)
        return row

    # ------------------------------------------------------------------
    def _removable_delete_files(self, snapshot_id: int, rewritten: set[str]) -> list[str]:
        """Delete files that become dangling once ``rewritten`` data
        files are replaced (C12 cleanDanglingDeleteFiles):
          * a position-delete file whose referenced data files are all
            rewritten;
          * an equality-delete file with no surviving data file of a
            lower sequence number."""
        man = self.table.manifest(snapshot_id)
        data_rows = [r for r in man if r["content"] == mf.CONTENT_DATA]
        remaining = [r for r in data_rows if r["path"] not in rewritten]
        removable: list[str] = []

        pos_rows = [r for r in man if r["content"] == mf.CONTENT_POS_DEL]
        if pos_rows:
            pos_paths = [r["path"] for r in pos_rows]
            remaining_paths = sorted(r["path"] for r in remaining)
            if not remaining_paths:
                removable.extend(pos_paths)
            else:
                # executor-side: the per-row reference set never reaches
                # the driver — only one aggregate row per delete *file*
                # (bounded by the manifest, not by delete-row count)
                refs = scan_mod.read_position_deletes(self.spark, pos_paths).select(
                    F.col(FILE_COL).alias("ref"),
                    scan_mod.norm_file_path(F.input_file_name()).alias("delfile"),
                )
                # surviving-data-path set built FROM files_df, never
                # materialized through the driver (at 10^6 files the
                # python-list route ships ~10^8 bytes of strings);
                # only the rewritten set — bin-bounded — rides inline
                rem_df = (
                    self.table.files_df(self.spark, snapshot_id)
                    .filter(F.col("content") == mf.CONTENT_DATA)
                    .select(F.col("path").alias("ref"))
                )
                if rewritten:
                    # as a broadcast anti-join, not isin(): a FULL run
                    # rewrites every file and a 10^5-literal expression
                    # tree would choke Catalyst; data ships once
                    rw = self.spark.createDataFrame(
                        [(p,) for p in sorted(rewritten)], "ref string"
                    )
                    rem_df = rem_df.join(F.broadcast(rw), on="ref", how="left_anti")
                alive = {
                    r["delfile"]
                    for r in refs.join(rem_df, on="ref", how="left_semi")
                    .select("delfile")
                    .distinct()
                    .collect()
                }
                removable.extend(p for p in pos_paths if p not in alive)

        min_remaining_seq = min((r["sequence_number"] for r in remaining), default=None)
        for r in (r for r in man if r["content"] == mf.CONTENT_EQ_DEL):
            if min_remaining_seq is None or r["sequence_number"] <= min_remaining_seq:
                removable.append(r["path"])
        return removable

    # ------------------------------------------------------------------
    def execute(
        self,
        run_id: str | None = None,
        snapshot_id: int | None = None,
        parallel_bins: int | None = None,
    ) -> CompactionResult:
        """Run a full compaction. Re-invoke with the same ``run_id`` to
        resume an interrupted run (finished bins are skipped; outputs
        reused; single commit at the end).

        ``parallel_bins``: concurrent bin rewrites as overlapped Spark
        jobs on driver threads (guide §2.6 — a bin's output tail leaves
        most executors idle; the next bin's tasks back-fill them).
        ``None`` (round 9 default) adapts to min(8, pending bins);
        pass 1 to force strictly sequential bins."""
        cfg = self.config
        t0 = time.time()
        run_id = run_id or uuid.uuid4().hex[:12]
        sid = snapshot_id if snapshot_id is not None else self.table.current_snapshot_id
        if sid is None:
            raise ValidationError("table has no snapshot to compact")

        worker_mode = cfg.commit_mode == CommitMode.WORKER_COMMIT
        if worker_mode:
            # WorkerCommit needs no checkpoint replay: committed bins'
            # inputs already left the manifest, so re-planning from the
            # current snapshot finds only un-rewritten files — resume is
            # a plain re-run. Checkpoint rows remain as lineage.
            done: dict[str, dict] = {}
        else:
            done = self._load_checkpoint(run_id)
            for row in done.values():
                if row["snapshot_id"] != sid:
                    raise ValidationError(
                        f"checkpoint run-{run_id} pinned snapshot {row['snapshot_id']}, "
                        f"table now at {sid}; start a new run"
                    )

        bins = self.plan(sid)
        res = CompactionResult(run_id=run_id, snapshot_before=sid, snapshot_after=None)
        res.bins_total = len(bins)
        if not bins:
            res.snapshot_after = sid
            res.wall_s = time.time() - t0
            return res

        man = self.table.manifest(sid)
        eq_present = any(r["content"] == mf.CONTENT_EQ_DEL for r in man)
        seq_all = {r["path"]: r["sequence_number"] for r in man if r["content"] == mf.CONTENT_DATA}

        pending = [b for b in bins if b.bin not in done]
        rows: list[dict] = list(done.values())

        def run_bin(b: BinPlan) -> dict:
            # per-file seqs always flow (the epoch-aware read needs
            # them); the eq-delete join only consumes them when
            # equality deletes exist
            seqs = {p: seq_all[p] for p in b.paths}
            return self._rewrite_bin(run_id, sid, b, seqs, commit_each=worker_mode)

        # One scan-split size for the whole run, set before any bin and
        # restored after: per-bin session-conf mutation raced when bins
        # ran on concurrent driver threads (one bin's split size applied
        # to another's scan) and leaked into later queries. The smallest
        # per-bin split is safe for every bin — extra map tasks are
        # cheap; stranded cores are not.
        split = min((self._split_bytes(b) for b in pending), default=None)
        conf_key = "spark.sql.files.maxPartitionBytes"
        prev_split = self.spark.conf.get(conf_key, None)
        if split is not None:
            self.spark.conf.set(conf_key, str(split))
        if parallel_bins is None:
            parallel_bins = min(8, max(1, len(pending)))
        try:
            if parallel_bins > 1 and len(pending) > 1:
                # concurrent Spark jobs on one session — the scheduler
                # interleaves stages (replaces the reference's worker pool)
                with ThreadPoolExecutor(max_workers=parallel_bins) as ex:
                    rows += list(ex.map(run_bin, pending))
            else:
                rows += [run_bin(b) for b in pending]
        finally:
            if split is not None:
                if prev_split is None:
                    self.spark.conf.unset(conf_key)
                else:
                    self.spark.conf.set(conf_key, prev_split)

        res.bins_executed = len(pending)
        res.bins_skipped = len(done)

        if worker_mode:
            # bins already committed themselves; sweep deletes that
            # became dangling across the whole run in one final commit
            cur = self.table.current_snapshot_id
            removable_dels = self._removable_delete_files(cur, set())
            if removable_dels:
                cur = self.table.commit(
                    "maintenance",
                    removed_paths=removable_dels,
                    retries=cfg.commit_max_retries,
                    backoff_base_s=cfg.commit_backoff_base_s,
                    backoff_cap_s=cfg.commit_backoff_cap_s,
                )
            res.snapshot_after = cur
            res.input_files = sum(r["input_files"] for r in rows)
            res.output_files = sum(r["output_files"] for r in rows)
            res.input_bytes = sum(r["input_bytes"] for r in rows)
            res.output_bytes = sum(r["output_bytes"] for r in rows)
            res.rows_processed = sum(r["rows_processed"] for r in rows)
            res.removed_delete_files = len(removable_dels)
            res.lineage = rows
            res.wall_s = time.time() - t0
            GLOBAL.inc("compaction.runs")
            GLOBAL.inc("compaction.bins_executed", res.bins_executed)
            GLOBAL.inc("compaction.bytes_read", res.input_bytes)
            GLOBAL.inc("compaction.bytes_written", res.output_bytes)
            GLOBAL.inc("compaction.rows_rewritten", res.rows_processed)
            return res

        # ---- single atomic commit (PlannerCommit) ----
        rewritten = {p for r in rows for p in r["input_paths"]}
        added: list[mf.FileInfo] = []
        for r in rows:
            cached = self._info_cache.get(r["bin"])
            if cached is not None:
                added.extend(cached)
            else:  # resumed bin: stats re-read from its output footers
                infos = mf.collect_file_infos(
                    r["output_paths"], content=mf.CONTENT_DATA, spark=self.spark
                )
                for fi in infos:
                    fi.partition = Table._partition_of(fi)
                added.extend(infos)
        removable_dels = self._removable_delete_files(sid, rewritten)

        if cfg.commit_mode == CommitMode.NO_COMMIT:
            res.snapshot_after = sid
        else:
            res.snapshot_after = self.table.commit(
                "replace",
                added=added,
                removed_paths=sorted(rewritten) + removable_dels,
                expected_snapshot_id=sid,
                retries=cfg.commit_max_retries,
                backoff_base_s=cfg.commit_backoff_base_s,
                backoff_cap_s=cfg.commit_backoff_cap_s,
            )

        res.input_files = sum(r["input_files"] for r in rows)
        res.output_files = sum(r["output_files"] for r in rows)
        res.input_bytes = sum(r["input_bytes"] for r in rows)
        res.output_bytes = sum(r["output_bytes"] for r in rows)
        res.rows_processed = sum(r["rows_processed"] for r in rows)
        res.removed_delete_files = len(removable_dels)
        res.lineage = rows
        res.wall_s = time.time() - t0
        GLOBAL.inc("compaction.runs")
        GLOBAL.inc("compaction.bins_executed", res.bins_executed)
        GLOBAL.inc("compaction.bytes_read", res.input_bytes)
        GLOBAL.inc("compaction.bytes_written", res.output_bytes)
        GLOBAL.inc("compaction.rows_rewritten", res.rows_processed)
        return res
