#!/usr/bin/env python
"""Extra benchmarks for optimization work (round 9).

``bench.py`` is the frozen driver contract; this file exists so the
optimization loop can time individual queries, attribute build vs op
phases, and capture ``explain("formatted")`` plans without touching it
(guide §1.4: isolate the computation with the noop sink; §1.5: label
jobs).

Usage:
    python bench_extra.py time  QUERY [QUERY...] [--sf DIR] [--reps N]
    python bench_extra.py explain QUERY [--sf DIR] [-o FILE]

``time`` prints one JSON line per query: {query, sf, reps,
total_all, op_all, build_all, best_total, best_op}. The query callable
is executed exactly like bench.py does (callable + .count()) so the
numbers are comparable with BENCH_r*.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _qmap():
    import __spark_entry__ as entrymod
    from bench import BENCH_ONLY

    return dict(entrymod.queries(), **BENCH_ONLY)


def _spark(cpus: int):
    from iceberg_compaction_spark.session import get_spark

    return get_spark(
        app_name="icemaint-bench-extra", master=f"local[{cpus}]", shuffle_partitions=cpus
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["time", "explain"])
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)))
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    from iceberg_compaction_spark import benchphase

    qmap = _qmap()
    spark = _spark(args.cpus)
    if not args.no_warm:
        # same warmup discipline as bench.py: JVM/codegen at sf0.001,
        # page cache for the benched SF's parquet inputs
        qmap["transcripts_compaction_roundtrip"](spark, "/root/testdata/sf0.001").count()
        for tbl in ("documents", "events", "embeddings", "lineitem"):
            p = os.path.join(args.sf, f"{tbl}.parquet")
            if os.path.exists(p):
                spark.read.parquet(p).count()

    if args.mode == "explain":
        name = args.queries[0]
        spark.sparkContext.setJobDescription(f"explain: {name}")
        df = qmap[name](spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if args.out:
            with open(args.out, "w") as f:
                f.write(txt)
            print(f"wrote {args.out}")
        else:
            print(txt)
        spark.stop()
        return

    for name in args.queries:
        t_all, op_all, b_all = [], [], []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            benchphase.reset()
            t0 = time.time()
            df = qmap[name](spark, args.sf)
            n = df.count()
            dt = time.time() - t0
            assert n >= 0
            b = benchphase.snapshot().get("build", 0.0)
            t_all.append(round(dt, 3))
            b_all.append(round(b, 3))
            op_all.append(round(dt - b, 3))
        print(json.dumps({
            "query": name, "sf": args.sf, "reps": args.reps,
            "total_all": t_all, "build_all": b_all, "op_all": op_all,
            "best_total": min(t_all), "best_op": min(op_all),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
