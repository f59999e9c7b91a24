"""Engine-wide ban on per-row Python UDFs (BASELINE.json input_hint:
vectorized pandas/Arrow UDFs only). Two guards: no ``F.udf`` in the
package source, and representative physical plans contain only
ArrowEvalPython, never BatchEvalPython."""

from __future__ import annotations

import os
import re

PKG = os.path.join(os.path.dirname(__file__), "..", "iceberg_compaction_spark")


def test_no_row_udf_in_source():
    bad = []
    for root, _d, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            src = open(os.path.join(root, fn)).read()
            if re.search(r"\bF\.udf\b|\budf\(", src) and "pandas_udf" not in src.split(
                "import"
            )[0]:
                if re.search(r"(?<!pandas_)udf\(", src.replace("pandas_udf", "PUDF")):
                    bad.append(fn)
    assert not bad, f"row-at-a-time udf() found in {bad}"


def test_plans_arrow_only(spark):
    from pyspark.sql import functions as F

    from iceberg_compaction_spark.functions.clustering import add_cluster_key

    df = spark.range(0, 1000).select(
        (F.col("id") % 10).alias("x"), (F.col("id") % 7).alias("y")
    )
    out = add_cluster_key(df, ["x", "y"], curve="hilbert")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan
