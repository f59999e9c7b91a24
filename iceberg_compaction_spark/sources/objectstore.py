"""S5: object-store wiring (reference
``DataFusionEngine::register_object_store``, mod.rs:440-517).

Spark reaches s3:// through the Hadoop S3A connector, so "registering"
an object store is Hadoop configuration on the session. The sandbox has
no object store — this helper is exercised only for config plumbing
(the rest of the engine is path-agnostic: every read/write goes through
``spark.read.parquet`` / ``df.write.parquet`` on whatever scheme the
table location carries).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def configure_s3a(
    spark: SparkSession,
    access_key: str | None = None,
    secret_key: str | None = None,
    endpoint: str | None = None,
    path_style_access: bool = True,
    region: str | None = None,
) -> None:
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    if access_key:
        hc.set("fs.s3a.access.key", access_key)
    if secret_key:
        hc.set("fs.s3a.secret.key", secret_key)
    if endpoint:
        hc.set("fs.s3a.endpoint", endpoint)
    if region:
        hc.set("fs.s3a.endpoint.region", region)
    hc.set("fs.s3a.path.style.access", "true" if path_style_access else "false")
    # multipart behavior mirroring the reference's writer settings
    # (8 MB chunks, ≥5 MB S3 floor — logical_plan_sketch.rs:116,183-189)
    hc.set("fs.s3a.multipart.size", str(8 << 20))
    hc.set("fs.s3a.fast.upload", "true")
