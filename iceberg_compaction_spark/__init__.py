"""iceberg_compaction_spark — a from-scratch, PySpark-native lakehouse
table-maintenance engine with the capabilities of the reference
``Shreyas220/iceberg-compaction`` (Rust/DataFusion), re-expressed as
idiomatic Spark DataFrame plans.

Capabilities (SURVEY.md §2):
  * size-tiered bin-packing compaction of small data files (FFD planner)
  * merge-on-read: positional + equality delete application via anti-joins
  * Z-order / Hilbert clustering via vectorized pandas UDFs
  * MERGE INTO upserts keyed (conv_id, turn_idx), MoR-style
  * snapshot expiry, orphan-file cleanup, manifest rewrite
  * per-partition lineage + checkpoint resume, atomic snapshot commits
  * training-data pipeline ops: dedup (exact/MinHash-LSH/SimHash/Jaccard/
    embedding-cosine), ANN similarity search, text analysis, multimodal
    column plumbing

Everything is built on the public PySpark DataFrame API; no code is
ported from the reference (cited by file:line in docstrings for parity
checking only).
"""

__version__ = "0.1.0"

from iceberg_compaction_spark.config import CompactionConfig  # noqa: F401
from iceberg_compaction_spark.session import get_spark  # noqa: F401
