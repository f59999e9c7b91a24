#!/usr/bin/env bash
# Package the engine as a --py-files zip and run the scaling workload
# through spark-submit (the north-rule deployment shape).
#   usage: scripts/spark_submit_bench.sh [CORES] [TURNS]
set -euo pipefail
cd "$(dirname "$0")/.."
CORES="${1:-8}"
TURNS="${2:-2000000}"
ZIP="$(mktemp -d)/icemaint_pkg.zip"
python - "$ZIP" <<'EOF'
import sys, zipfile, os
zf = zipfile.ZipFile(sys.argv[1], "w", zipfile.ZIP_DEFLATED)
for root, _dirs, files in os.walk("iceberg_compaction_spark"):
    for f in files:
        if f.endswith(".py"):
            p = os.path.join(root, f)
            zf.write(p, p)
zf.close()
EOF
SPARK_SUBMIT="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"
exec "$SPARK_SUBMIT" \
  --master "local[$CORES]" \
  --conf spark.sql.session.timeZone=UTC \
  --py-files "$ZIP" \
  bench.py --scale-worker "$CORES" "$TURNS"
