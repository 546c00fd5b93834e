#!/usr/bin/env bash
# Package the engine and run the flagship job via spark-submit
# --py-files (the north-rule submission path). Run twice to
# demonstrate checkpoint resume (second run: all stages resumed=true).
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/util_gis_spark.zip
rm -f "$ZIP"
python -c "
import zipfile, os
with zipfile.ZipFile('$ZIP', 'w') as z:
    for root, _, files in os.walk('util_gis_spark'):
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
print('packaged', '$ZIP')
"

SF_DIR="${1:-/root/testdata/sf0.001}"
CKPT="${2:-/tmp/util_gis_ckpt_demo}"
rm -rf "$CKPT"

SPARK_SUBMIT=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'bin', 'spark-submit'))")
echo "== run 1 (cold) =="
"$SPARK_SUBMIT" --master "local[8]" --py-files "$ZIP" scripts/submit_job.py "$SF_DIR" "$CKPT" 2>/dev/null | tail -1
echo "== run 2 (resume) =="
"$SPARK_SUBMIT" --master "local[8]" --py-files "$ZIP" scripts/submit_job.py "$SF_DIR" "$CKPT" 2>/dev/null | tail -1
