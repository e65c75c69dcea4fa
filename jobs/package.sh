#!/usr/bin/env bash
# Build the --py-files artifact and print the spark-submit invocation.
#
# On a cluster:
#   jobs/package.sh
#   spark-submit --master yarn --deploy-mode cluster \
#     --py-files dist/gos2_spark.zip \
#     jobs/pip_tiling_job.py --pages <iceberg-table-or-path> \
#     --tiles tiles.json --output <out> --buckets 256
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/gos2_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/gos2_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("gos2_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in sorted(files):
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/gos2_spark.zip")
EOF
