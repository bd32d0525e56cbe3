#!/bin/sh
# Build the --py-files artifact for spark-submit deploys:
#   tools/make_pyfiles_zip.sh [out.zip]
set -e
OUT="${1:-flow_feature_spark.zip}"
cd "$(dirname "$0")/.."
rm -f "$OUT"
zip -qr "$OUT" flow_feature_spark -x '*__pycache__*'
echo "wrote $OUT — run: spark-submit --py-files $OUT your_job.py"
