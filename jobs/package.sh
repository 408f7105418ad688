#!/usr/bin/env bash
# Build the --py-files zip for spark-submit (north rule: ships as a
# spark-submit --py-files package).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ocr_spark.zip
zip -qr dist/ocr_spark.zip ocr_spark -x '*__pycache__*'
echo "dist/ocr_spark.zip"
