#!/usr/bin/env bash
# Build the spark-submit --py-files artifact (north_star packaging).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/sparklink.zip
zip -qr dist/sparklink.zip sparklink -x "*/__pycache__/*"
zip -qj dist/sparklink.zip models/transcript_model.json
echo "dist/sparklink.zip:"
unzip -l dist/sparklink.zip | tail -3
