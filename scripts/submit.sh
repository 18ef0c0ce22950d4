#!/usr/bin/env bash
# Package the engine and run a query via spark-submit --py-files — the
# deployment path the north rule prescribes for multi-executor clusters.
# Usage: scripts/submit.sh [master] [sf_dir] [query ...]
#   master defaults to local[8]; on a real cluster pass yarn / k8s:// etc.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${1:-local[8]}"
SF_DIR="${2:-/root/testdata/sf0.001}"
shift $(( $# > 2 ? 2 : $# )) || true
QUERIES=("${@:-pip_cap_join}")

ZIP="$(mktemp -d)/s2geometry_d_spark.zip"
# package the library + the driver-contract module
(cd "$REPO" && zip -qr "$ZIP" s2geometry_d_spark && zip -qj "$ZIP" __spark_entry__.py bench.py)

spark-submit \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=8 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.python.unix.domain.socket.enabled=true \
  --conf spark.ui.enabled=false \
  --py-files "$ZIP" \
  "$REPO/scripts/submit_job.py" "$SF_DIR" "${QUERIES[@]}"
