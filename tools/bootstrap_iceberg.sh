#!/usr/bin/env bash
# Bootstrap an Iceberg-enabled Spark session for sparklink and run the
# jar-gated end-to-end catalog test (tests/test_round3.py::
# test_catalog_iceberg_branch_end_to_end, skipped in sandboxes without a
# jar or network).
#
# The sandbox this repo is developed in has no network and no Iceberg
# runtime jar, so the Iceberg branch of checkpoints.Catalog is exercised
# only by inspection + the parquet-backend tests there. This script makes
# the claim executable anywhere that has either (a) network to Maven
# Central or (b) a pre-downloaded runtime jar.
#
# Usage:
#   bash tools/bootstrap_iceberg.sh                 # resolve jar via ivy
#   ICEBERG_JAR=/path/iceberg-spark-runtime.jar \
#   bash tools/bootstrap_iceberg.sh                 # use a local jar
#
# Pick the runtime artifact matching your Spark minor version
# (pyspark 4.1.x in this repo -> the newest iceberg-spark-runtime-4.x
# available; 4.0_2.13 works against Spark 4.0 sessions):
ICEBERG_PKG="${ICEBERG_PKG:-org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0}"
WAREHOUSE="${WAREHOUSE:-/tmp/sparklink_iceberg_warehouse}"

set -euo pipefail
cd "$(dirname "$0")/.."

CONF=(
  --conf "spark.sql.catalog.ice=org.apache.iceberg.spark.SparkCatalog"
  --conf "spark.sql.catalog.ice.type=hadoop"
  --conf "spark.sql.catalog.ice.warehouse=${WAREHOUSE}"
  --conf "spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
)
if [[ -n "${ICEBERG_JAR:-}" ]]; then
  JARS=(--conf "spark.jars=${ICEBERG_JAR}")
else
  JARS=(--conf "spark.jars.packages=${ICEBERG_PKG}")
fi

# Route the test through spark-submit so the jar is on BOTH driver and
# executor classpaths before the JVM starts (builder confs cannot add
# jars to a running driver).
exec spark-submit --master "local[8]" "${JARS[@]}" "${CONF[@]}" \
  tools/run_iceberg_e2e.py
