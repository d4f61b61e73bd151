#!/bin/bash
# Scale-soak timing runner (SURVEY §8 protocol): graft.Bench outside sbt,
# pinned CPUs/heap so decades compare like-for-like. Usage:
#   run_soak.sh <sfDir> <parts> [<only-csv>]
# Env: SOAK_CPUS (16), SOAK_HEAP (24g), SPARK_GRAFT_BENCH_K (3).
set -u
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
ADDOPENS="$ADDOPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
export SPARK_GRAFT_SF_DIR="$1"
export SPARK_GRAFT_SHUFFLE_PARTITIONS="$2"
export SPARK_GRAFT_CPUS="${SOAK_CPUS:-16}"
if [ $# -ge 3 ]; then export SPARK_GRAFT_ONLY="$3"; fi
exec java -cp "$CP" $ADDOPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SOAK_HEAP:-24g}" \
  graft.Bench
