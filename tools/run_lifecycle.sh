#!/bin/bash
# Lifecycle decade runner (r19, VERDICT #7): runs the composed
# collector→rollup→retention/compaction→serve soak (test-scoped main
# graft.streaming.LifecycleSoak) OUTSIDE sbt in a fresh JVM, so RPS
# decades compare like-for-like. Usage:
#   run_lifecycle.sh <rps> [<dur_s>]
# Env passthrough: SPARK_GRAFT_LC_* dials (format, publish cadence,
# serve cache), SPARK_GRAFT_CPUS (16). Exit 1 = a reconcile gate
# failed (exactly-once/retention arithmetic or rollup drift).
set -u
CP="/root/repo/target/scala-2.13/test-classes:/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
ADDOPENS="$ADDOPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
export SPARK_GRAFT_LC_RPS="$1"
export SPARK_GRAFT_LC_DUR_S="${2:-300}"
exec java -cp "$CP" $ADDOPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SOAK_HEAP:-24g}" \
  graft.streaming.LifecycleSoak
