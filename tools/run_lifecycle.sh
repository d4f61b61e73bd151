#!/bin/bash
# Lifecycle decade runner (r19, VERDICT #7): runs the composed
# collector→rollup→retention/compaction→serve soak (test-scoped main
# graft.streaming.LifecycleSoak) OUTSIDE sbt in a fresh JVM, so RPS
# decades compare like-for-like. Usage:
#   run_lifecycle.sh <rps> [<dur_s>=300]
# Env passthrough: SPARK_GRAFT_LC_* dials (format, publish cadence,
# serve cache), SPARK_GRAFT_CPUS (16), SOAK_HEAP (24g). Exit 1 = a
# reconcile gate failed (exactly-once/retention arithmetic or rollup
# drift).
set -u
if [ $# -lt 1 ]; then
  echo "usage: run_lifecycle.sh <rps> [<dur_s>=300]" >&2; exit 2
fi
. "$(dirname "$0")/jvm_opts.sh"
export SPARK_GRAFT_LC_RPS="$1"
export SPARK_GRAFT_LC_DUR_S="${2:-300}"
exec java -cp "$GRAFT_TEST_CP" $ADDOPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SOAK_HEAP:-24g}" \
  graft.streaming.LifecycleSoak
