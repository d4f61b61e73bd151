#!/bin/bash
# Fresh-JVM single-mode Jaccard A/B wrapper (r10 ADVICE): alternates
# SPARK_GRAFT_JAC_MODE=expand / prefix, ONE JVM PER SAMPLE, so neither
# heap-state carryover nor a host-stall window can land entirely on one
# mode. This is the arrangement whose numbers the capJaccardPairsPrefix
# refutation scaladoc cites. Usage: run_jac_probe.sh <sfDir> [reps=2]
# Env: SOAK_CPUS (16), SOAK_HEAP (24g), SPARK_GRAFT_JAC_T/..N pass through.
set -u
if [ $# -lt 1 ]; then
  echo "usage: run_jac_probe.sh <sfDir> [reps=2]" >&2; exit 2
fi
DIR="$1"; REPS="${2:-2}"
. "$(dirname "$0")/jvm_opts.sh"
CP="$GRAFT_TEST_CP"
export SPARK_GRAFT_CPUS="${SOAK_CPUS:-16}"
for rep in $(seq 1 "$REPS"); do
  for mode in expand prefix; do
    echo "[jac-wrapper] fresh-jvm rep=$rep mode=$mode dir=$DIR"
    SPARK_GRAFT_JAC_MODE="$mode" java -cp "$CP" $ADDOPENS \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -Xmx"${SOAK_HEAP:-24g}" \
      graft.ops.JaccardStageProbe "$DIR" 2>&1 | grep -E 'jac-probe|Error|Exception' | head -20
  done
done
