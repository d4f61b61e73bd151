#!/bin/bash
# Reproduce the driver's full bench sweep outside sbt, with code-cache +
# jstack sampling, to root-cause the late-sweep degradation (VERDICT r3 #1).
set -u
. "$(dirname "$0")/jvm_opts.sh"
CP="$GRAFT_CP"
OUT="${1:-/tmp/benchdiag}"
mkdir -p "$OUT"
EXTRA_FLAGS="${BENCH_FLAGS:--XX:PerMethodRecompilationCutoff=-1 -XX:PerBytecodeRecompilationCutoff=-1}"
export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
java -cp "$CP" $ADDOPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx8g $EXTRA_FLAGS \
  -Xlog:codecache=info \
  graft.Bench > "$OUT/bench.out" 2> "$OUT/bench.err" &
PID=$!
echo "$PID" > "$OUT/pid"
# sampler: code cache usage + compiler queue + one jstack every 20s
# (jstack count capped — an overnight hang must not fill the disk)
MAX_JSTACKS="${MAX_JSTACKS:-90}"
( N=0
  while kill -0 "$PID" 2>/dev/null; do
    TS=$(date +%s)
    { echo "=== $TS ==="; jcmd "$PID" Compiler.codecache 2>/dev/null; jcmd "$PID" Compiler.queue 2>/dev/null | head -5; } >> "$OUT/codecache.log"
    if [ "$N" -lt "$MAX_JSTACKS" ]; then
      jstack "$PID" > "$OUT/jstack_$TS.txt" 2>/dev/null
      N=$((N + 1))
    fi
    sleep 20
  done ) &
SAMPLER=$!
# interrupt must not orphan the bench JVM or the sampler subshell
trap 'kill "$PID" "$SAMPLER" 2>/dev/null; exit 130' INT TERM
wait "$PID"
echo "bench exit: $?" >> "$OUT/codecache.log"
kill "$SAMPLER" 2>/dev/null
