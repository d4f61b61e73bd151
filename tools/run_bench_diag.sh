#!/bin/bash
# Reproduce the driver's full bench sweep outside sbt, with code-cache +
# jstack sampling, to root-cause the late-sweep degradation (VERDICT r3 #1).
set -u
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OUT="${1:-/tmp/benchdiag}"
mkdir -p "$OUT"
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
ADDOPENS="$ADDOPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
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
