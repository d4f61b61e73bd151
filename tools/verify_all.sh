#!/bin/bash
# The end-of-round verification stack as ONE command (VERDICT r4 #3: a
# round must never ship unverified again). Runs compile, the full spec
# suite, Verify + DuckDB oracle compare at all three scales, and the
# full bench sweep. Exits non-zero on the FIRST failure.
#
#   tools/verify_all.sh [--quick]     # --quick: sf0.001 oracle only, no bench
#
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== record hygiene =="
# r18 judge finding #2: an unfilled template field (e.g.
# TESTCOUNT_PLACEHOLDER) must never ship in the record again. SURVEY.md
# only: ADVICE.md/VERDICT.md legitimately QUOTE such tokens when they
# report exactly this class of mistake (self-review r19 finding #1 —
# the first form of this gate false-positived on ADVICE.md's quotation
# and made verify_all unrunnable at HEAD).
if grep -nE '[A-Z]+_PLACEHOLDER|TBD_|FIXME_RECORD' SURVEY.md; then
  echo "unfilled template token in the record"; exit 1
fi
echo "no template tokens"

echo "== compile =="
sbt -batch compile 2>&1 | tail -1 | grep -q '\[success\]'

echo "== test suite =="
# tee the full run so the round record can quote the real test count
# (r18 shipped a TESTCOUNT_PLACEHOLDER because the count lived only in
# a scrollback buffer; the grep below still gates on the verdict line)
sbt -batch test 2>&1 | tee /tmp/verify_all_test.log | tail -5 \
  | grep -q 'All tests passed'
# informational only — never fail the gate on a format-shifted summary
grep -E 'Total number of tests run:' /tmp/verify_all_test.log | tail -1 \
  || echo "test count line not found"
echo "all tests passed"

SCALES="0.001 0.01 0.1"
[ "${1:-}" = "--quick" ] && SCALES="0.001"
for s in $SCALES; do
  echo "== verify sf$s =="
  out="/tmp/verify_all_sf$s"
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} \
    sbt -batch "runMain graft.Verify /root/testdata/sf$s $out" \
    > "/tmp/verify_all_sf$s.log" 2>&1
  result=$(python3 tools/check_oracle.py "/root/testdata/sf$s" "$out" | tail -1)
  echo "sf$s: $result"
  echo "$result" | grep -q ' 0 fail'
done

if [ "${1:-}" != "--quick" ]; then
  echo "== bench sf0.1 =="
  # first metric line = per-query detail (kept for the record), last =
  # summary (the gate)
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' \
    | tee /tmp/verify_all_bench_detail.json | tail -1 \
    | tee /tmp/verify_all_bench.json | grep -q '"n_failed":0'
fi

echo "== ALL GREEN =="
