#!/usr/bin/env bash
# Pinned-worktree same-host A/B bench (r16 VERDICT #6 / what's-wrong #2):
# artifact-total comparisons across rounds carry host drift — the r16
# adjudication showed host variance exceeding the whole round-over-round
# delta — so code-attribution claims must come from THIS controlled
# protocol: build <base-rev> in a git worktree, run the IDENTICAL
# restricted bench sweep on the current HEAD and on the base minutes
# apart on the same host at gate settings, and render the two-column
# min/median table with per-query ratios (tools/bench_table.py; ratios
# are head/base, < 1 means HEAD is faster).
#
#   tools/ab_bench.sh <base-rev> <q1,q2,...> [out-dir]
#
# Gate settings are pinned: CPUS=32, shuffle partitions 32, the default
# k=3 interleaved sweeps (soak-dial numbers don't transfer — see the
# repo memory on partition-dial scheduler overhead). SPARK_GRAFT_SF_DIR
# overrides the corpus (default sf0.1). Do NOT run while another sbt
# task owns target/ (shared-lock hazard; the verify skill's gotcha).
set -euo pipefail
cd "$(dirname "$0")/.."
REV="${1:?usage: ab_bench.sh <base-rev> <q1,q2,...> [out-dir]}"
QUERIES="${2:?usage: ab_bench.sh <base-rev> <q1,q2,...> [out-dir]}"
OUT="${3:-/tmp/graft_ab}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
mkdir -p "$OUT"
WT="$OUT/base-$(git rev-parse --short "$REV")"
# A reused worktree must be CLEAN and at the requested rev — a leftover
# modified tree would silently bench dirty "base" code (r17 ADVICE).
# target/ is sbt build output (untracked via .gitignore), never a dirt
# signal; anything porcelain reports IS.
if [ -d "$WT" ]; then
  # rev-parse fails when $WT exists on disk but is no longer a
  # registered worktree (pruned metadata, copied dir) — treat that as
  # a mismatch too rather than letting set -e abort mid-check
  if [ -n "$(git -C "$WT" status --porcelain 2>/dev/null || echo dirty)" ] || \
     [ "$(git -C "$WT" rev-parse HEAD 2>/dev/null || echo none)" != "$(git rev-parse "$REV^{commit}")" ]; then
    echo "base worktree $WT is dirty, stale, or at the wrong rev — recreating" >&2
    git worktree remove --force "$WT" 2>/dev/null \
      || { rm -rf "$WT"; git worktree prune; }
  fi
fi
if [ ! -d "$WT" ]; then
  git worktree add --detach "$WT" "$REV"
fi

bench() {
  local dir="$1" label="$2"
  echo "== bench $label ($(git -C "$dir" rev-parse --short HEAD)) =="
  ( cd "$dir" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_SHUFFLE_PARTITIONS=32 SPARK_GRAFT_ONLY="$QUERIES" \
      sbt -batch "runMain graft.Bench" 2>&1 | grep '"queries"' ) \
    > "$OUT/$label.json"
  grep -q '"queries"' "$OUT/$label.json" # the detail line must exist
}

# base first (its worktree pays a cold compile inside the timed-off sbt
# run), then HEAD, then base AGAIN — the second base sweep is the A/A
# CONTROL: same code, so its ratio table is the host's run-to-run band
# (r17 measured ±10-20% on this host), and a head/base ratio only
# carries a code-attribution claim when it falls OUTSIDE that band.
# All sweeps interleave k samples internally, so one host freeze
# cannot pin a whole query's median in any arm.
bench "$WT" base
bench . head
bench "$WT" base_control
echo
echo "== head vs base =="
python3 tools/bench_table.py "$OUT/head.json" "$OUT/base.json" \
  | tee "$OUT/ab_table.md"
echo
echo "== A/A control (base re-run vs base — same code; this is the host band) =="
python3 tools/bench_table.py "$OUT/base_control.json" "$OUT/base.json" \
  | tee "$OUT/aa_table.md"
echo
echo "tables: $OUT/ab_table.md (head/base; < 1 = HEAD faster)"
echo "        $OUT/aa_table.md (A/A band; code claims need ratios outside it)"
