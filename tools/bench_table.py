#!/usr/bin/env python3
"""Render per-query MIN and MEDIAN from a Bench detail line (r15 VERDICT
#6: the artifact's max column carries host-noise spreads — quoting min
AND median makes the record robust to a single loaded rep).

Bench's `queries` map is already the per-query MEDIAN of k interleaved
sweeps; `spread` carries [min, max]. This renders them side by side and,
given a second artifact, the min-ratio and median-ratio columns the
round records quote.

  tools/bench_table.py BENCH.json [BASELINE.json]
"""
import json
import sys


def load(path):
    # the detail line is the FIRST metric line; tolerate files holding
    # either the bare JSON or sbt-prefixed log lines
    for line in open(path):
        line = line.strip()
        if line.startswith("[info] {"):
            line = line[len("[info] "):]
        if line.startswith("{") and '"queries"' in line:
            d = json.loads(line)
            # Bench writes median -1 for FAILED queries (Bench.scala:
            # "a failed query reports -1") — surface them, never let
            # the sentinel corrupt ratios or totals
            med = d["queries"]
            failed = sorted(q for q, v in med.items() if v < 0)
            if failed:
                print(f"!! {len(failed)} FAILED queries excluded from "
                      f"{path}: {', '.join(failed)}", file=sys.stderr)
            return ({q: v for q, v in med.items() if v >= 0},
                    d.get("spread", {}))
    raise SystemExit(f"no bench detail line in {path}")


def main(cur_path, base_path=None):
    med, spread = load(cur_path)
    base_med, base_spread = load(base_path) if base_path else ({}, {})
    hdr = "| query | min | median |"
    sep = "|---|---|---|"
    if base_path:
        hdr += " base min | base med | min ratio | med ratio |"
        sep += "---|---|---|---|"
    print(hdr)
    print(sep)
    ratios_min, ratios_med = [], []
    for q in sorted(med, key=lambda q: int(q[1:q.index("_")])):
        mn = spread.get(q, [med[q], med[q]])[0]
        row = f"| {q} | {mn:.2f} | {med[q]:.2f} |"
        if base_path and q in base_med:
            bmn = base_spread.get(q, [base_med[q], base_med[q]])[0]
            if bmn <= 0 or base_med[q] <= 0 or mn <= 0 or med[q] <= 0:
                # a degenerate entry on EITHER side (zero/negative min
                # or median) would silently skew the shared-set totals
                # — exclude the pair like a failed query, loudly
                print(f"!! {q} excluded from shared-set totals: "
                      f"degenerate entry (head min {mn}, med {med[q]}; "
                      f"base min {bmn}, med {base_med[q]})",
                      file=sys.stderr)
                row += f" {bmn:.2f} | {base_med[q]:.2f} | nan | nan |"
            else:
                rmin = mn / bmn
                rmed = med[q] / base_med[q]
                ratios_min.append((mn, bmn))
                ratios_med.append((med[q], base_med[q]))
                row += f" {bmn:.2f} | {base_med[q]:.2f} | {rmin:.2f} | {rmed:.2f} |"
        elif base_path:
            row += " - | - | - | - |"
        print(row)
    if ratios_min:
        smin = sum(a for a, _ in ratios_min) / sum(b for _, b in ratios_min)
        smed = sum(a for a, _ in ratios_med) / sum(b for _, b in ratios_med)
        print(f"\nshared-set totals: min-ratio {smin:.3f}  median-ratio {smed:.3f}"
              f"  ({len(ratios_min)} shared queries)")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
