#!/usr/bin/env python3
"""Render the SURVEY §8 soak table from a run_soak_r11.sh log: per-query
medians at 1x/10x/26x/100x, full-span exponent log_100(t100/t1), and the
26->100 in-segment slope log_{100/26}(t100/t26)."""
import json, math, sys

DECADES = ["1", "10", "26", "100"]

def main(path):
    runs = {}
    cur = None
    for line in open(path):
        line = line.strip()
        if line.startswith("=== soak "):
            d = line.split()[2]
            cur = ("1" if "sf0.1" in d else
                   "100" if "scale100" in d else
                   "10" if "scale10" in d else "26")
        elif line.startswith("{") and '"queries"' in line:
            runs[cur] = json.loads(line)["queries"]
    qs = sorted(runs.get("1", {}).keys(),
                key=lambda q: (int(q[1:q.index("_")]),))
    print("| query | 1x | 10x | 26x | 100x | exp (full span) | slope 26->100 |")
    print("|---|---|---|---|---|---|---|")
    for q in qs:
        t = [runs[d].get(q) for d in DECADES if d in runs]
        if len(t) < 4 or any(x is None for x in t):
            row = [f"{runs[d][q]:.2f}" if d in runs and q in runs[d] else "-"
                   for d in DECADES]
            print(f"| {q} | " + " | ".join(row) + " | - | - |")
            continue
        exp = math.log(t[3] / t[0]) / math.log(100)
        slope = math.log(t[3] / t[2]) / math.log(100 / 26)
        print(f"| {q} | {t[0]:.2f} | {t[1]:.2f} | {t[2]:.2f} | {t[3]:.2f} "
              f"| {exp:.2f} | {slope:.2f} |")

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/soak_r11.log")
