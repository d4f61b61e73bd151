#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate (driver-side tooling, not part
of the Scala library). Usage:

    python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For every query dumped by graft.Verify, runs the corresponding oracle SQL
in DuckDB over the same parquet tables and compares: row count, column
names (sorted), and cell values in row order (floats exact; reports the
max abs diff when only floats differ).
"""
import json, math, sys
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None or v is pd.NaT:
        return None
    if hasattr(v, "tolist") and not hasattr(v, "item"):  # numpy array
        return tuple(norm_cell(x) for x in v.tolist())
    if hasattr(v, "__len__") and not isinstance(v, str):
        return tuple(norm_cell(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    return v


def load_spark(path):
    files = sorted(str(p) for p in __import__("pathlib").Path(path).glob("*.parquet"))
    t = pq.read_table(files)
    return t.to_pandas()


def compare(name, sdf, odf):
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    cols = sorted(sdf.columns)
    sdf, odf = sdf[cols], odf[cols]
    if len(sdf) != len(odf):
        return [f"row count: spark={len(sdf)} oracle={len(odf)}"]
    max_float_diff = 0.0
    for c in cols:
        sv = [norm_cell(x) for x in sdf[c].tolist()]
        ov = [norm_cell(x) for x in odf[c].tolist()]
        for i, (a, b) in enumerate(zip(sv, ov)):
            if a == b:
                continue
            if isinstance(a, float) and isinstance(b, float):
                d = abs(a - b)
                if d > 0:
                    max_float_diff = max(max_float_diff, d)
                    if d > 1e-9:
                        problems.append(f"col {c} row {i}: {a!r} != {b!r} (diff {d})")
                        if len(problems) > 5:
                            return problems
                continue
            # numpy ints vs python ints etc.
            try:
                if float(a) == float(b):
                    continue
            except (TypeError, ValueError):
                pass
            if str(a) == str(b):
                continue
            problems.append(f"col {c} row {i}: {a!r} ({type(a).__name__}) != {b!r} ({type(b).__name__})")
            if len(problems) > 5:
                return problems
    if max_float_diff > 0 and not problems:
        problems.append(f"NOTE float-only diff, max={max_float_diff} (driver hash would FAIL)")
    return problems


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import pathlib
    dumped = sorted(p.name for p in pathlib.Path(out_dir).iterdir() if p.is_dir())
    n_pass = n_fail = 0
    for name in dumped:
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows-only check)")
            continue
        try:
            sdf = load_spark(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: cannot read spark dump: {e}")
            n_fail += 1
            continue
        try:
            odf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({len(sdf)} spark rows / {len(odf)} oracle rows)")
            for p in problems[:6]:
                print(f"     {p}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(sdf)} rows)")
    missing = sorted(set(oracle) - set(dumped))
    for name in missing:
        print(f"FAIL {name}: oracle declared but no spark dump")
        n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(dumped) - n_pass - n_fail} skipped")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
