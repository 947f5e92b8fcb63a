#!/usr/bin/env python3
"""Local self-check mimicking the driver's correctness gate: run
graft.Verify (Spark) into an outDir, then execute each oracle_sql.json
entry in DuckDB over the same parquet tables and compare values
column-name-sorted, row-sorted. Dev tool only — not part of the library.

Strict by default: column dtype CLASSES (int vs float vs bool vs string vs
datetime) must match, because the driver's hash is type-sensitive — a DuckDB
HUGEINT (uncast sum) coerced to float64 red-flags a query whose values are
bit-identical to Spark's int64. Pass --loose for the old values-only check.

Usage: python3 tools/compare.py <sfDir> <outDir> [--loose] [query ...]
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # Shortest-round-trip repr: full fidelity, matching the driver's
    # bit-exact hash. The old f"{v:.6g}" (6 SIGNIFICANT digits) silently
    # passed cross-engine drift below 6 sig-figs (r17's linear-counting
    # divergence: 150.739981 vs 150.740034 both printed "150.74").
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(float(v))
    return str(v)


def dtype_class(dt):
    k = dt.kind  # numpy kind: i/u int, f float, b bool, M datetime, O object
    return {"i": "int", "u": "int", "f": "float", "b": "bool",
            "M": "datetime", "m": "timedelta"}.get(k, "object")


def main():
    argv = [a for a in sys.argv[1:] if a != "--loose"]
    strict = "--loose" not in sys.argv
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        g_cols, w_cols = sorted(got.columns), sorted(want.columns)
        if g_cols != w_cols:
            print(f"FAIL {name}: columns {g_cols} != {w_cols}")
            n_fail += 1
            continue
        got, want = got[g_cols], want[w_cols]
        if strict:
            bad = [(c, str(got[c].dtype), str(want[c].dtype)) for c in g_cols
                   if dtype_class(got[c].dtype) != dtype_class(want[c].dtype)]
            if bad:
                print(f"FAIL {name}: dtype class mismatch (spark vs oracle): {bad}")
                n_fail += 1
                continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        g_rows = sorted(tuple(norm(v) for v in r) for r in got.itertuples(index=False))
        w_rows = sorted(tuple(norm(v) for v in r) for r in want.itertuples(index=False))
        if g_rows != w_rows:
            diff = [(a, b) for a, b in zip(g_rows, w_rows) if a != b][:3]
            print(f"FAIL {name}: values differ, e.g. {diff}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
