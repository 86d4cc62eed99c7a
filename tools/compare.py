#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read each query's parquet
dump (written by graft.Verify), run its oracle SQL in DuckDB over the same
testdata tables, and compare values column-by-column (columns sorted by name,
rows in emitted order). Usage: compare.py <sfDir> <outDir> [query ...]"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Queries that threw in Verify never write a dump; surface them as
    # failures instead of letting them silently vanish from the report
    # (the round-6 TIMESTAMP_NTZ regression hid exactly this way).
    try:
        failures = json.load(open(f"{out_dir}/failures.json"))
    except FileNotFoundError:
        failures = {}
    for name, err in sorted(failures.items()):
        if only and name not in only:
            continue
        print(f"FAIL {name}: Verify threw: {err[:200]}")
        n_fail += 1
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        if name in failures:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} vs {wc}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        got, want = got[gc], want[wc]
        bad = None
        for c in gc:
            a, b = got[c].tolist(), want[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if norm(x) != norm(y) and not (
                        isinstance(x, float) and isinstance(y, float)
                        and (x == y or (math.isnan(x) and math.isnan(y)))):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col={c} row={i}: spark={x!r} duckdb={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
