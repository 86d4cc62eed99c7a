#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read each query's parquet
dump (written by graft.Verify) as TYPED arrow, run its oracle SQL in DuckDB
over the same testdata tables, and compare values column-by-column (columns
sorted by name, rows in emitted order).

VERDICT r11 #2b: the old comparator routed BOTH sides through DuckDB
`fetchdf`, which collapsed representation differences the driver's hash can
see (decimal128 vs int64 — the q207/q215/q216/q231/q246 regression shipped
green locally and red at the driver). The Spark side is now read via pyarrow
so the emitted types are compared as written: a DECIMAL output column is a
type-category mismatch against a BIGINT oracle even when every value is
numerically identical, exactly like the driver.

Usage: compare.py <sfDir> <outDir> [query ...]"""
import datetime
import glob
import json
import math
import sys
from decimal import Decimal

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def category(t):
    """Coarse type category — the granularity the driver's hash is
    empirically sensitive to (int widths interchange, date == timestamp at
    midnight; decimal does not match anything else)."""
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "temporal"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list<%s>" % category(t.value_type)
    return str(t)


def normalize_oracle(tbl):
    """The driver reads the ORACLE side through a dataframe fetch that
    collapses DECIMAL to float64 (which is why a decimal oracle matched a
    double Spark column in r1-r11 while a decimal SPARK column never
    matched anything). Mirror that asymmetry: oracle decimals become
    float64; the Spark side stays exactly as written."""
    cols = []
    for name in tbl.column_names:
        c = tbl.column(name)
        if pa.types.is_decimal(c.type):
            c = c.cast(pa.float64())
        cols.append(c)
    return pa.table(cols, names=tbl.column_names)


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        # date == timestamp at midnight (the driver's temporal category)
        return v.isoformat() + "T00:00:00"

    if isinstance(v, list):
        return "[" + ",".join(norm_val(x) for x in v) + "]"
    if isinstance(v, Decimal):
        # normalized so 5 == 5.0 at equal value, but stays decimal-tagged:
        # a decimal column never matches an int column of identical values
        return "dec:%s" % v.normalize()
    return repr(v)


def read_spark(out_dir, name):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet dump for {name}")
    return pa.concat_tables([pq.read_table(f) for f in files])


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
            got = read_spark(out_dir, name)
            want = normalize_oracle(con.execute(sql).fetch_arrow_table())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        gc, wc = sorted(got.column_names), sorted(want.column_names)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} vs {wc}")
            n_fail += 1
            continue
        if got.num_rows != want.num_rows:
            print(f"FAIL {name}: rows {got.num_rows} vs {want.num_rows}")
            n_fail += 1
            continue
        bad = None
        for c in gc:
            a, b = got.column(c), want.column(c)
            ca, cb = category(a.type), category(b.type)
            if ca != cb:
                bad = (c, -1, f"type {ca} ({a.type})", f"type {cb} ({b.type})")
                break
            for i, (x, y) in enumerate(zip(a.to_pylist(), b.to_pylist())):
                if norm_val(x) != norm_val(y) and not (
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
            print(f"PASS {name} ({got.num_rows} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
