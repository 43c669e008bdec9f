#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run each oracle_sql.json entry in
DuckDB over the sf tables, load the matching Spark parquet result, sort columns
by name + rows by value, and compare exactly (with a float report on mismatch).

Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return [cols[i] for i in order], sorted(out, key=lambda t: tuple(
        (x is None, str(type(x)), str(x)) for x in t))

def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b
        return float(a) == float(b)
    return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            d = con.execute(sql)
            dcols = [c[0] for c in d.description]
            drows = d.fetchall()
            s = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = [c[0] for c in s.description]
            srows = s.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        dc, dr = canon(drows, dcols)
        sc, sr = canon(srows, scols)
        if dc != sc:
            print(f"FAIL {name}: columns duck={dc} spark={sc}")
            n_fail += 1
            continue
        if len(dr) != len(sr):
            print(f"FAIL {name}: rows duck={len(dr)} spark={len(sr)}")
            n_fail += 1
            continue
        bad = 0
        worst = 0.0
        for rd, rs in zip(dr, sr):
            for x, y in zip(rd, rs):
                if not eq(x, y):
                    bad += 1
                    if isinstance(x, float) and isinstance(y, float):
                        worst = max(worst, abs(x - y))
                    if bad <= 3:
                        print(f"  {name} diff: duck={x!r} spark={y!r}")
        if bad:
            print(f"FAIL {name}: {bad} cell diffs, worst float delta {worst}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(dr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
