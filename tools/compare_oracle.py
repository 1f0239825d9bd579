#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads oracle_sql.json from the verify output dir, runs each SQL in DuckDB
over the sf parquet tables, and compares row-sets against the Spark parquet
dumps (column names sorted, rows sorted, exact value equality).

Dev-only tool (driver-side python) — never imported by the Scala library.
"""
import sys, json, glob, math
import duckdb

TABLES = ["lineitem", "orders", "customer", "supplier", "part", "nation",
          "region", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def rowset(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"SKIP {name}: no spark output")
            n_skip += 1
            continue
        try:
            ocols, orows = rowset(con, oracle[name])
            scols, srows = rowset(con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if ocols != scols:
            print(f"FAIL {name}: columns differ spark={scols} oracle={ocols}")
            n_fail += 1
        elif orows != srows:
            diff_o = [r for r in orows if r not in srows][:3]
            diff_s = [r for r in srows if r not in orows][:3]
            print(f"FAIL {name}: rows differ (spark={len(srows)} oracle={len(orows)})")
            print(f"  oracle-only: {diff_o}")
            print(f"  spark-only : {diff_s}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    # queries without oracle → rows-only check
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name in oracle or (only and name not in only):
            continue
        try:
            n = con.execute(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
            print(f"ROWS {name}: {n} rows {'(>0 ok)' if n > 0 else '(EMPTY!)'}")
        except Exception as e:
            print(f"ROWS {name}: unreadable: {e}")
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skip ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
