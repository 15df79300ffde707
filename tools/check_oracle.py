#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: check_oracle.py <verify_out_dir> <sf_dir>

Loads oracle_sql.json, registers each parquet table from sf_dir as a
DuckDB view, runs each oracle, and compares (schema-by-name, values
rounded for floats) against the Spark result parquet dumped by
graft.Verify. Columns are sorted by name before comparison, rows
compared as ordered lists (both sides carry a total ORDER BY).
"""
import json, sys, math, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return v

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_path = f"{out_dir}/{name}"
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
            want = con.execute(sql).df()
            got = got.reindex(sorted(got.columns), axis=1)
            want = want.reindex(sorted(want.columns), axis=1)
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
                n_fail += 1
                continue
            g = [tuple(canon(v) for v in r) for r in got.itertuples(index=False)]
            w = [tuple(canon(v) for v in r) for r in want.itertuples(index=False)]
            if g == w:
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name}: {len(g)} vs {len(w)} rows")
                for i, (a, b) in enumerate(zip(g, w)):
                    if a != b:
                        print(f"  first diff at row {i}: spark={a} oracle={b}")
                        break
                if len(g) != len(w) and g and w:
                    print(f"  spark head={g[0]} oracle head={w[0]}")
        except Exception as e:
            n_fail += 1
            print(f"ERROR {name}: {e}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

main()
