#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>: load our parquet result and the
DuckDB result of oracle_sql.json[name] over <sfDir>/*.parquet, sort columns
by name, compare row-by-row (exact values). Prints PASS/FAIL per query.
"""
import json, sys, glob, os
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(t).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            print(f"MISSING {name}: no result dir"); n_fail += 1; continue
        try:
            mine = con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetch_arrow_table()
            want = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"ERROR {name}: {e}"); n_fail += 1; continue
        mine = mine.select(sorted(mine.column_names))
        want = want.select(sorted(want.column_names))
        if mine.column_names != want.column_names:
            print(f"FAIL {name}: columns {mine.column_names} != {want.column_names}")
            n_fail += 1; continue
        if mine.num_rows != want.num_rows:
            print(f"FAIL {name}: rows {mine.num_rows} != {want.num_rows}")
            n_fail += 1; continue
        # compare as python values (type-lenient), row order as produced
        mp, wp = mine.to_pylist(), want.to_pylist()
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(mp, wp)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)} differing rows; first at {i}:\n  mine={a}\n  want={b}")
            # show schema hint
            print(f"  mine types: {mine.schema}\n  want types: {want.schema}")
            n_fail += 1
        else:
            # strict type check as a warning (driver may hash types)
            if str(mine.schema) != str(want.schema):
                print(f"PASS {name} (rows match; TYPE DIFF:\n  mine={mine.schema}\n  want={want.schema})")
            else:
                print(f"PASS {name} ({mine.num_rows} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
