#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output in
<verify_out>/<name>/, run the matching oracle SQL from oracle_sql.json in
DuckDB over the sf-dir parquet tables, and compare rows/schema/values.

Usage: python3 tools/check_correctness.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, sys, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        files = glob.glob(f"{spark_dir}/*.parquet")
        try:
            sp = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
            od = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); fails += 1; continue
        sp_cols, od_cols = sorted(sp.columns), sorted(od.columns)
        if sp_cols != od_cols:
            print(f"FAIL {name}: schema {sp_cols} vs {od_cols}"); fails += 1; continue
        sp = sp[sp_cols]; od = od[od_cols]
        if len(sp) != len(od):
            print(f"FAIL {name}: rows {len(sp)} vs {len(od)}"); fails += 1; continue
        # multiset compare on stringified values (exact; floats via repr)
        key = lambda df: sorted(map(repr, df.itertuples(index=False, name=None)))
        a, b = key(sp), key(od)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: values differ, e.g. {diff}"); fails += 1; continue
        print(f"OK   {name}: {len(sp)} rows")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
