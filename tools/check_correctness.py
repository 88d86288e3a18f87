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
        if os.path.isdir(p):  # Spark-written table dir (StressGen corpora)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        files = glob.glob(f"{spark_dir}/*.parquet")
        try:
            rel_sp = con.execute(f"SELECT * FROM read_parquet({files!r})")
            sp_cols = [d[0] for d in rel_sp.description]; sp = rel_sp.fetchall()
            rel_od = con.execute(sql)
            od_cols = [d[0] for d in rel_od.description]; od = rel_od.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); fails += 1; continue
        if sorted(sp_cols) != sorted(od_cols):
            print(f"FAIL {name}: schema {sorted(sp_cols)} vs {sorted(od_cols)}"); fails += 1; continue
        if len(sp) != len(od):
            print(f"FAIL {name}: rows {len(sp)} vs {len(od)}"); fails += 1; continue
        # multiset compare on name-sorted columns (exact; floats via repr)
        spi = [sp_cols.index(c) for c in sorted(sp_cols)]
        odi = [od_cols.index(c) for c in sorted(od_cols)]
        key = lambda rows, idx: sorted(repr(tuple(r[i] for i in idx)) for r in rows)
        a, b = key(sp, spi), key(od, odi)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: values differ, e.g. {diff}"); fails += 1; continue
        print(f"OK   {name}: {len(sp)} rows")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
