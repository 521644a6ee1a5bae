#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql against DuckDB — mirrors the
driver's correctness gate: for each query, load the Spark-written parquet
result, run the oracle SQL in DuckDB over the same sf tables, sort columns by
name, and compare values exactly. Usage:
    python3 tools/oracle_check.py <sfDir> <outDir>
(outDir must already contain Verify output: <name>/*.parquet + oracle_sql.json)
"""
import sys, os, json, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{outdir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark result parquet")
        fail += 1
        continue
    try:
        spark_df = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
        duck_df = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fail += 1
        continue
    sc = sorted(spark_df.columns)
    dc = sorted(duck_df.columns)
    if sc != dc:
        print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
        fail += 1
        continue
    a, b = spark_df[sc], duck_df[sc]
    if len(a) != len(b):
        print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
        fail += 1
        continue
    bad = 0
    first = None
    for c in sc:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            xn = x != x if isinstance(x, float) else x is None
            yn = y != y if isinstance(y, float) else y is None
            if xn and yn:
                continue
            eq = (x == y)
            if isinstance(x, float) and isinstance(y, float):
                eq = (x == y)  # exact — strictest possible gate
            if not eq:
                bad += 1
                if first is None:
                    first = (c, i, x, y)
    if bad:
        print(f"FAIL {name}: {bad} mismatched cells; first={first}")
        fail += 1
    else:
        print(f"OK   {name}: {len(a)} rows x {len(sc)} cols exact-match")
print("RESULT:", "FAIL" if fail else "ALL OK")
sys.exit(1 if fail else 0)
