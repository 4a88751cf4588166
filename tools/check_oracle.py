#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle SQL and compare (sort columns by name, sort rows,
compare values). Usage: check_oracle.py <sfDir> <verifyOutDir>"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    # driver fixtures are single files; GenScale sf1 tables are Spark
    # parquet DIRECTORIES named x.parquet — glob their part files
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_path = os.path.join(out_dir, name)
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: no spark output dir")
        fails += 1
        continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(spark_path + "/*.parquet"))])
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        fails += 1
        continue

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df

    g, w = canon(got), canon(want)
    if list(g.columns) != list(w.columns):
        print(f"FAIL {name}: columns {list(g.columns)} vs oracle {list(w.columns)}")
        fails += 1
        continue
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs oracle {len(w)}")
        fails += 1
        continue
    # exact value compare after string canonicalization (how a hash would see it)
    gs, ws = g.astype(str), w.astype(str)
    if not gs.equals(ws):
        diff = (gs != ws).any(axis=1)
        print(f"FAIL {name}: {int(diff.sum())}/{len(g)} mismatched rows; first:")
        print(pd.concat([g[diff].head(3).add_suffix("_spark"),
                         w[diff].head(3).add_suffix("_duck")], axis=1).to_string())
        fails += 1
    else:
        print(f"OK   {name} ({len(g)} rows)")
print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)
