#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf-dir parquet tables and compare (columns sorted by name,
values hashed) against the Verify.scala parquet dumps."""
import duckdb, json, sys, hashlib
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

con = duckdb.connect()
import os as _os
for t in TABLES:
    # driver testdata = single parquet FILE; ScaleGen output = a Spark
    # parquet DIRECTORY — glob the latter
    _p = f"{SF_DIR}/{t}.parquet"
    _src = f"'{_p}/*.parquet'" if _os.path.isdir(_p) else f"'{_p}'"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM {_src}")

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
# Optional 3rd arg "--present": only check queries whose dump dir exists
# (for single-query iteration with Verify's name filter).
if "--present" in sys.argv:
    import os
    oracle = {k: v for k, v in oracle.items() if os.path.isdir(f"{OUT_DIR}/{k}")}

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df

def cell(v):
    if v is None or v != v:  # NaN/None
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)

def table_hash(df: pd.DataFrame):
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()

fails = []
for name, sql in sorted(oracle.items()):
    try:
        got = canon(duckdb.sql(f"SELECT * FROM '{OUT_DIR}/{name}/*.parquet'").df())
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: spark output unreadable: {e}"); continue
    try:
        exp = canon(con.sql(sql).df())
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: oracle error: {e}"); continue
    if list(got.columns) != list(exp.columns):
        fails.append(name)
        print(f"FAIL {name}: columns spark={list(got.columns)} oracle={list(exp.columns)}")
        continue
    if len(got) != len(exp):
        fails.append(name)
        print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
        continue
    if table_hash(got) != table_hash(exp):
        fails.append(name)
        print(f"FAIL {name}: value hash mismatch")
        # show first differing rows
        for i in range(min(len(got), 2000)):
            g = [cell(v) for v in got.iloc[i]]
            e = [cell(v) for v in exp.iloc[i]]
            if g != e:
                print(f"  row {i}: spark={g}")
                print(f"  row {i}: oracle={e}")
                break
        continue
    print(f"OK   {name} ({len(got)} rows)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
