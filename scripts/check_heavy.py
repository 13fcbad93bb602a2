#!/usr/bin/env python3
"""Heavy-oracle gate runner (round 14): materializes the shared DuckDB
intermediates from oracle_shared.json (graft.OracleShared — the pair
join, minhash candidates, component labels, exact k-NN graph, p10's
cleaned-corpus chain) ONCE as temp tables, then gates the 22 heavy
entries that were docs16x-excluded in r13 because their standalone
mirrors re-derived those chains per query.

Modes:
  gate (default): compare each heavy query's shared-form result against
    the graft.Verify parquet dump in OUT_DIR (check.py's hash compare).
  --selfcheck: ignore dumps; run BOTH the shared form and the standalone
    oracle_sql.json form and hash-compare them — the equivalence proof
    run at sf0.01/docs4x before any 16x run is trusted.

Usage: check_heavy.py SF_DIR OUT_DIR [--selfcheck] [--threads N]
       [--only name1,name2]
"""
import duckdb, json, sys, hashlib, time
import os as _os
import pandas as pd

args = [a for a in sys.argv[1:] if not a.startswith("--")]
SF_DIR = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
OUT_DIR = args[1] if len(args) > 1 else "/tmp/verify_out"
SELFCHECK = "--selfcheck" in sys.argv
THREADS = None
ONLY = None
for a in sys.argv[1:]:
    if a.startswith("--threads="):
        THREADS = int(a.split("=", 1)[1])
    if a.startswith("--only="):
        ONLY = set(a.split("=", 1)[1].split(","))

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

con = duckdb.connect()
if THREADS:
    con.execute(f"SET threads={THREADS}")
for t in TABLES:
    _p = f"{SF_DIR}/{t}.parquet"
    _src = f"'{_p}/*.parquet'" if _os.path.isdir(_p) else f"'{_p}'"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM {_src}")

shared = json.load(open(f"{OUT_DIR}/oracle_shared.json"))
oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.reindex(sorted(df.columns), axis=1)

def cell(v):
    if v is None or v != v:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)

def table_hash(df: pd.DataFrame):
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()

# ── prelude: materialize shared intermediates once, timed ──
for name, sql in shared["prelude"]:
    t0 = time.monotonic()
    con.execute(f"CREATE TEMP TABLE {name} AS {sql}")
    n = con.sql(f"SELECT COUNT(*) FROM {name}").fetchone()[0]
    print(f"prelude {name}: {n} rows in {time.monotonic()-t0:.1f}s",
          file=sys.stderr, flush=True)

todo = dict(shared["queries"])
for name in shared["direct"]:
    todo[name] = oracle[name]
if ONLY:
    todo = {k: v for k, v in todo.items() if k in ONLY}

fails = []
for name, sql in sorted(todo.items()):
    t0 = time.monotonic()
    try:
        got = canon(con.sql(sql).df())
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: shared-form error: {e}"); continue
    if SELFCHECK:
        try:
            exp = canon(con.sql(oracle[name]).df())
        except Exception as e:
            fails.append(name); print(f"FAIL {name}: standalone error: {e}"); continue
        label = "selfcheck"
    else:
        try:
            exp = canon(duckdb.sql(f"SELECT * FROM '{OUT_DIR}/{name}/*.parquet'").df())
        except Exception as e:
            fails.append(name); print(f"FAIL {name}: spark dump unreadable: {e}"); continue
        got, exp = exp, got  # spark dump is `got`, oracle is `exp` (check.py order)
        label = "gate"
    # label which side is which per mode (r14 ADVICE: the got/exp swap
    # above made bare 'a='/'b=' diagnostics ambiguous)
    gside, eside = ("shared", "standalone") if SELFCHECK else ("spark", "oracle")
    dt = time.monotonic() - t0
    if list(got.columns) != list(exp.columns):
        fails.append(name)
        print(f"FAIL {name}: columns {gside}={list(got.columns)} vs {eside}={list(exp.columns)}")
        continue
    if len(got) != len(exp):
        fails.append(name)
        print(f"FAIL {name}: rows {gside}={len(got)} vs {eside}={len(exp)}")
        continue
    if table_hash(got) != table_hash(exp):
        fails.append(name)
        print(f"FAIL {name}: value hash mismatch ({label})")
        for i in range(min(len(got), 2000)):
            g = [cell(v) for v in got.iloc[i]]
            e = [cell(v) for v in exp.iloc[i]]
            if g != e:
                print(f"  row {i}: {gside}={g}")
                print(f"  row {i}: {eside}={e}")
                break
        continue
    print(f"OK   {name} ({len(got)} rows, {dt:.1f}s {label})", flush=True)

print(f"\n{len(todo) - len(fails)}/{len(todo)} passed")
sys.exit(1 if fails else 0)
