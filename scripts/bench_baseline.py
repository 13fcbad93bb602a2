#!/usr/bin/env python3
"""Measure the DuckDB oracle engine's per-query wall time over the same
parquet tables graft benches against — the reproducible single-node
baseline ledger behind BASELINE_duckdb_<sf>.json.

Usage: bench_baseline.py [SF_DIR] [ORACLE_JSON] [OUT_JSON]
ORACLE_JSON defaults to the oracle_sql.json a `graft.Verify` run dumps
(the SQL is sf-dir-independent; tables are bound here as views).
Each query is timed `--runs` times (default 2, interleaved passes: all
queries once, then again) and the per-query MIN is recorded, mirroring
graft.Bench's methodology so the ratio column compares like with like."""
import duckdb, json, os, sys, time

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ORACLE = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
OUT = sys.argv[3] if len(sys.argv) > 3 else f"BASELINE_duckdb_{SF_DIR.rstrip('/').split('/')[-1]}.json"
# BASELINE_RUNS=3 gives the ledger the same 3 min-draws graft.Bench's
# interleaved passes give each query (r14 parity discipline; default
# stays 2 so existing ledgers remain reproducible as recorded).
RUNS = int(os.environ.get("BASELINE_RUNS", "2"))

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

oracle = json.load(open(ORACLE))
times = {name: [] for name in oracle}
for run in range(RUNS):
    for name, sql in sorted(oracle.items()):
        t0 = time.monotonic()
        try:
            con.sql(sql).fetchall()
            times[name].append(time.monotonic() - t0)
        except Exception as e:
            print(f"ERR  {name}: {e}", file=sys.stderr)
        else:
            print(f"pass{run} {name} {times[name][-1]:.2f}s", file=sys.stderr)

queries = {n: min(ts) for n, ts in sorted(times.items()) if ts}
out = {
    "engine": f"duckdb-{duckdb.__version__}",
    "sf": SF_DIR,
    "runs": RUNS,
    "method": "interleaved passes, per-query min, oracle SQL from graft.Verify",
    "total": sum(queries.values()),
    "queries": queries,
}
with open(OUT, "w") as f:
    json.dump(out, f, indent=1)
print(f"wrote {OUT}: total {out['total']:.1f}s over {len(queries)} queries")
