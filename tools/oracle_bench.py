#!/usr/bin/env python3
"""Time the DuckDB 1.0 oracle on the registered oracle SQL — the judge's
method: all oracle queries at a given sf dir, threads=32, best-of-N wall
clock per query, summed. Prints one JSON line comparable to BENCH_r{N}.json.

Usage: python3 tools/oracle_bench.py [sfdir] [oracle_sql.json] [runs]
"""
import json
import sys
import time
from pathlib import Path

import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ORACLES = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify/oracle_sql.json")
RUNS = int(sys.argv[3]) if len(sys.argv) > 3 else 2

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
con.execute("SET threads TO 32")
for t in TABLES:
    p = f"{SFDIR}/{t}.parquet"
    if Path(p).exists():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

sqls = json.loads(ORACLES.read_text())
times = {}
for name in sorted(sqls):
    best = None
    for _ in range(RUNS):
        t0 = time.perf_counter()
        con.execute(sqls[name]).fetchall()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    times[name] = round(best, 3)

total = round(sum(times.values()), 3)
print(json.dumps({"metric": "oracle_total", "value": total, "unit": "sec",
                  "queries": times, "sf": SFDIR, "runs": RUNS, "agg": "min"}))
