#!/usr/bin/env python3
"""Run ONE oracle statement in its own process (crash/hang isolation for
tools/duck_bench_guarded.py's parent loop): warm-up + timed rep of the
count-wrapped form, one JSON line {t, rows} on stdout."""
import sys, json, time
import duckdb

SF, SQLFILE = sys.argv[1], sys.argv[2]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
sql = open(SQLFILE).read()
wrapped = f"SELECT count(*) FROM ({sql}) __t"
con.execute(wrapped).fetchone()          # warm-up (I/O cache, plan)
t0 = time.perf_counter()
rows = con.execute(wrapped).fetchone()[0]
print(json.dumps({"t": round(time.perf_counter() - t0, 3), "rows": rows}))
