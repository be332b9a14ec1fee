#!/usr/bin/env python3
"""Run ONE oracle statement in its own process (crash/hang isolation for
tools/duck_bench_guarded.py's parent loop): warm-up + MIN OF 2 timed reps
of the count-wrapped form — the exact mirror of the Spark side's
min-of-2 warm df.count() reps — one JSON line {t, rows} on stdout."""
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


def rep():
    t0 = time.perf_counter()
    rows = con.execute(wrapped).fetchone()[0]
    return time.perf_counter() - t0, rows


t1, rows = rep()
t2, _ = rep()
print(json.dumps({"t": round(min(t1, t2), 3), "rows": rows}))
