#!/usr/bin/env python3
"""Time the DuckDB oracle on the same parquet the Spark bench reads —
the only same-data executable baseline (BASELINE.md: the reference
publishes no timings).

Usage: python3 tools/duck_bench.py [sfdir] [oracle_sql.json]
Runs each oracle statement twice (warm-up + timed) at the machine's
thread count and prints one JSON line: total + per-query seconds.
"""
import sys, os, json, time
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ORACLE = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(ORACLE))
    # bare names only (the file carries name + name.parquet dual keys)
    names = sorted(n for n in oracle if not n.endswith(".parquet"))
    times, failed = {}, []
    for name in names:
        sql = oracle[name]
        try:
            con.execute(sql).fetchall()  # warm-up (I/O cache, plan)
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:
            failed.append(name)
    out = {"metric": "duckdb_oracle", "value": round(sum(times.values()), 3),
           "unit": "sec", "sf": SF, "n": len(times), "failed": failed,
           "queries": times}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
