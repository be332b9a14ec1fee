#!/usr/bin/env python3
"""Run ONE oracle statement against the sf parquet tables and print its
normalized result hash + row count + sorted column list as one JSON
line. Invoked per statement by tools/validate.py when a kill budget is
set (sf1-scale oracles): a statement that hangs or blows memory dies
alone in this child instead of wedging the whole correctness run — the
lesson of the first sf1 bench attempt (98 GB RSS inside one fetchall).

Usage: python3 tools/duck_hash_one.py <sfdir> <sqlfile> [rowcap]

If the statement's count(*) exceeds `rowcap` (default 30M), the result
is NOT materialized; the JSON carries rows + capped=true and no hash —
the parent records a rows-only comparison with that rationale.
"""
import sys, json

import duckdb

from hashnorm import norm, h

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf, sqlfile = sys.argv[1], sys.argv[2]
    rowcap = int(sys.argv[3]) if len(sys.argv) > 3 else 30_000_000
    sql = open(sqlfile).read()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    n = con.execute(
        f"SELECT count(*) FROM ({sql})").fetchone()[0]
    if n > rowcap:
        print(json.dumps({"rows": int(n), "capped": True}))
        return
    df = norm(con.execute(sql).df())
    print(json.dumps({"rows": int(len(df)), "capped": False,
                      "cols": sorted(df.columns), "hash": h(df)}))


if __name__ == "__main__":
    main()
