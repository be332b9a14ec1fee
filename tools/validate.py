#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and hash-compare per query.

Usage: python3 tools/validate.py [sfdir] [outdir] [report_json]
                                 [budget_sec] [rowcap]
(Run `sbt "runMain graft.Verify <sfdir> <outdir>"` first.)

The optional third arg writes a driver-shaped per-query JSON report
(the CORRECTNESS_r{N}.json format) for committing scale-gate evidence.

With no budget (the sf0.01 default) every oracle runs in-process,
exactly the driver's protocol. A `budget_sec` switches to SCALE MODE
for sf1-class runs: each oracle statement executes in its own killable
tools/duck_hash_one.py subprocess (a hang or memory blowup loses one
statement, not the run — the first sf1 attempt hit 98 GB RSS inside a
single fetchall), statements whose count(*) exceeds `rowcap` (default
30M) are compared on row count only (materializing them would be the
blowup all over again, on both engines), and oracle timeouts are
REPORTED as a distinct category rather than failing the gate — an
oracle that cannot run at sf1 is evidence about DuckDB, not about the
Spark result, and each such query stays hash-green at sf0.01.
"""
import sys, os, json, glob, subprocess, tempfile
from concurrent.futures import ThreadPoolExecutor

import duckdb
import pandas as pd
import pyarrow.parquet as pq

from hashnorm import norm, h

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
REPORT = sys.argv[3] if len(sys.argv) > 3 else None
BUDGET = float(sys.argv[4]) if len(sys.argv) > 4 else None
ROWCAP = int(sys.argv[5]) if len(sys.argv) > 5 else 30_000_000

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

HERE = os.path.dirname(os.path.abspath(__file__))


def spark_row_count(dirname):
    """Row count from parquet footers — no data read, so a huge Spark
    result can be count-compared without materializing it."""
    return sum(pq.ParquetFile(f).metadata.num_rows
               for f in glob.glob(f"{OUT}/{dirname}/*.parquet"))


def oracle_guarded(sql):
    """(kind, payload): kind in ok|timeout|error|capped."""
    with tempfile.NamedTemporaryFile("w", suffix=".sql",
                                     delete=False) as f:
        f.write(sql)
        sqlfile = f.name
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "duck_hash_one.py"),
             SF, sqlfile, str(ROWCAP)],
            capture_output=True, text=True, timeout=BUDGET)
        if r.returncode != 0:
            return "error", r.stderr[-500:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        return ("capped" if out.get("capped") else "ok"), out
    except subprocess.TimeoutExpired:
        return "timeout", None
    finally:
        os.unlink(sqlfile)


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(OUT)
                   if os.path.isdir(os.path.join(OUT, d)))
    # Scale mode: the guarded children are independent (correctness,
    # not timing) — overlap them. 4 workers keeps peak RSS bounded
    # (each child materializes at most one <=rowcap result) while the
    # 300s known-timeout statements stop serializing the whole run.
    futs = {}
    if BUDGET is not None:
        pool = ThreadPoolExecutor(max_workers=4)
        for dirname in names:
            nm = dirname.removesuffix(".parquet")
            if nm in oracle and glob.glob(f"{OUT}/{dirname}/*.parquet"):
                futs[nm] = pool.submit(oracle_guarded, oracle[nm])
    n_pass = n_fail = n_noora = n_tmo = 0
    report = {}

    def record(dirname, rows=False, schema=False, hsh=False,
               spark_rows=None, oracle_rows=None, err=None):
        report[dirname] = {"rows_match": rows, "schema_match": schema,
                           "hash_match": hsh, "spark_rows": spark_rows,
                           "oracle_rows": oracle_rows, "err": err}
    # a query that threw left a .ERROR.json instead of a result dir —
    # count it as a red row (mirrors the driver; round 4's breakage was
    # invisible precisely because thrown queries vanished from the list)
    for errfile in sorted(f for f in os.listdir(OUT)
                          if f.endswith(".ERROR.json")):
        name = errfile.removesuffix(".ERROR.json")
        try:
            msg = json.load(open(os.path.join(OUT, errfile)))["error"]
        except Exception:
            msg = "(unreadable error artifact)"
        print(f"FAIL {name}: query threw: {msg[:200]}")
        record(name + ".parquet", err=f"query threw: {msg[:500]}")
        n_fail += 1
    for dirname in names:
        name = dirname.removesuffix(".parquet")
        files = glob.glob(f"{OUT}/{dirname}/*.parquet")
        if not files:
            print(f"FAIL {name}: no result parquet")
            record(dirname, err="no result parquet")
            n_fail += 1
            continue
        if name not in oracle:
            got_n = spark_row_count(dirname)
            print(f"ROWS {name}: rows={got_n} (no oracle)")
            record(dirname, spark_rows=got_n, err="no oracle")
            n_noora += 1
            continue

        if BUDGET is not None:
            # ---- scale mode: killable child computes the oracle hash
            kind, payload = futs[name].result()
            if kind == "timeout":
                got_n = spark_row_count(dirname)
                print(f"TMO  {name}: oracle exceeded {BUDGET:.0f}s "
                      f"(spark_rows={got_n}; hash-green at sf0.01)")
                record(dirname, spark_rows=got_n,
                       err=f"oracle timeout >={BUDGET:.0f}s at this "
                           "scale; rows-only evidence")
                n_tmo += 1
                continue
            if kind == "error":
                print(f"FAIL {name}: oracle error {payload[:200]}")
                record(dirname, spark_rows=spark_row_count(dirname),
                       err=f"oracle error: {payload}")
                n_fail += 1
                continue
            got_n = spark_row_count(dirname)
            if got_n != payload["rows"]:
                print(f"FAIL {name}: rows spark={got_n} "
                      f"oracle={payload['rows']}")
                record(dirname, spark_rows=got_n,
                       oracle_rows=payload["rows"])
                n_fail += 1
                continue
            if kind == "capped":
                print(f"ROWS {name}: {got_n} rows match (> rowcap "
                      f"{ROWCAP}; too large to hash at this scale)")
                record(dirname, rows=True, spark_rows=got_n,
                       oracle_rows=payload["rows"],
                       err=f"rows-only: result > rowcap {ROWCAP}")
                n_noora += 1
                continue
            got = pd.concat([pd.read_parquet(f) for f in files])
            g = norm(got)
            if sorted(g.columns) != payload["cols"]:
                print(f"FAIL {name}: cols spark={sorted(g.columns)} "
                      f"oracle={payload['cols']}")
                record(dirname, rows=True, spark_rows=got_n,
                       oracle_rows=payload["rows"])
                n_fail += 1
                continue
            if h(g) != payload["hash"]:
                print(f"FAIL {name}: hash mismatch ({got_n} rows)")
                record(dirname, rows=True, schema=True,
                       spark_rows=got_n, oracle_rows=payload["rows"])
                n_fail += 1
                continue
            print(f"PASS {name} ({got_n} rows)")
            record(dirname, rows=True, schema=True, hsh=True,
                   spark_rows=got_n, oracle_rows=payload["rows"])
            n_pass += 1
            continue

        # ---- default in-process mode (the driver's sf0.01 protocol)
        got = pd.concat([pd.read_parquet(f) for f in files])
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            record(dirname, spark_rows=len(got),
                   err=f"oracle error: {str(e)[:500]}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        if sorted(g.columns) != sorted(w.columns):
            print(f"FAIL {name}: cols spark={sorted(g.columns)} oracle={sorted(w.columns)}")
            record(dirname, rows=len(g) == len(w), spark_rows=len(g),
                   oracle_rows=len(w))
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(w)}")
            record(dirname, schema=True, spark_rows=len(g),
                   oracle_rows=len(w))
            n_fail += 1
            continue
        if h(g) != h(w):
            print(f"FAIL {name}: hash mismatch ({len(g)} rows)")
            merged = g.compare(w) if g.shape == w.shape else None
            if merged is not None and not merged.empty:
                print(merged.head(5))
            record(dirname, rows=True, schema=True, spark_rows=len(g),
                   oracle_rows=len(w))
            n_fail += 1
            continue
        print(f"PASS {name} ({len(g)} rows)")
        record(dirname, rows=True, schema=True, hsh=True,
               spark_rows=len(g), oracle_rows=len(w))
        n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noora} rows-only, "
          f"{n_tmo} oracle-timeout ==")
    if REPORT:
        with open(REPORT, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {REPORT}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
