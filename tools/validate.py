#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and hash-compare per query.

Usage: python3 tools/validate.py [sfdir] [outdir] [report_json]
(Run `sbt "runMain graft.Verify <sfdir> <outdir>"` first.)
The optional third arg writes a driver-shaped per-query JSON report
(the CORRECTNESS_r{N}.json format) for committing scale-gate evidence.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import hashlib

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
REPORT = sys.argv[3] if len(sys.argv) > 3 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), na_position="first")
    return df.reset_index(drop=True)


def h(df: pd.DataFrame) -> str:
    # Stringify every cell with full-precision str(): stricter than any
    # plausible driver hash — catches int64-vs-float64 dtype drift
    # (DuckDB sum(int) -> HUGEINT -> float64 "2.0" vs Spark long "2")
    # and last-ulp double differences that %.10g would round away.
    s = df.astype(object).where(df.notna(), None).map(
        lambda v: "\0" if v is None else str(v))
    return hashlib.md5(s.to_csv(index=False).encode()).hexdigest()


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(OUT)
                   if os.path.isdir(os.path.join(OUT, d)))
    n_pass = n_fail = n_noora = 0
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
        got = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            print(f"ROWS {name}: rows={len(got)} (no oracle)")
            record(dirname, spark_rows=len(got), err="no oracle")
            n_noora += 1
            continue
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
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noora} rows-only ==")
    if REPORT:
        with open(REPORT, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {REPORT}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
