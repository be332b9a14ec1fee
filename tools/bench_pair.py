#!/usr/bin/env python3
"""One-command matched-pair benchmark: run the Spark suite (graft.Bench)
and the DuckDB 1.0 oracle back-to-back on the SAME machine, SAME sf
parquet, SAME git tree, and write ONE artifact with both totals and both
per-query maps — so every headline ratio is reproducible from a single
committed file instead of two runs stitched together by prose
(round 6's 189.9s-vs-200.5s ambiguity).

Usage: python3 tools/bench_pair.py [sfdir] [out_json]
  sfdir    default /root/testdata/sf0.1
  out_json default target/bench_pair.json

Steps (each logged):
  1. sbt "runMain graft.Bench"        -> target/bench_detail.json
     (also stages the q46/q47/q74 pipeline parquet for this sf dir)
  2. sbt "runMain graft.DumpOracle target/oracle_sql.json <sfdir>"
  3. DuckDB: every oracle statement, warm-up + timed rep (same protocol
     as the Spark side's min-of-2-after-warmup, one rep since DuckDB
     has no JIT warm-up beyond the buffer cache the first rep fills)
  4. Write {tree_sha, sf, spark{...}, duckdb{...}, ratio}

Both engines run the identical statement list: Bench times every
SparkEntry.queries entry; the oracle file carries one statement per
query (DumpOracle). A query missing on either side is reported, not
silently dropped from the other's total.
"""
import sys, os, json, time, subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "target/bench_pair.json")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def log(msg):
    print(f"[bench-pair] {msg}", flush=True)


def run_sbt(main_and_args):
    cmd = ["sbt", "-batch", f"runMain {main_and_args}"]
    log(" ".join(cmd))
    r = subprocess.run(cmd, cwd=REPO, stdout=subprocess.PIPE,
                       stderr=subprocess.STDOUT, text=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:])
        raise SystemExit(f"sbt failed: {main_and_args}")
    return r.stdout


def main():
    tree_sha = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                              capture_output=True, text=True).stdout.strip()
    dirty = subprocess.run(["git", "status", "--porcelain"], cwd=REPO,
                           capture_output=True, text=True).stdout.strip() != ""

    # --- 1. Spark side -------------------------------------------------
    env_note = f"SPARK_GRAFT_SF_DIR={SF}"
    log(f"Spark bench ({env_note}) ...")
    os.environ["SPARK_GRAFT_SF_DIR"] = SF
    t0 = time.time()
    run_sbt("graft.Bench")
    spark_wall = round(time.time() - t0, 1)
    detail = json.load(open(os.path.join(REPO, "target/bench_detail.json")))
    spark_q = detail["detail"]
    spark_total = round(sum(spark_q.values()), 3)
    log(f"Spark: {spark_total}s over {len(spark_q)} queries "
        f"(wall {spark_wall}s incl. warmups/JVM)")

    # --- 2. Oracle statements (staged roots now exist for this sf) -----
    oracle_path = os.path.join(REPO, "target/oracle_sql.json")
    run_sbt(f"graft.DumpOracle {oracle_path} {SF}")
    oracle = json.load(open(oracle_path))
    names = sorted(n for n in oracle if not n.endswith(".parquet"))

    # --- 3. DuckDB side -------------------------------------------------
    import duckdb
    log(f"DuckDB {duckdb.__version__} oracle, {len(names)} statements ...")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    duck_q, failed = {}, []
    t0 = time.time()
    for name in names:
        sql = oracle[name]
        try:
            con.execute(sql).fetchall()          # warm-up
            s = time.perf_counter()
            con.execute(sql).fetchall()
            duck_q[name] = round(time.perf_counter() - s, 3)
        except Exception:
            failed.append(name)
    duck_wall = round(time.time() - t0, 1)
    duck_total = round(sum(duck_q.values()), 3)
    log(f"DuckDB: {duck_total}s over {len(duck_q)} statements, "
        f"{len(failed)} failed (wall {duck_wall}s incl. warmups)")

    # --- 4. One artifact -------------------------------------------------
    common = sorted(set(spark_q) & set(duck_q))
    ratio = (round(sum(spark_q[n] for n in common)
                   / max(1e-9, sum(duck_q[n] for n in common)), 3)
             if common else None)
    out = {
        "metric": "bench_pair",
        "tree_sha": tree_sha,
        "tree_dirty": dirty,
        "sf": SF,
        "protocol": "back-to-back same machine/tree; per-query warm-up "
                    "then timed rep(s); Spark=min of 2 warm reps, "
                    "DuckDB=1 warm rep",
        "spark": {"total_sec": spark_total, "n": len(spark_q),
                  "queries": spark_q},
        "duckdb": {"total_sec": duck_total, "n": len(duck_q),
                   "failed": failed, "queries": duck_q},
        "common_n": len(common),
        "spark_over_duckdb": ratio,
        "spark_only": sorted(set(spark_q) - set(duck_q)),
        "duckdb_only": sorted(set(duck_q) - set(spark_q)),
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {OUT}")
    print(json.dumps({k: out[k] for k in
                      ("metric", "tree_sha", "sf", "common_n",
                       "spark_over_duckdb")}
                     | {"spark_total": spark_total,
                        "duckdb_total": duck_total}))


if __name__ == "__main__":
    main()
