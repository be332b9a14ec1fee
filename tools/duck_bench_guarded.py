#!/usr/bin/env python3
"""Guarded DuckDB oracle bench + pair-artifact merge.

Two lessons from the first sf1 attempt are baked in:

1. COUNT-WRAP, don't fetchall: the Spark side times `df.count()`, under
   which Catalyst prunes the final projection and drops result-only
   sorts — so the fair DuckDB mirror is `SELECT count(*) FROM (<sql>)`,
   which gives DuckDB the same courtesies and, crucially, never
   materializes a quadratic result set into Python tuples (the first
   sf1 run hit 98 GB RSS inside fetchall on a pair-explosion query).
2. PER-STATEMENT SUBPROCESS with a kill-on-timeout budget: each
   statement runs in its own tools/duck_one.py process, so a hang is
   killed at the budget and a crash loses one statement, not the
   artifact (the in-process con.interrupt() watchdog variant crashed
   the whole run silently on its first firing). Timing happens INSIDE
   the child (warm-up + timed rep), so process startup never pollutes
   the per-query numbers.

Usage:
  python3 tools/duck_bench_guarded.py <sfdir> <oracle.json> \
      <spark_detail.json> <out_pair.json> [budget_sec=300]

Writes the same bench-pair artifact shape as tools/bench_pair.py,
with `duckdb.protocol` marking the count-wrap and any timeouts listed.
"""
import sys, os, json, time, subprocess
import tempfile

SF = sys.argv[1]
ORACLE = sys.argv[2]
SPARK_DETAIL = sys.argv[3]
OUT = sys.argv[4]
BUDGET = float(sys.argv[5]) if len(sys.argv) > 5 else 300.0

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def box_probe():
    """Fixed data-independent probes (pure-CPU fold + 1M-key group-by),
    min of 2 warm reps — the DuckDB twin of graft.Bench's boxProbe, so
    every pair artifact carries a measured machine factor per engine
    and cross-round comparisons stop leaning on prose box notes."""
    import duckdb
    con = duckdb.connect()
    def t2(sql):
        con.execute(sql).fetchone()  # warm
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchone()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        return round(best, 3)
    cpu = t2("SELECT sum(i * 2654435761 % 1000003) "
             "FROM range(200000000) t(i)")
    shuf = t2("SELECT sum(n) FROM (SELECT i % 1000000 AS k, "
              "count(*) AS n FROM range(20000000) t(i) GROUP BY k)")
    return {"cpu_sec": cpu, "shuffle_sec": shuf}


def main():
    oracle = json.load(open(ORACLE))
    names = sorted(n for n in oracle if not n.endswith(".parquet"))
    times, failed, timeouts, counts = {}, [], [], {}
    runner = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "duck_one.py")
    for i, name in enumerate(names):
        with tempfile.NamedTemporaryFile("w", suffix=".sql",
                                         delete=False) as f:
            f.write(oracle[name]); sqlfile = f.name
        try:
            r = subprocess.run(
                [sys.executable, runner, SF, sqlfile],
                capture_output=True, text=True, timeout=BUDGET)
            if r.returncode == 0:
                out = json.loads(r.stdout.strip().splitlines()[-1])
                times[name] = out["t"]
                counts[name] = out["rows"]
            else:
                failed.append(name)
                sys.stderr.write(f"[duck-guard] {name} FAILED: "
                                 f"{r.stderr[-300:]}\n")
        except subprocess.TimeoutExpired:
            # NOT added to `times`: a killed statement's elapsed time is
            # a lower bound, not a measurement — mixing it into the
            # common-set ratio (as the first sf1 run did) presents a
            # truncated number alongside fully-measured Spark times, and
            # scale_ratio.py consumers can't tell the difference. The
            # name is reported in `timeouts` and excluded from totals.
            timeouts.append(name)
        finally:
            os.unlink(sqlfile)
        if (i + 1) % 50 == 0:
            print(f"[duck-guard] {i+1}/{len(names)} "
                  f"({sum(times.values()):.0f}s so far)", flush=True)

    duck_probe = box_probe()

    spark_detail = json.load(open(SPARK_DETAIL))
    spark_q = spark_detail["detail"]
    spark_total = round(sum(spark_q.values()), 3)
    duck_total = round(sum(times.values()), 3)
    common = sorted(set(spark_q) & set(times))
    ratio = (round(sum(spark_q[n] for n in common)
                   / max(1e-9, sum(times[n] for n in common)), 3)
             if common else None)
    tree_sha = subprocess.run(["git", "rev-parse", "HEAD"],
                              capture_output=True, text=True).stdout.strip()
    dirty = subprocess.run(["git", "status", "--porcelain"],
                           capture_output=True,
                           text=True).stdout.strip() != ""
    out = {
        "metric": "bench_pair",
        "tree_sha": tree_sha,
        "tree_dirty": dirty,
        "sf": SF,
        "protocol": "Spark: warm pass then min of 2-4 timed df.count() "
                    "reps — a variance guard retries (up to 2 extra "
                    "reps) while min > max(2x warm, warm+0.1s), i.e. "
                    "when something external (GC/cleaner storm) landed "
                    "in both timed windows; still-anomalous queries "
                    "are listed in spark.storm_suspects and all reps "
                    "in reps_warm_first. DuckDB: min of 2 warm reps of "
                    "SELECT count(*) FROM (<sql>) — the count-wrap "
                    "mirrors Spark's count() projection pruning. The "
                    "retry guard is deliberately ASYMMETRIC (Spark "
                    "only): each DuckDB statement runs in its own "
                    "fresh subprocess, so the shared-JVM anomaly class "
                    "the guard exists for cannot occur on that side; "
                    "the guard can only remove Spark-harness noise, "
                    "never DuckDB's. Per-statement subprocess with a "
                    f"{BUDGET:.0f}s kill budget, timed-out statements "
                    "EXCLUDED from totals/ratio and listed in "
                    "duckdb.timeouts; warm-up runs inside the child",
        "spark": {"total_sec": spark_total, "n": len(spark_q),
                  "box_probe": spark_detail.get("box_probe"),
                  "storm_suspects": spark_detail.get("storm_suspects"),
                  "queries": spark_q},
        "duckdb": {"total_sec": duck_total, "n": len(times),
                   "failed": failed, "timeouts": timeouts,
                   "budget_sec": BUDGET,
                   "box_probe": duck_probe,
                   "queries": times, "result_rows": counts},
        "common_n": len(common),
        "spark_over_duckdb": ratio,
        "spark_only": sorted(set(spark_q) - set(times)),
        "duckdb_only": sorted(set(times) - set(spark_q)),
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"spark_total": spark_total,
                      "duckdb_total": duck_total,
                      "ratio": ratio, "timeouts": timeouts,
                      "failed": failed, "common_n": len(common)}))


if __name__ == "__main__":
    main()
