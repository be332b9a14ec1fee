#!/usr/bin/env python3
"""Budget-independence evidence for sf1 oracle timeouts.

The gate's sf1 correctness step runs the DuckDB oracle under a
per-statement kill budget, and the set of statements it kills is a
function of that budget — r10 ran at 150 s and reported 14 timeouts
where r09's 300 s run reported 10, which left the sf1 correctness
category readable as budget-dependent. This tool re-runs JUST the
timed-out statements at the canonical 300 s budget, with the exact
child protocol the gate itself uses (tools/duck_hash_one.py: count(*)
probe + rowcap-guarded materialization), and records per statement
whether it finished, its wall time, row count, and whether that row
count matches the Spark row count the correctness artifact recorded.
The committed output makes the timeout basis explicit and reproducible:
statements that finish between the gate budget and 300 s get row-level
evidence; statements that outlive 300 s are confirmed as genuine
oracle-scale timeouts, not budget artifacts.

Usage:
  python3 tools/timeout_rerun.py <sfdir> <correctness_sf1.json>
      <oracle_sql.json> <out.json> [budget_sec=300]
"""
import sys, os, json, time, subprocess, tempfile

SF = sys.argv[1]
CORR = sys.argv[2]
ORACLE = sys.argv[3]
OUT = sys.argv[4]
BUDGET = float(sys.argv[5]) if len(sys.argv) > 5 else 300.0

TOOLS = os.path.dirname(os.path.abspath(__file__))


def main():
    corr = json.load(open(CORR))
    oracle = json.load(open(ORACLE))
    names = sorted(k for k, v in corr.items()
                   if "timeout" in str(v.get("err", "")))
    out = {"metric": "timeout_rerun", "sf": SF, "budget_sec": BUDGET,
           "source_correctness": CORR, "n_statements": len(names),
           "statements": {}}
    print(f"[timeout-rerun] {len(names)} timed-out statements, "
          f"budget {BUDGET:.0f}s each", flush=True)
    for name in names:
        sql = oracle.get(name) or oracle.get(name.replace(".parquet", ""))
        rec = {"spark_rows": corr[name].get("spark_rows")}
        if sql is None:
            rec["error"] = "statement not found in oracle_sql.json"
            out["statements"][name] = rec
            continue
        with tempfile.NamedTemporaryFile("w", suffix=".sql",
                                         delete=False) as f:
            f.write(sql); sqlfile = f.name
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(TOOLS, "duck_hash_one.py"),
                 SF, sqlfile],
                capture_output=True, text=True, timeout=BUDGET)
            rec["wall_sec"] = round(time.time() - t0, 1)
            if r.returncode == 0:
                d = json.loads(r.stdout.strip().splitlines()[-1])
                rec.update({"finished": True, "oracle_rows": d["rows"],
                            "capped": d.get("capped", False),
                            "rows_match": d["rows"] == rec["spark_rows"]})
                if "hash" in d:
                    rec["oracle_hash"] = d["hash"]
            else:
                rec.update({"finished": False,
                            "error": r.stderr[-300:]})
        except subprocess.TimeoutExpired:
            rec.update({"finished": False, "timeout": True,
                        "wall_sec": round(time.time() - t0, 1)})
        finally:
            os.unlink(sqlfile)
        out["statements"][name] = rec
        # Dump after EVERY statement: a 14x300s worst case is ~70 min,
        # and a run cut short by the round clock should still leave a
        # partial artifact (counts are recomputed at the end).
        json.dump(out, open(OUT, "w"), indent=1)
        print(f"[timeout-rerun] {name}: "
              + ("finished "
                 f"{rec['wall_sec']}s rows={rec.get('oracle_rows')} "
                 f"match={rec.get('rows_match')}" if rec.get("finished")
                 else f"still timeout at {BUDGET:.0f}s"
                 if rec.get("timeout") else f"ERROR {rec.get('error')}"),
              flush=True)
    out["n_finished"] = sum(
        1 for v in out["statements"].values() if v.get("finished"))
    out["n_still_timeout"] = sum(
        1 for v in out["statements"].values() if v.get("timeout"))
    json.dump(out, open(OUT, "w"), indent=1)
    print(json.dumps({"n": out["n_statements"],
                      "finished": out["n_finished"],
                      "still_timeout": out["n_still_timeout"]}))


if __name__ == "__main__":
    main()
