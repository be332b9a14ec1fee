#!/usr/bin/env python3
"""sf0.1 oracle-gap report: the gate that reads the committed
adjudications for rows sitting >2x a >=0.2s DuckDB oracle at sf0.1
(round-8 verdict item #8 — stop re-deriving these in prose each round).

For every such row in the sf0.1 pair artifact it prints the committed
class (iteration_floor / streaming_microbatch_floor / output_bound /
task_floor from tools/adjudications.json `sf01_over_oracle`) alongside
the LIVE sf1 growth evidence recomputed from this round's pair
artifacts — Spark's sf0.1->sf1 growth vs DuckDB's own on the identical
statement (timeouts shown as a >=lower-bound). The adjudication claim
is checkable in place: a floor-class row should grow no faster than the
oracle at sf1; the report marks each row's claim OK or DRIFTING.

An over-gap row with NO committed class fails the report (exit 1): a
new gap row must arrive with its adjudication, not accumulate silently.

Usage:
  python3 tools/oracle_gap_report.py <pair_sf0.1.json> <pair_sf1.json>
      [gap=2.0] [floor=0.2] [adjudications=tools/adjudications.json]
"""
import sys, os, json


def main():
    p01, p1 = sys.argv[1], sys.argv[2]
    gap = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.2
    adj_p = sys.argv[5] if len(sys.argv) > 5 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "adjudications.json")
    a = json.load(open(p01))
    b = json.load(open(p1))
    s01, d01 = a["spark"]["queries"], a["duckdb"]["queries"]
    s1, d1 = b["spark"]["queries"], b["duckdb"]["queries"]
    tmo1 = set(b["duckdb"].get("timeouts", []))
    # Kill budget used for timeout growth lower bounds: read from the
    # artifact (recorded since r10); older pairs all used the 300s default.
    budget1 = float(b["duckdb"].get("budget_sec", 300.0))
    adj = json.load(open(adj_p)).get("sf01_over_oracle", {})
    classes, rows = adj.get("classes", {}), adj.get("rows", {})

    over = sorted(n for n in s01
                  if n in d01 and d01[n] >= floor and s01[n] > gap * d01[n])
    print(f"[oracle-gap] {len(over)} rows >{gap}x a >={floor}s DuckDB "
          f"oracle at sf0.1 (from {os.path.basename(p01)})")
    missing = []
    for n in over:
        cls = rows.get(n, {}).get("class")
        sg = s1[n] / s01[n] if n in s1 else None
        if n in d1:
            dg, lb = d1[n] / d01[n], ""
        elif n in tmo1:
            dg, lb = budget1 / d01[n], ">="
        else:
            dg, lb = None, ""
        claim = ("OK" if sg is not None and dg is not None
                 and sg <= 1.5 * dg else "DRIFTING")
        print(f"[oracle-gap] {n}: sf0.1 {s01[n]:.2f}s vs {d01[n]:.2f}s "
              f"({s01[n]/d01[n]:.1f}x); sf1 growth spark "
              f"{sg:.1f}x vs duckdb {lb}{dg:.1f}x -> claim {claim}"
              if sg is not None and dg is not None else
              f"[oracle-gap] {n}: sf0.1 {s01[n]:.2f}s vs {d01[n]:.2f}s "
              f"({s01[n]/d01[n]:.1f}x); sf1 growth unavailable")
        if cls:
            print(f"[oracle-gap]   class {cls}: {classes.get(cls, '?')}")
        else:
            missing.append(n)
    if missing:
        for n in missing:
            print(f"[oracle-gap] FAIL unadjudicated gap row: {n} — add it "
                  f"to {adj_p} sf01_over_oracle.rows with a class")
        raise SystemExit(1)
    print("[oracle-gap] PASS — every gap row carries a committed class")


if __name__ == "__main__":
    main()
